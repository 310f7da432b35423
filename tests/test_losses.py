"""Loss family semantics vs closed-form cases (Loss.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers, vgg16_features
from fcdgan_tpu.ops.losses import (
    cgenerator_loss,
    cnet_loss,
    hard_mask,
    perception_loss,
    region_loss,
)

MSW = (0.5, 0.5)  # reduced MS-SSIM levels so small test tiles are legal


@pytest.fixture(scope="module")
def vggp():
    return load_vgg16_params()  # deterministic random fallback


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    t = rng.uniform(size=(2, 48, 48, 3)).astype(np.float32)
    g = rng.uniform(size=(2, 48, 48, 3)).astype(np.float32)
    cmap = rng.uniform(0.1, 0.4, size=(2, 48, 48, 1)).astype(np.float32)
    return t, g, cmap


def test_hard_mask_values():
    cmap = jnp.array([[0.2, 0.5, 0.8]])
    # sign(0) == 0 -> exactly 0.5 maps to 0.5 (reference quirk, Loss.py:75)
    np.testing.assert_allclose(np.asarray(hard_mask(cmap)), [[0.0, 0.5, 1.0]])


def test_cnet_generator_term_closed_form(data, vggp):
    t, g, cmap = data
    gen, l1, _, _ = cnet_loss(t, g, cmap, vggp, msssim_weights=MSW)
    # golden: per-sample L1 of (1-cmap)-masked images * num_pixel/num_wnc
    num_pixel = 48 * 48
    want = 0.0
    for i in range(2):
        tm = t[i] * (1 - cmap[i])
        gm = g[i] * (1 - cmap[i])
        num_wnc = (1 - cmap[i]).sum()
        want += np.abs(tm - gm).mean() * num_pixel / num_wnc
    want /= 2
    assert float(gen) == pytest.approx(want, rel=1e-5)
    assert float(l1) == pytest.approx(np.abs(cmap).mean(), rel=1e-5)


def test_cgenerator_skips_fully_masked_sample(data, vggp):
    t, g, _ = data
    cmap = np.zeros((2, 48, 48, 1), np.float32)
    cmap[1] = 1.0  # sample 1: num_wnc == 0 -> skipped
    gen, _, _ = cgenerator_loss(t, g, jnp.asarray(cmap), vggp, msssim_weights=MSW)
    want = ((t[0] - g[0]) ** 2).mean()  # num_pixel/num_wnc == 1 when cmap==0
    # denominator stays the full batch size (Loss.py:119)
    assert float(gen) == pytest.approx(want / 2, rel=1e-5)


def test_region_loss_closed_form():
    rng = np.random.default_rng(1)
    cmap = rng.uniform(size=(3, 8, 8, 1)).astype(np.float32)
    region = np.zeros((3, 8, 8, 1), np.float32)
    region[0, :4] = 1.0  # half the pixels
    region[1] = 1.0  # full
    # region[2] empty -> skipped
    got_l1 = float(region_loss(jnp.asarray(cmap), jnp.asarray(region), "l1"))
    want = 0.0
    for i in range(2):
        num_region = region[i].sum()
        want += np.abs(cmap[i] * region[i]).mean() * 64 / num_region
    want /= 3  # full batch denominator
    assert got_l1 == pytest.approx(want, rel=1e-5)

    got_mse = float(region_loss(jnp.asarray(cmap), jnp.asarray(region), "mse"))
    want = 0.0
    for i in range(2):
        num_region = region[i].sum()
        want += ((cmap[i] * region[i]) ** 2).mean() * 64 / num_region
    want /= 3
    assert got_mse == pytest.approx(want, rel=1e-5)


def test_perception_zero_on_identical(data, vggp):
    t, _, cmap = data
    p = perception_loss(t, t, cmap, vggp, select_feature_layers(1))
    assert float(p) == pytest.approx(0.0, abs=1e-6)


def test_perception_full_mask_zeroes_inputs(data, vggp):
    t, g, _ = data
    ones = jnp.ones((2, 48, 48, 1))
    p = perception_loss(t, g, ones, vggp, select_feature_layers(1))
    assert float(p) == pytest.approx(0.0, abs=1e-6)


def test_perception_per_band_matches_sequential(vggp):
    """Stacked per-band pass == mean of per-band RGB-replicated losses."""
    rng = np.random.default_rng(2)
    t = rng.uniform(size=(2, 48, 48, 4)).astype(np.float32)
    g = rng.uniform(size=(2, 48, 48, 4)).astype(np.float32)
    cmask = rng.uniform(0, 0.5, size=(2, 48, 48, 1)).astype(np.float32)
    layers = select_feature_layers(2)
    got = float(perception_loss(t, g, cmask, vggp, layers, per_band=True))
    want = 0.0
    for b in range(4):
        tb = np.repeat(t[..., b : b + 1] * (1 - cmask), 3, axis=-1)
        gb = np.repeat(g[..., b : b + 1] * (1 - cmask), 3, axis=-1)
        fx = vgg16_features(jnp.asarray(tb), vggp, layers)
        fy = vgg16_features(jnp.asarray(gb), vggp, layers)
        for a, c in zip(fx, fy):
            want += float(jnp.mean((a - c) ** 2)) / len(layers) / 4
    assert got == pytest.approx(want, rel=1e-4)


def test_sample_weight_ignores_padded_samples(data, vggp):
    t, g, cmap = data
    # append a junk padded sample with weight 0
    junk = np.full((1, 48, 48, 3), 7.0, np.float32)
    t2 = np.concatenate([t, junk])
    g2 = np.concatenate([g, -junk])
    cmap2 = np.concatenate([cmap, np.full((1, 48, 48, 1), 0.3, np.float32)])
    w = jnp.array([1.0, 1.0, 0.0])

    a = cnet_loss(t, g, cmap, vggp, msssim_weights=MSW)
    b = cnet_loss(t2, g2, cmap2, vggp, msssim_weights=MSW, sample_weight=w)
    for x, y in zip(a, b):
        assert float(x) == pytest.approx(float(y), rel=1e-4)

    ra = region_loss(cmap, jnp.ones_like(cmap), "mse")
    rb = region_loss(cmap2, jnp.ones_like(cmap2), "mse", sample_weight=w)
    assert float(ra) == pytest.approx(float(rb), rel=1e-5)


def test_cnet_ssim_term_is_one_minus_msssim(data, vggp):
    t, _, _ = data
    cmap = jnp.zeros((2, 48, 48, 1))
    _, _, _, ssim_loss = cnet_loss(t, t, cmap, vggp, msssim_weights=MSW)
    assert float(ssim_loss) == pytest.approx(0.0, abs=1e-4)


def test_losses_are_jittable_and_differentiable(data, vggp):
    t, g, cmap = data

    def f(gen):
        l = cnet_loss(t, gen, cmap, vggp, msssim_weights=MSW)
        return l[0] + 0.4 * l[2] + 0.1 * l[3]

    val, grad = jax.jit(jax.value_and_grad(f))(jnp.asarray(g))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0
