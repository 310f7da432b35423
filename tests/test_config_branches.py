"""Less-traveled reference config branches: g_weight=0, hard masks, '-2' labels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcdgan_tpu.models.vgg import load_vgg16_params
from fcdgan_tpu.ops.losses import cnet_loss, hard_mask
from fcdgan_tpu.train.optim import adam, rmsprop
from fcdgan_tpu.train.state import create_net_state
from fcdgan_tpu.train.steps import PerceptionConfig, WSSSSteps

from test_steps import HW, MSW, TinyGen, TinySeg, clone  # noqa: F401
from flax import linen as _nn


class TinyDisc(_nn.Module):
    @_nn.compact
    def __call__(self, x, y, train: bool = True):
        h = _nn.Conv(8, (3, 3), strides=2, padding=1)(x - y)
        return _nn.sigmoid(jnp.mean(h, axis=(1, 2, 3)))


@pytest.fixture(scope="module")
def vggp():
    return load_vgg16_params()


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, HW, HW, 3)).astype(np.float32)
    y = (x * 0.9 + 0.1).astype(np.float32)
    ref = rng.integers(0, 2, size=(2, HW, HW, 1)).astype(np.float32)
    w = np.ones(2, np.float32)
    return x, y, ref, w


def _mk_steps(vggp, g_weight, continuous):
    return WSSSSteps(
        TinyGen(3), TinySeg(), TinyDisc(), adam(), rmsprop(), rmsprop(), vggp,
        PerceptionConfig((3,), per_band=False),
        perception_weight=0.5, ssim_weight=0.0, g_weight=g_weight,
        l1_weight=1.6, d_weight=1.0, nc_weight=1.5,
        discriminator_continuous=continuous, msssim_weights=MSW)


def _states(steps, x):
    k = jax.random.PRNGKey(0)
    g = create_net_state(steps.G, k, (x,), adam())
    s = create_net_state(steps.S, jax.random.fold_in(k, 1), (x, x), rmsprop())
    d = create_net_state(steps.D, jax.random.fold_in(k, 2), (x, x), rmsprop())
    return g, s, d


def test_wsss_g_weight_zero_skips_generator_branch(vggp, batch):
    """g_weight == 0: the frozen-G branch is dead code (Demo_WSSS.py:305-311);
    the step must run without ever evaluating G (its loss terms are zero)."""
    x, y, ref, w = batch
    steps = _mk_steps(vggp, g_weight=0.0, continuous=True)
    g, s, d = _states(steps, jnp.asarray(x))
    s2, d2, m = steps.adversarial(s, d, g, x, y, ref, y, y, w, 1e-4, 1e-5)
    assert float(m["g_loss"]) == 0.0
    assert float(m["generator_loss"]) == 0.0
    assert np.isfinite(float(m["s_loss"]))


def test_wsss_hard_mask_mode(vggp, batch):
    """discriminator_continuous=False thresholds cmap with the sign trick
    (Demo_WSSS.py:258-260)."""
    x, y, ref, w = batch
    steps = _mk_steps(vggp, g_weight=0.2, continuous=False)
    g, s, d = _states(steps, jnp.asarray(x))
    s2, d2, m = steps.adversarial(s, d, g, x, y, ref, y, y, w, 1e-4, 1e-5)
    for k2 in ("d_loss", "s_loss", "l1_loss", "nc_loss"):
        assert np.isfinite(float(m[k2])), k2


def test_hard_mask_is_binary_everywhere_except_half():
    rng = np.random.default_rng(1)
    cmap = rng.uniform(size=(100,)).astype(np.float32)
    hm = np.asarray(hard_mask(jnp.asarray(cmap)))
    assert set(np.unique(hm)).issubset({0.0, 1.0})
    np.testing.assert_array_equal(hm, (cmap > 0.5).astype(np.float32))


def test_cnet_generator_mask_switch(vggp, batch):
    """generator_mask_switch=True feeds the HARD mask into perception
    (Loss.py:88-91) — result differs from the soft-mask path."""
    x, y, _, w = batch
    cmap = jnp.full((2, HW, HW, 1), 0.3)
    soft = cnet_loss(jnp.asarray(x), jnp.asarray(y), cmap, vggp, (3,),
                     perception_per_band=False, msssim_weights=MSW,
                     generator_mask_switch=False)
    hard = cnet_loss(jnp.asarray(x), jnp.asarray(y), cmap, vggp, (3,),
                     perception_per_band=False, msssim_weights=MSW,
                     generator_mask_switch=True)
    # generator/l1/ssim identical; perception differs (0.3 -> hard 0 mask)
    assert float(soft[0]) == pytest.approx(float(hard[0]))
    assert float(soft[1]) == pytest.approx(float(hard[1]))
    assert float(soft[2]) != pytest.approx(float(hard[2]))


def test_whu_label_minus_two_includes_unlisted(tmp_path):
    """label_selected='-2' admits files absent from label.txt with the default
    ['-1','-1','-2'] label row (data_utils.py:554-563)."""
    from PIL import Image

    from fcdgan_tpu.data.datasets import WHUDataset
    from fcdgan_tpu.data.synthetic import make_whu_dataset

    d = make_whu_dataset(str(tmp_path / "whu"), n_changed=1, n_unchanged=1, size=32)
    # drop an extra image into before/after that label.txt doesn't mention
    extra = np.zeros((32, 32, 3), np.uint8)
    for sub in ("before", "after", "Label"):
        Image.fromarray(extra).save(str(tmp_path / "whu" / sub / "zz_extra.tif"))

    listed = WHUDataset(d["before"], d["after"], d["Label"], d["root"], "-1")
    everything = WHUDataset(d["before"], d["after"], d["Label"], d["root"], "-2")
    assert len(everything) == len(listed) + 1
    # the unlisted file carries the default label row
    idx = [everything.get_file_name(i) for i in range(len(everything))].index("zz_extra.tif")
    x, y, ref, item, label = everything[idx]
    assert label.tolist() == [-1, -1, -2]
    assert ref.max() == 0.0  # not 'changed' -> zero reference
