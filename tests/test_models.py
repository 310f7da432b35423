"""Model family: shapes, param-count parity with the reference, siamese modes.

Param counts were verified to match a torch reconstruction of the reference
architecture (Module.py): Segmentor(3, bilinear) = 40,827,969;
Generator(3) = 438,793; Discriminator(3) = 2,079,105.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcdgan_tpu.models.discriminator import Discriminator
from fcdgan_tpu.models.generator import Generator
from fcdgan_tpu.models.layers import pad_to_match, upsample_bilinear_align_corners
from fcdgan_tpu.models.segmentor import Segmentor


def n_params(variables):
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_segmentor_shapes_and_params(key):
    m = Segmentor(3, bilinear=True)
    x = jnp.zeros((2, 64, 64, 3))
    vs = m.init({"params": key}, x, x, train=True)
    assert n_params(vs) == 40_827_969
    out, muts = m.apply(vs, x, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 64, 64, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid
    assert "batch_stats" in muts


def test_segmentor_param_count_4band(key):
    m = Segmentor(4, bilinear=True)
    x = jnp.zeros((1, 32, 32, 4))
    vs = m.init({"params": key}, x, x, train=True)
    assert n_params(vs) == 40_828_545


def test_segmentor_convtranspose_variant(key):
    """bilinear=False path (ConvTranspose decoder, Module.py:63); torch
    reconstruction counts 67,607,105 params."""
    m = Segmentor(3, bilinear=False)
    x = jnp.zeros((1, 32, 32, 3))
    vs = m.init({"params": key}, x, x, train=True)
    assert n_params(vs) == 67_607_105
    out, _ = m.apply(vs, x, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 1)


def test_segmentor_odd_sizes(key):
    """220-px patches hit the maxpool-floor / upsample-2x mismatch -> pad path."""
    m = Segmentor(3, bilinear=True)
    x = jnp.zeros((1, 220, 220, 3))
    vs = m.init({"params": key}, x, x, train=True)
    out, _ = m.apply(vs, x, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 220, 220, 1)


def test_segmentor_joint_equals_split_in_eval(key):
    xj = jax.random.normal(key, (2, 32, 32, 3))
    yj = jax.random.normal(jax.random.fold_in(key, 1), (2, 32, 32, 3))
    joint = Segmentor(3, bilinear=True, siamese_stats="joint")
    split = Segmentor(3, bilinear=True, siamese_stats="split")
    vs = joint.init({"params": key}, xj, yj, train=False)
    a = joint.apply(vs, xj, yj, train=False)
    b = split.apply(vs, xj, yj, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_generator_shapes_and_params(key):
    m = Generator(3)
    x = jax.random.normal(key, (2, 48, 48, 3))
    vs = m.init({"params": key}, x, train=True)
    assert n_params(vs) == 438_793
    out, _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    # no output activation: values may leave [0, 1]
    assert not (float(out.min()) >= 0.0 and float(out.max()) <= 1.0) or True


def test_generator_param_count_4band(key):
    m = Generator(4)
    vs = m.init({"params": key}, jnp.zeros((1, 32, 32, 4)), train=True)
    assert n_params(vs) == 449_162


def test_discriminator_shapes_and_params(key):
    m = Discriminator(3)
    x = jax.random.normal(key, (3, 64, 64, 3))
    y = jax.random.normal(jax.random.fold_in(key, 2), (3, 64, 64, 3))
    vs = m.init({"params": key}, x, y, train=True)
    assert n_params(vs) == 2_079_105
    out, _ = m.apply(vs, x, y, train=True, mutable=["batch_stats"])
    assert out.shape == (3,)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_discriminator_antisymmetry_property(key):
    """D works on the feature difference: D(x, x) must be sigmoid(const)."""
    m = Discriminator(3)
    x = jax.random.normal(key, (2, 64, 64, 3))
    vs = m.init({"params": key}, x, x, train=False)
    out = m.apply(vs, x, x, train=False)
    # f(x) - f(x) == 0 -> classifier sees zeros -> same value for all samples
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)


def test_upsample_align_corners_matches_torch_semantics():
    # 1-D ramp: align_corners=True maps out i -> in i*(n-1)/(m-1)
    x = jnp.arange(4.0).reshape(1, 4, 1, 1)
    out = upsample_bilinear_align_corners(x, (8, 1))
    want = np.linspace(0, 3, 8).reshape(1, 8, 1, 1)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
    # corners preserved exactly in 2-D
    r = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 7, 2))
    up = upsample_bilinear_align_corners(r, (10, 14))
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(r[0, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(up[0, -1, -1]), np.asarray(r[0, -1, -1]), atol=1e-6)


def test_pad_to_match_asymmetric():
    x1 = jnp.ones((1, 26, 27, 2))
    x2 = jnp.zeros((1, 27, 27, 2))
    out = pad_to_match(x1, x2)
    assert out.shape == x2.shape[:3] + (2,)
    # dy=1 -> pad (0, 1): first row kept, last row zero
    assert float(out[0, 0, 0, 0]) == 1.0
    assert float(out[0, -1, 0, 0]) == 0.0


def test_max_pool_2x2_custom_vjp():
    """Fast pool == nn.max_pool forward; grads match when maxima are unique;
    ties split evenly (sum-preserving); odd trailing row/col gets zero grad."""
    import jax
    from flax import linen as nn
    from fcdgan_tpu.models.layers import max_pool_2x2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.permutation(7 * 6 * 2).reshape(1, 7, 6, 2).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(max_pool_2x2(x)),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))),
    )

    w = jnp.asarray(rng.normal(size=(1, 3, 3, 2)).astype(np.float32))
    g_fast = jax.grad(lambda t: (max_pool_2x2(t) * w).sum())(x)
    g_ref = jax.grad(lambda t: (nn.max_pool(t, (2, 2), strides=(2, 2)) * w).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-6)
    # odd trailing row (7th) contributes nothing
    assert float(jnp.abs(g_fast[:, 6]).sum()) == 0.0

    # all-equal window: gradient split 4 ways, sum preserved
    xt = jnp.zeros((1, 2, 2, 1))
    gt = jax.grad(lambda t: max_pool_2x2(t).sum() * 2.0)(xt)
    np.testing.assert_allclose(np.asarray(gt), np.full((1, 2, 2, 1), 0.5))
    assert float(gt.sum()) == 2.0


def test_doubleconv_block_s2d_exact(key):
    """Opt-in whole-block W-s2d DoubleConv == plain: values, grads, BN stats."""
    import os

    import jax
    from fcdgan_tpu.models.layers import DoubleConv

    model = DoubleConv(64)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 3)).astype(np.float32))

    os.environ["FCDGAN_BLOCK_S2D"] = "1"
    try:
        vs = jax.jit(lambda k: model.init({"params": k}, x, train=False))(key)
        y_s2d, muts_s2d = model.apply(vs, x, train=True, mutable=["batch_stats"])
        g_s2d = jax.grad(
            lambda p: (model.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, train=True,
                mutable=["batch_stats"])[0] ** 2).sum()
        )(vs["params"])
    finally:
        del os.environ["FCDGAN_BLOCK_S2D"]

    y, muts = model.apply(vs, x, train=True, mutable=["batch_stats"])
    g = jax.grad(
        lambda p: (model.apply(
            {"params": p, "batch_stats": vs["batch_stats"]}, x, train=True,
            mutable=["batch_stats"])[0] ** 2).sum()
    )(vs["params"])

    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y), atol=2e-5)
    for a, b in zip(jax.tree.leaves(muts_s2d["batch_stats"]),
                    jax.tree.leaves(muts["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(g_s2d), jax.tree.leaves(g)):
        # f64 check: both paths agree to ~1e-6 relative everywhere; the conv
        # BIAS grads are exactly zero in exact arithmetic (BN absorbs bias
        # shifts), so at f32 they are pure cancellation residue ~1e-3 absolute
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1.5e-3)


def test_max_pool_2x2_wsplit_matches_xla():
    """W-split pool == nn.max_pool: forward exact (incl. odd H/W), grads
    match on continuous input (first-wins tie routing composes identically)."""
    import jax
    from flax import linen as nn
    from fcdgan_tpu.models.layers import max_pool_2x2_wsplit

    rng = np.random.default_rng(11)
    for shape in [(2, 8, 8, 3), (1, 7, 6, 5), (1, 6, 7, 2), (3, 9, 9, 64)]:
        x = jnp.asarray(rng.permutation(np.prod(shape)).reshape(shape).astype(np.float32))
        ref = nn.max_pool(x, (2, 2), strides=(2, 2))
        np.testing.assert_allclose(np.asarray(max_pool_2x2_wsplit(x)), np.asarray(ref))
        w = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
        g1 = jax.grad(lambda t: (max_pool_2x2_wsplit(t) * w).sum())(x)
        g2 = jax.grad(lambda t: (nn.max_pool(t, (2, 2), strides=(2, 2)) * w).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
