"""Fused (custom-VJP) train-mode BN vs the jnp+autodiff lowering.

ops/fused_bn.py must match models/layers.py::_GroupedBatchNorm's original
train branch in values, gradients, and running-stat updates — on CPU both
paths use jnp reductions, so differences are pure computation-order noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fcdgan_tpu.ops.fused_bn import bn_train


def _ref_bn(x, scale, bias, phases, eps, dtype):
    c = x.shape[-1] // phases
    xg = x.reshape(x.shape[:-1] + (phases, c))
    xf = xg.astype(jnp.float32)
    axes = tuple(range(xf.ndim - 1))
    mean = jnp.mean(xf, axes)
    mean2 = jnp.mean(jnp.square(xf), axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    mul = (scale * jax.lax.rsqrt(var + eps)).astype(dtype)
    y = (xg.astype(dtype) - mean.astype(dtype)) * mul + bias.astype(dtype)
    return y.reshape(x.shape), mean, var


@pytest.mark.parametrize("phases", [1, 2])
def test_values_and_grads_match_autodiff(phases):
    rng = np.random.default_rng(0)
    c = 8
    x = jnp.asarray(rng.normal(size=(2, 6, 10, phases * c)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(c,)) ** 2 + 0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def f_fused(x, s, b):
        y, m, v = bn_train(x, s, b, phases, 1e-5, None, jnp.float32)
        return jnp.sum(y * dy)

    def f_ref(x, s, b):
        y, m, v = _ref_bn(x, s, b, phases, 1e-5, jnp.float32)
        return jnp.sum(y * dy)

    y_f, _, v_f = bn_train(x, scale, bias, phases, 1e-5, None, jnp.float32)
    y_r, m_r, v_r = _ref_bn(x, scale, bias, phases, 1e-5, jnp.float32)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r),
                               rtol=1e-5, atol=1e-6)

    g_f = jax.jit(jax.grad(f_fused, argnums=(0, 1, 2)))(x, scale, bias)
    g_r = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(x, scale, bias)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_mean_var_cotangents_exact():
    """Gradients THROUGH the mean/var outputs match autodiff too."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    w_m = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    w_v = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    scale = jnp.ones((8,), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)

    def f_fused(x):
        y, m, v = bn_train(x, scale, bias, 1, 1e-5, None, jnp.float32)
        return jnp.sum(m * w_m) + jnp.sum(v * w_v)

    def f_ref(x):
        _, m, v = _ref_bn(x, scale, bias, 1, 1e-5, jnp.float32)
        return jnp.sum(m * w_m) + jnp.sum(v * w_v)

    g_f = jax.grad(f_fused)(x)
    g_r = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=1e-5, atol=1e-6)


def test_model_level_toggle_equivalence(monkeypatch):
    """Full DoubleConv fwd+bwd: fused BN (FCDGAN_FUSED_BN=1) vs default."""
    from fcdgan_tpu.models.layers import DoubleConv

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32)

    def run():
        m = DoubleConv(16)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, True)

        def loss(p):
            y, mut = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(y)), mut["batch_stats"]

        (l, bs), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return l, bs, g

    monkeypatch.setenv("FCDGAN_FUSED_BN", "1")
    l1, bs1, g1 = run()
    monkeypatch.delenv("FCDGAN_FUSED_BN")
    l2, bs2, g2 = run()

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # epsilon-level forward differences flip ReLU gates between the two
    # lowerings, discretely rerouting a tiny fraction of gradient elements
    # (cf. test_layers_bn_fold.py) — exact-formula agreement is pinned by
    # test_values_and_grads_match_autodiff above, so this check is
    # statistical
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        diff = np.abs(a - b)
        assert diff.mean() <= 0.01 * scale
        assert int((diff > 0.03 * scale).sum()) <= max(3, a.size // 200)
        assert diff.max() <= 0.5 * scale


def test_dp_axis_psum(monkeypatch):
    """Fused BN under shard_map: stats equal the global-batch stats."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    ndev = 2
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("dp",))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 8)), jnp.float32)
    scale = jnp.ones((8,), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)

    def local(xs):
        y, m, v = bn_train(xs, scale, bias, 1, 1e-5, "dp", jnp.float32)
        return y, m, v

    y_sh, m_sh, v_sh = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P("dp"),),
        out_specs=(P("dp"), P(), P())))(x)
    y_ref, m_ref, v_ref = _ref_bn(x, scale, bias, 1, 1e-5, jnp.float32)
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
