"""Pallas im2col 3x3 conv (documented negative result) — correctness lock."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mod = pytest.importorskip("fcdgan_tpu.ops.pallas.conv3x3")


@pytest.mark.parametrize("shape", [(2, 20, 24, 8, 16), (1, 22, 20, 64, 64)])
def test_interpret_matches_xla(shape):
    n, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, ci)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32))
    want = mod._xla_conv(x, W)
    got = mod.conv3x3_pallas_interpret(x, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_custom_vjp_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 4)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    ga = jax.grad(lambda a, w: mod._xla_conv(a, w).sum(), argnums=(0, 1))(x, W)
    # the bwd rule routes through the XLA conv vjp directly
    gb = mod._bwd((x, W), jnp.ones((1, 12, 12, 8)))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_guard_rejects_cpu():
    assert mod.use_conv3x3_pallas(2, 220, 220, 64, 64) is False  # cpu backend
