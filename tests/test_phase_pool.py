"""Fused phase-select+H-pool forward (ops/pallas/phase_pool): exactness.

FCDGAN_PHASE_POOL=pallas swaps the kernel in for the XLA where+reduce_window
composite inside _phase_pool_exit's forward — values must match bit-for-bit
(ties included: first-wins on W then H) so the swap is a pure layout change.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fcdgan_tpu.ops.pallas import phase_pool as pp


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 12, 16),   # even rows, multi-block grid at RB=16
        (1, 17, 8, 8),     # odd H: trailing row dropped by the VALID window
        (2, 34, 10, 4),    # grid overhang past the row block
        (1, 8, 220 // 2, 128 * 2),  # block-1-like channel width
    ],
)
def test_phase_pool_kernel_matches_composite(shape, dtype):
    rng = np.random.default_rng(3)
    x = np.round(rng.normal(size=shape) * 2).astype(np.float32)  # force ties
    xj = jnp.asarray(x, dtype)
    ref = pp.phase_pool_reference(xj)
    out = pp.phase_pool_forward(xj, interpret=True)
    assert out.dtype == xj.dtype
    np.testing.assert_array_equal(
        np.asarray(ref, np.float32), np.asarray(out, np.float32)
    )


def test_phase_pool_matches_vgg_exit():
    """Same values as models/vgg.py::_phase_pool_exit (the swap target)."""
    from fcdgan_tpu.models.vgg import _phase_pool_exit

    rng = np.random.default_rng(4)
    x = jnp.asarray(np.round(rng.normal(size=(2, 20, 14, 12)) * 2), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_phase_pool_exit(x)),
        np.asarray(pp.phase_pool_forward(x, interpret=True)),
    )


def test_use_gate_off_tpu():
    assert not pp.use_pallas_phase_pool((2, 16, 12, 256), jnp.bfloat16) or (
        jax.default_backend() == "tpu"
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_ppe_bwd_mul_variant_bit_exact(monkeypatch, dtype):
    """FCDGAN_PPE_BWD=mul routes gradients identically to the default
    pred+select backward (ties included), for even and odd H."""
    from fcdgan_tpu.models import vgg as vgg_mod

    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    rng = np.random.default_rng(5)
    for shape in [(2, 16, 12, 16), (1, 17, 8, 8), (2, 7, 10, 4)]:
        x = jnp.asarray(np.round(rng.normal(size=shape) * 2), dt)
        dy = jnp.asarray(
            rng.normal(size=(shape[0], shape[1] // 2, shape[2], shape[3] // 2)),
            dt)

        def loss(x):
            return jnp.vdot(vgg_mod._phase_pool_exit(x).astype(jnp.float32),
                            dy.astype(jnp.float32))

        monkeypatch.delenv("FCDGAN_PPE_BWD", raising=False)
        g_ref = jax.grad(loss)(x)
        monkeypatch.setenv("FCDGAN_PPE_BWD", "mul")
        g_mul = jax.grad(loss)(x)
        np.testing.assert_array_equal(
            np.asarray(g_ref, np.float32), np.asarray(g_mul, np.float32))
