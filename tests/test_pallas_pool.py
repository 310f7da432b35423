"""Fused max-pool backward (ops/pallas/pool_bwd): routing exactness.

The backward must equal XLA select_and_scatter's gradient bit-for-bit —
including tie routing (row-major first max) — since FCDGAN_POOL=pallas is a
drop-in swap for the default pool inside the jitted train steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fcdgan_tpu.ops.pallas import pool_bwd as pb


def _xla_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _cases():
    rng = np.random.default_rng(0)
    shapes = [(2, 8, 8, 3), (1, 7, 9, 4), (3, 6, 6, 1), (2, 5, 5, 8)]
    for shape in shapes:
        yield rng.normal(size=shape).astype(np.float32), shape
        # tie-heavy: few distinct values => many equal maxima per window
        yield rng.integers(0, 2, size=shape).astype(np.float32), shape
        yield np.zeros(shape, np.float32), shape


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_pool_grad_matches_select_and_scatter(dtype):
    for xnp, shape in _cases():
        x = jnp.asarray(xnp, dtype)
        dy = jnp.asarray(
            np.random.default_rng(1).normal(
                size=(shape[0], shape[1] // 2, shape[2] // 2, shape[3])
            ),
            dtype,
        )

        def loss_ref(x):
            return jnp.vdot(_xla_pool(x).astype(jnp.float32),
                            dy.astype(jnp.float32))

        def loss_fused(x):
            return jnp.vdot(pb.max_pool_2x2_fused(x).astype(jnp.float32),
                            dy.astype(jnp.float32))

        # forward identical
        np.testing.assert_array_equal(
            np.asarray(_xla_pool(x)), np.asarray(pb.max_pool_2x2_fused(x))
        )
        # backward identical, ties included
        g_ref = jax.grad(loss_ref)(x)
        g_fused = jax.grad(loss_fused)(x)
        np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_fused))


def test_pool_bwd_reference_matches_kernel_interpret(monkeypatch):
    """The pallas kernel (interpret mode) equals the jnp composite."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    for shape in [(2, 16, 16, 8), (1, 17, 13, 4), (2, 8, 220 // 4, 8)]:
        ho, wo = shape[1] // 2, shape[2] // 2
        x = rng.normal(size=shape).astype(np.float32)
        x = np.round(x)  # force ties
        dy = rng.normal(size=(shape[0], ho, wo, shape[3])).astype(np.float32)

        xe = jnp.asarray(x)[:, : 2 * ho, : 2 * wo, :]
        rb = pb._ROW_BLOCK
        n, h, w, c = xe.shape
        kernel = functools.partial(pb._pool_bwd_kernel, ho)
        dx_k = pl.pallas_call(
            kernel,
            grid=(n, pl.cdiv(ho, rb)),
            in_specs=[
                pl.BlockSpec((1, 2 * rb, w, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rb, w // 2, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2 * rb, w, c), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w, c), xe.dtype),
            interpret=True,
        )(xe, jnp.asarray(dy))
        dx_ref = pb.pool_bwd_reference(jnp.asarray(x), jnp.asarray(dy))
        np.testing.assert_array_equal(
            np.asarray(dx_k), np.asarray(dx_ref)[:, : 2 * ho, : 2 * wo, :]
        )


@pytest.mark.tpu
def test_fused_pool_on_device_matches():
    """On-TPU: compiled kernel equals select_and_scatter, ties included."""
    if jax.default_backend() != "tpu":
        pytest.skip("TPU only")
    rng = np.random.default_rng(3)
    shape = (4, 110, 110, 64)
    x = jnp.asarray(np.round(rng.normal(size=shape) * 2).astype(np.float32),
                    jnp.bfloat16)
    dy = jnp.asarray(rng.normal(
        size=(shape[0], shape[1] // 2, shape[2] // 2, shape[3])
    ).astype(np.float32), jnp.bfloat16)

    g_ref = jax.jit(jax.grad(lambda t: jnp.vdot(
        _xla_pool(t).astype(jnp.float32), dy.astype(jnp.float32))))(x)
    g_fused = jax.jit(jax.grad(lambda t: jnp.vdot(
        pb.max_pool_2x2_fused(t).astype(jnp.float32),
        dy.astype(jnp.float32))))(x)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_fused))
