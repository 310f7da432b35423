"""Fused 2x2/2 max-pool backward — one VMEM pass over (x, dy) -> dx.

XLA's default backward for ``reduce_window(max)`` is a select_and_scatter
op. This kernel recomputes the routing from ``x`` and writes ``dx`` in a
single elementwise pass: read x once, read dy once, write dx once — pure VPU
selects, no scatter.

MEASURED NET-NEGATIVE on v5e (round 3, chained-in-jit timing that defeats
the axon relay's async dispatch): at the segmentor block-2 shape
(20x110x110x128 bf16) this kernel runs 1.695 ms vs XLA select_and_scatter's
0.180 ms — the in-kernel W-split reshapes force Mosaic relayouts that cost
far more than the scatter they replace. At block-1 (c=64) Mosaic cannot
compile it at all ("infer-vector-layout: unsupported shape cast" on the
sub-128-lane unit-dim reshape), and f32 fails the same way at any width.
THE DEFAULT THEREFORE STAYS XLA everywhere; FCDGAN_POOL=pallas remains the
measured opt-in (bf16, c>=128 only — use_pallas_pool gates it).

Tie routing matches XLA select_and_scatter / torch max_pool2d exactly
(row-major first max): the W-axis first-wins select composed with the H-axis
first-wins select picks the first window element attaining the max in
(0,0),(0,1),(1,0),(1,1) order — the same composition argument as
models/vgg.py::_phase_pool_exit.

Routing: ``layers.pool_2x2`` with FCDGAN_POOL=pallas. Off-TPU (and for the
exactness tests) the same math runs as the jnp composite
:func:`pool_bwd_reference`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas imports fail gracefully on unsupported platforms
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_ROW_BLOCK = 8  # dy rows per program (x/dx rows = 2x)
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def use_pallas_pool(shape: Tuple[int, ...], dtype) -> bool:
    """TPU backend and the per-program blocks fit comfortably in VMEM."""
    if not _PALLAS_OK:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    if jnp.dtype(dtype) == jnp.float32:
        # Mosaic (v5e) rejects the kernel's W-split reshape on f32 blocks
        # ("infer-vector-layout: unsupported shape cast"); the same reshape
        # compiles and is exact on bf16 (probed round 3). f32 pools keep
        # XLA's select_and_scatter.
        return False
    n, h, w, c = shape
    if h < 2 or w < 2:
        return False
    if c < 128:
        # Mosaic (v5e) also rejects the W-split reshape when the channel dim
        # under-fills the 128 lanes ("unsupported shape cast" on e.g.
        # 16x110x64xbf16 -> 16x110x1x64, the round-3 A/B failure); those
        # blocks keep XLA's select_and_scatter
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # x block + dx block + dy block, double-buffered by the pipeline
    block = (2 * 2 * _ROW_BLOCK + _ROW_BLOCK) * w * c * itemsize
    return 2 * block <= _VMEM_BUDGET_BYTES


def _pool_bwd_kernel(ho_total: int, x_ref, dy_ref, dx_ref):
    """One (image, row-block): dy rows [i*RB, i*RB+RB) -> dx rows [2.., +2RB)."""
    xb = x_ref[0]  # (2RB, W, C), W even (wrapper slices odd W)
    dyb = dy_ref[0]  # (RB, Wo, C)
    rb2, w, c = xb.shape
    wo = w // 2

    xr = xb.reshape(rb2, wo, 2, c)
    a, b = xr[:, :, 0, :], xr[:, :, 1, :]
    # comparisons run in f32: Mosaic on v5e rejects sub-32-bit vector cmpf
    # ("Target does not support this comparison"), and bf16->f32 is lossless
    # so the routing is bit-identical
    cmp = jnp.float32 if xb.dtype != jnp.float32 else xb.dtype
    wsel = a.astype(cmp) >= b.astype(cmp)  # first-wins along W
    m = jnp.where(wsel, a, b)  # (2RB, Wo, C)
    m2 = m.reshape(rb2 // 2, 2, wo, c)
    hsel = m2[:, 0].astype(cmp) >= m2[:, 1].astype(cmp)  # first-wins along H

    zero = jnp.zeros((), dyb.dtype)
    dm = jnp.stack(
        [jnp.where(hsel, dyb, zero), jnp.where(hsel, zero, dyb)], axis=1
    ).reshape(rb2, wo, c)
    dx = jnp.stack(
        [jnp.where(wsel, dm, zero), jnp.where(wsel, zero, dm)], axis=2
    ).reshape(rb2, w, c)

    # rows beyond the pooled extent (odd H, or grid overhang where the dy
    # block read out of bounds) must be exactly zero
    row = jax.lax.broadcasted_iota(jnp.int32, (rb2, 1, 1), 0)
    row = row + pl.program_id(1) * rb2
    dx = jnp.where(row < 2 * ho_total, dx, zero)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pool_bwd_pallas_even(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """dx for even-W input; H handled by the in-kernel row mask."""
    n, h, w, c = x.shape
    ho = dy.shape[1]
    rb = _ROW_BLOCK
    grid = (n, pl.cdiv(ho, rb))
    kernel = functools.partial(_pool_bwd_kernel, ho)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * rb, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w // 2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * rb, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
    )(x, dy)


def pool_bwd_reference(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """jnp composite of the same routing (off-TPU path + exactness oracle)."""
    n, h, w, c = x.shape
    ho, wo = dy.shape[1], dy.shape[2]
    xe = x[:, : 2 * ho, : 2 * wo, :]
    xr = xe.reshape(n, 2 * ho, wo, 2, c)
    a, b = xr[..., 0, :], xr[..., 1, :]
    wsel = a >= b
    m = jnp.where(wsel, a, b)
    m2 = m.reshape(n, ho, 2, wo, c)
    hsel = m2[:, :, 0] >= m2[:, :, 1]
    zero = jnp.zeros((), dy.dtype)
    dm = jnp.stack(
        [jnp.where(hsel, dy, zero), jnp.where(hsel, zero, dy)], axis=2
    ).reshape(n, 2 * ho, wo, c)
    dx = jnp.stack(
        [jnp.where(wsel, dm, zero), jnp.where(wsel, zero, dm)], axis=3
    ).reshape(n, 2 * ho, 2 * wo, c)
    return jnp.pad(
        dx, ((0, 0), (0, h - 2 * ho), (0, w - 2 * wo), (0, 0))
    ).astype(x.dtype)


def pool_bwd(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Dispatch dx = d(max_pool_2x2(x)) routed first-wins, from (x, dy)."""
    n, h, w, c = x.shape
    ho, wo = dy.shape[1], dy.shape[2]
    if not use_pallas_pool(x.shape, x.dtype):
        return pool_bwd_reference(x, dy)
    if h != 2 * ho or w != 2 * wo:
        # odd extents: the pool ignores the last row/column, whose dx is zero.
        # Slice to the even region (a kernel grid over dy blocks would never
        # visit an uncovered trailing x row) and pad the zeros back.
        dxe = _pool_bwd_pallas_even(x[:, : 2 * ho, : 2 * wo, :], dy)
        return jnp.pad(dxe, ((0, 0), (0, h - 2 * ho), (0, w - 2 * wo), (0, 0)))
    return _pool_bwd_pallas_even(x, dy)


@jax.custom_vjp
def max_pool_2x2_fused(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool; backward is the fused recompute kernel above.

    Forward-identical to flax nn.max_pool / torch max_pool2d; backward
    routes gradients to the row-major-first max of each window, identical to
    XLA select_and_scatter (asserted in tests/test_pallas_pool.py)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _mpf_fwd(x):
    return max_pool_2x2_fused(x), x


def _mpf_bwd(x, dy):
    return (pool_bwd(x, dy),)


max_pool_2x2_fused.defvjp(_mpf_fwd, _mpf_bwd)
