"""Lane-aligned per-channel reductions (the BatchNorm statistics pattern).

The USSS joint-step device trace shows the BN statistic reductions — f32
mean/var over big bf16 NHWC activations in the forward, sum(dy)/sum(dy*x) in
the backward — as ``convert_reduce`` fusions running at ~20-25% of HBM
bandwidth, 31 ms of a 135 ms step. These kernels stream the activation
through VMEM once as a flat lane-aligned 2D view and accumulate f32 partial
sums per lane, then fold the lane phases down to per-channel results.

Channel counts: C a multiple of 128 uses a (rows, C) view directly; C=64
(or any divisor of 128) packs ``128/C`` pixels per 128-lane row and folds
the phases afterwards — both views are flat reshapes (no relayout).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _rows_block(n_cols: int, dtype_bytes: int = 2, target_bytes: int = 1 << 20) -> int:
    rows = max(8, target_bytes // (n_cols * dtype_bytes))
    return (rows // 8) * 8


def _sum_kernel(x_ref, out_ref, *, n_rows, square):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    blk = x_ref.shape[0]
    xf = x_ref[:].astype(jnp.float32)
    row0 = i * blk
    mask = (jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0) + row0) < n_rows
    xf = jnp.where(mask, xf, 0.0)
    s = jnp.sum(xf, axis=0, keepdims=True)
    if square:
        s2 = jnp.sum(jnp.square(xf), axis=0, keepdims=True)
        out_ref[:] = out_ref[:] + jnp.concatenate([s, s2], axis=0)
    else:
        out_ref[:] = out_ref[:] + s


def _pair_kernel(a_ref, b_ref, out_ref, *, n_rows):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    blk = a_ref.shape[0]
    af = a_ref[:].astype(jnp.float32)
    bf = b_ref[:].astype(jnp.float32)
    row0 = i * blk
    mask = (jax.lax.broadcasted_iota(jnp.int32, af.shape, 0) + row0) < n_rows
    af = jnp.where(mask, af, 0.0)
    sa = jnp.sum(af, axis=0, keepdims=True)
    sab = jnp.sum(af * jnp.where(mask, bf, 0.0), axis=0, keepdims=True)
    out_ref[:] = out_ref[:] + jnp.concatenate([sa, sab], axis=0)


def _flat_view(x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    """Flat (rows, width) lane-aligned view; width = C*phases or C."""
    c = x.shape[-1]
    total = x.size
    if c % _LANES == 0:
        width, phases = c, 1
    elif _LANES % c == 0:
        phases = _LANES // c
        width = _LANES
        if total % width != 0:
            raise ValueError(f"total {total} not divisible by {width}")
    else:
        raise ValueError(f"unsupported channel count {c}")
    rows = total // width
    return x.reshape(rows, width), rows, phases


def _fold(out: jnp.ndarray, c: int, phases: int) -> jnp.ndarray:
    if phases == 1:
        return out
    return out.reshape(phases, c).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("square",))
def channel_sums(x: jnp.ndarray, square: bool = False):
    """f32 per-channel sum over all leading axes; optionally also sum(x^2).

    Returns ``sum`` or ``(sum, sum_sq)`` as f32[C]. One HBM pass either way.
    """
    c = x.shape[-1]
    x2, rows, phases = _flat_view(x)
    width = x2.shape[1]
    blk = _rows_block(width, x2.dtype.itemsize)
    grid = pl.cdiv(rows, blk)
    n_out = 2 if square else 1
    out = pl.pallas_call(
        functools.partial(_sum_kernel, n_rows=rows, square=square),
        grid=(grid,),
        in_specs=[pl.BlockSpec((blk, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_out, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, width), jnp.float32),
    )(x2)
    if square:
        return _fold(out[0], c, phases), _fold(out[1], c, phases)
    return _fold(out[0], c, phases)


@jax.jit
def channel_sums_pair(a: jnp.ndarray, b: jnp.ndarray):
    """f32 per-channel ``(sum(a), sum(a*b))`` in one HBM pass over both.

    The BN backward pattern: a=dy, b=x (sum(dy*xhat) is affine in sum(dy*x)).
    """
    assert a.shape == b.shape, (a.shape, b.shape)
    c = a.shape[-1]
    a2, rows, phases = _flat_view(a)
    b2, _, _ = _flat_view(b)
    width = a2.shape[1]
    blk = _rows_block(width, a2.dtype.itemsize, target_bytes=1 << 19)
    grid = pl.cdiv(rows, blk)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, n_rows=rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, width), jnp.float32),
    )(a2, b2)
    return _fold(out[0], c, phases), _fold(out[1], c, phases)
