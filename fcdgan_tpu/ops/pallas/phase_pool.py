"""Fused W-phase select + 2x1 H max pool forward — one VMEM pass.

The VGG block-1 s2d pool exit (models/vgg.py::_phase_pool_exit) lowers in
XLA as an elementwise ``where`` producing the half-width phase max, then a
``reduce_window`` over H — when XLA does not fuse the two, the intermediate
``m`` (half the input, ~46 MB at the block-1 shape) roundtrips HBM. This
kernel forms the phase select AND the H-window max in registers: the input
block is read once, only the quarter-size pooled output is written.

Kernel-design notes (the lessons from ops/pallas/pool_bwd.py, which Mosaic
rejected or ran 9.4x slow):
  * NO in-kernel reshapes — the W-split relayouts were what sank pool_bwd.
  * Phase halves via lane SLICES of the full-channel block (Mosaic rejected
    pool_bwd's tpu.reshape, not slices; Pallas block specs cannot express a
    64-lane sub-block of a 128-channel array, so the split must be in-kernel
    — leading half free, trailing half one lane rotate).
  * The H pairing strides dim 0 of the (rows, W, C) block — dim 0 is not a
    register-tiled dim, so even/odd row selection is register renaming, not
    a relayout.

Tie routing (first-wins on W then H) is identical to the XLA composite —
the forward VALUES are what matter here; the backward stays the measured
elementwise recompute in models/vgg.py::_ppe_bwd via custom_vjp.

MEASURED NET-NEGATIVE on v5e (round 4, experiments/phase_pool_bench.py with
chained fresh-arg value-fetch timing — the relay serves repeated same-arg
calls from cache and block_until_ready returns ~1 us early): at the exact
block-1 stacked shape (60, 220, 110, 128) bf16 the kernel runs 3.09 ms/call
vs the XLA composite's 2.74 (identical harness overhead on both sides) —
XLA already fuses the where into the reduce_window, so the kernel's only
"win" is the intermediate it no longer writes, and the in-kernel lane split
(trailing-half rotate + half-masked 64-lane registers + 64-lane output
stores) costs more than that. THE DEFAULT STAYS the XLA composite;
FCDGAN_PHASE_POOL=pallas remains the exactness-tested opt-in
(tests/test_phase_pool.py) for shapes where the tradeoff may flip
(full-lane phase halves, c >= 128).
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

_ROW_BLOCK = 16  # input rows per program (output rows = half)
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def use_pallas_phase_pool(shape: Tuple[int, ...], dtype) -> bool:
    """TPU backend, even channel split, and the blocks fit VMEM."""
    if not _PALLAS_OK:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    n, h, w, c2 = shape
    if c2 % 2 or h < 2:
        return False
    c = c2 // 2
    if c % 64:
        # the block-1 phase halves are 64 channels — half-filled 128-lane
        # registers (Mosaic masks them); narrower-still blocks stay on XLA
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # two phase blocks in + half-size out, double buffered
    block = (2 * _ROW_BLOCK + _ROW_BLOCK // 2) * w * c * itemsize
    return 2 * block <= _VMEM_BUDGET_BYTES


def _phase_pool_kernel(h_total: int, x_ref, o_ref):
    """Rows [j*RB, j*RB+RB) of the input -> pooled rows [.., +RB/2)."""
    xb = x_ref[0]  # (RB, W, 2C)
    c = xb.shape[-1] // 2
    # lane SLICE (not reshape — the tpu.reshape was what Mosaic rejected in
    # pool_bwd): leading half is free, trailing half costs one lane rotate
    a, b = xb[..., :c], xb[..., c:]
    rb = a.shape[0]
    # comparisons in f32: Mosaic on v5e rejects sub-32-bit vector cmpf;
    # bf16->f32 is lossless so routing/values are bit-identical
    cmp = jnp.float32 if a.dtype != jnp.float32 else a.dtype
    m = jnp.where(a.astype(cmp) >= b.astype(cmp), a, b)  # W-phase first-wins
    # H pairing as a STATIC per-row-pair loop over 2-D (W, C) values: a
    # dim-0 stride-2 slice of the 3-D block lowers as a Mosaic gather
    # ("Only 2D gather is supported"), but single-row static slices are free
    base = pl.program_id(1) * (rb // 2)
    zero = jnp.zeros((), o_ref.dtype)
    for k in range(rb // 2):
        top, bot = m[2 * k], m[2 * k + 1]
        o = jnp.where(top.astype(cmp) >= bot.astype(cmp), top, bot)
        # rows past the pooled extent (grid overhang where the input block
        # read out of bounds) must be masked to zero
        ok = (base + k) < (h_total // 2)
        o_ref[0, k] = jnp.where(ok, o.astype(o_ref.dtype), zero)


def phase_pool_forward(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """W-phase select + 2x1/2 H max pool of an (N, H, W, 2C) s2d tensor.

    Forward-identical to models/vgg.py::_phase_pool_exit (odd trailing H row
    dropped by the VALID pool window, same first-wins values)."""
    n, h, w, c2 = x.shape
    c = c2 // 2
    ho = h // 2
    rb = _ROW_BLOCK
    # grid over OUTPUT row blocks (rb//2 pooled rows each): an input-row grid
    # would emit out-of-range output blocks whenever h is odd or overhangs rb
    grid = (n, pl.cdiv(ho, rb // 2))
    kernel = functools.partial(_phase_pool_kernel, 2 * ho)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # full channel extent in one block (Pallas requires lane blocks
            # of 128k or the whole dim); the phase halves are sliced in-kernel
            pl.BlockSpec((1, rb, w, c2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb // 2, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, w, c), x.dtype),
        interpret=interpret,
    )(x)


def phase_pool_reference(x: jnp.ndarray) -> jnp.ndarray:
    """jnp composite of the same values (exactness oracle)."""
    c = x.shape[-1] // 2
    a, b = x[..., :c], x[..., c:]
    m = jnp.where(a >= b, a, b)
    return jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
    )
