"""Pallas 3x3 stride-1 SAME conv — in-VMEM im2col (documented NEGATIVE result).

Motivation: 64-channel 3x3 convolutions at full tile resolution run at
14-20 TF/s under XLA (the channel dim fills half the 128-wide lane axis).
This kernel rebuilds each H-strip's im2col patches in VMEM (nine shifted
copies, no HBM im2col) and contracts K = 9*C in one MXU matmul per strip.

Measured outcome on v5e (bs10, 220px, bf16, chained): **slower than XLA**
(5.3 ms vs 2.7 ms). Mosaic requires HBM->VMEM DMA slices aligned to the
(16, 128) tiling, forcing the 64 channels to be zero-padded to 128 — which
doubles the contraction FLOPs and erases the lane win; the VMEM concatenate
adds relayout cost on top. Kept (correct, interpret-tested, NOT integrated)
so later rounds don't re-derive it; the productive fix for these shapes was
the space-to-depth transform for k>=7 kernels (ops/s2d_conv.py) — for 3x3
XLA's conv stands."""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_VMEM_BUDGET = 10 * 1024 * 1024


def _vmem_need(th: int, w: int, cp: int, c_out: int) -> int:
    wp = ((w + 2 + 15) // 16) * 16
    return (
        (th + 2) * wp * cp * 2      # strip (bf16/f32 upper bound uses *4 below)
        + th * w * 9 * cp * 2       # im2col patches
        + 9 * cp * c_out * 2        # weights
        + th * w * c_out * 4        # f32 out strip
    )


def _pick_strip(h: int, w: int, cp: int, c_out: int) -> int:
    """Largest divisor of H whose working set fits the VMEM budget."""
    for th in sorted({d for d in range(1, 33) if h % d == 0}, reverse=True):
        if _vmem_need(th, w, cp, c_out) <= _VMEM_BUDGET:
            return th
    return 0


def use_conv3x3_pallas(n: int, h: int, w: int, c_in: int, c_out: int) -> bool:
    if not _PALLAS_OK or os.environ.get("FCDGAN_NO_PALLAS") == "1":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    if c_in > 64 or c_out > 128 or h < 8 or w < 8:
        return False  # wide convs already fill the lanes under XLA
    return _pick_strip(h, w, 128, max(c_out, 128)) >= 4


def _kernel(th, w_dim, c_in, c_out, x_ref, wm_ref, out_ref, strip, sem):
    n_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    # DMA the haloed strip (rows t*TH .. t*TH + TH+2) from the pre-padded input
    cp = pltpu.make_async_copy(
        x_ref.at[n_idx, pl.ds(t_idx * th, th + 2)], strip, sem
    )
    cp.start()
    cp.wait()
    s = strip[:]  # (TH+2, W+2, C)
    # in-VMEM im2col: nine shifted views -> (TH*W, 9C)
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(s[dy : dy + th, dx : dx + w_dim, :].reshape(th * w_dim, c_in))
    patches = jnp.concatenate(cols, axis=1)  # (TH*W, 9C)
    acc = jnp.dot(patches, wm_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, w_dim, c_out).astype(out_ref.dtype)


def _conv3x3_pallas_fwd(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n, h, w_dim, c_in = x.shape
    c_out = w.shape[3]
    # Mosaic DMA slices must align to the (16, 128) bf16 tiling on the two
    # minor dims: pad W+2 up to a 16-multiple and channels up to 128 (the
    # padded weight rows are zero, so the wide contraction stays exact)
    cp = 128 if c_in <= 128 else c_in
    wp = ((w_dim + 2 + 15) // 16) * 16
    th = _pick_strip(h, w_dim, cp, max(c_out, 128))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w_dim - 1), (0, cp - c_in)))
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c_in), (0, 0)))
    wm = wpad.reshape(9 * cp, c_out).astype(x.dtype)

    kern = functools.partial(_kernel, th, w_dim, cp, c_out)
    out = pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input, DMA'd manually
            pl.BlockSpec((9 * cp, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_dim, c_out), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_dim, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wm)
    return out


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME stride-1 conv, pallas forward, XLA-gradient backward."""
    return _conv3x3_pallas_fwd(x, w)


def _fwd(x, w):
    return _conv3x3_pallas_fwd(x, w), (x, w)


def _bwd(res, ct):
    x, w = res
    _, vjp_fn = jax.vjp(_xla_conv, x, w)
    return vjp_fn(ct)


conv3x3_pallas.defvjp(_fwd, _bwd)


def conv3x3_pallas_interpret(x, w):
    """Interpreter-mode forward for CPU correctness tests."""
    return _conv3x3_pallas_fwd(x, w, interpret=True)
