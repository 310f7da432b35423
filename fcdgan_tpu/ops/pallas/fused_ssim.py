"""Fused single-scale SSIM level — one VMEM pass per (image, channel).

The XLA composite path (ops/ssim.py::_ssim_maps) launches ten depthwise
convolutions (five maps x two separable passes) plus the elementwise
luminance/contrast maps, each roundtripping HBM. This kernel keeps a channel
plane resident in VMEM: both inputs are loaded once, the five gaussian blurs
run as shifted multiply-accumulates on the VPU (11 static taps per axis), the
ssim/cs maps are formed in registers, and only two scalars per (image,
channel) leave the chip.

Numerics match ops/ssim.py::_ssim_maps (same valid-window semantics); the
backward pass falls back to the XLA composite via custom_vjp. Guarded by
:func:`use_pallas_ssim` (TPU backend + plane fits VMEM)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ssim as ssim_xla

try:  # pallas imports fail gracefully on unsupported platforms
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def use_pallas_ssim(shape: Tuple[int, ...], win_size: int = 11) -> bool:
    """True when the pallas kernel applies: TPU backend, H/W >= window, and
    roughly 7 (H, W) f32 planes fit the VMEM budget."""
    if not _PALLAS_OK:
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    if backend != "tpu":
        return False
    n, h, w, c = shape
    if h < win_size or w < win_size:
        return False
    return 7 * h * w * 4 <= _VMEM_BUDGET_BYTES


def _ssim_kernel(win, c1, c2, x_ref, y_ref, ssim_ref, cs_ref):
    """Kernel body for one (image, channel) plane."""
    x = x_ref[0]
    y = y_ref[0]
    h, w = x.shape
    k = win.shape[0]
    vh, vw = h - k + 1, w - k + 1

    def blur(img):
        # rows: (H, W) -> (VH, W); 11 static shifted MACs on the VPU
        acc = win[0] * img[0:vh, :]
        for t in range(1, k):
            acc = acc + win[t] * img[t : t + vh, :]
        # cols: (VH, W) -> (VH, VW)
        out = win[0] * acc[:, 0:vw]
        for t in range(1, k):
            out = out + win[t] * acc[:, t : t + vw]
        return out

    mu1 = blur(x)
    mu2 = blur(y)
    sxx = blur(x * x)
    syy = blur(y * y)
    sxy = blur(x * y)

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1 = sxx - mu1_sq
    sigma2 = syy - mu2_sq
    sigma12 = sxy - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1 + sigma2 + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    i = pl.program_id(0)
    ssim_ref[i, 0] = jnp.mean(ssim_map)
    cs_ref[i, 0] = jnp.mean(cs_map)


def _ssim_level_fwd_pallas(x, y, data_range, win_size, win_sigma, k1, k2,
                           interpret=False):
    n, h, w, c = x.shape
    win = ssim_xla.gaussian_window(win_size, win_sigma).astype(np.float32)
    c1 = np.float32((k1 * data_range) ** 2)
    c2 = np.float32((k2 * data_range) ** 2)
    kernel = functools.partial(_ssim_kernel, win, c1, c2)

    # one (H, W) plane per grid step: lanes = W (good VPU utilization vs the
    # 3-4 channel last dim); per-plane scalars land in SMEM
    def planes(img):
        return jnp.moveaxis(img.astype(jnp.float32), -1, 1).reshape(n * c, h, w)

    in_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    # the full (n*c, 1) scalar table stays resident in SMEM; each grid step
    # writes its own row (per-(1,1) blocks violate the TPU block-shape rule)
    out_spec = pl.BlockSpec((n * c, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    ssim_pc, cs_pc = pl.pallas_call(
        kernel,
        grid=(n * c,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n * c, 1), jnp.float32),
            jax.ShapeDtypeStruct((n * c, 1), jnp.float32),
        ),
        interpret=interpret,
    )(planes(x), planes(y))
    return ssim_pc.reshape(n, c), cs_pc.reshape(n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def ssim_level_pallas(x, y, data_range=1.0, win_size=11, win_sigma=1.5,
                      k1=0.01, k2=0.03):
    """Per-channel (ssim, cs) means of one scale — pallas forward.

    Same contract as ops/ssim.py::_ssim_maps; gradients recompute through the
    XLA composite (SSIM is only differentiated when ssim_weight != 0)."""
    return _ssim_level_fwd_pallas(x, y, data_range, win_size, win_sigma, k1, k2)


def _fwd(x, y, data_range, win_size, win_sigma, k1, k2):
    out = _ssim_level_fwd_pallas(x, y, data_range, win_size, win_sigma, k1, k2)
    return out, (x, y)


def _bwd(data_range, win_size, win_sigma, k1, k2, res, ct):
    x, y = res
    win = jnp.asarray(ssim_xla.gaussian_window(win_size, win_sigma))

    def composite(x_, y_):
        return ssim_xla._ssim_maps(x_, y_, data_range, win, (k1, k2))

    _, vjp_fn = jax.vjp(composite, x, y)
    return vjp_fn(ct)


ssim_level_pallas.defvjp(_fwd, _bwd)


def ssim_level_interpret(x, y, data_range=1.0, win_size=11, win_sigma=1.5,
                         k1=0.01, k2=0.03):
    """Interpreter-mode run of the kernel (CPU correctness tests)."""
    return _ssim_level_fwd_pallas(x, y, data_range, win_size, win_sigma, k1, k2,
                                  interpret=True)
