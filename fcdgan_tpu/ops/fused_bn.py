"""Train-mode BatchNorm with custom VJP: one-pass per-channel reductions.

XLA's autodiff of the BN normalize emits the statistic reductions — f32
mean/mean^2 over the big bf16 NHWC activation in the forward, sum(dy) and
sum(dy*x) in the backward — as ``convert_reduce`` fusions measured at
~20-25% of HBM bandwidth in the USSS joint-step trace (the largest
non-conv bucket). This module computes the SAME math through

  * :func:`channel_sums` / :func:`channel_sums_pair` (Pallas, lane-aligned,
    one HBM pass for sum+sum_sq / sum+sum_prod) on TPU, plain jnp reductions
    elsewhere (so CPU tests exercise identical VJP formulas), and
  * hand-derived backward: dx, dscale, dbias from the two backward sums in
    a single fused elementwise pass.

Semantics match models/layers.py::_GroupedBatchNorm's train branch exactly
(stats over N,H,W and the W-s2d phase groups; per-C scale/bias; optional
cross-device pmean of the moments; normalize computed in the activation
dtype with f32 per-channel coefficients). The mean/var outputs carry their
exact cotangent contributions, so the VJP is correct even if a caller
differentiates through them (in the train steps they are only consumed by
the running-stat update, whose cotangent is zero).

parity: reference BN is torch BatchNorm2d inside every conv block
(/root/reference/Module.py:25-34,180-187); this is the TPU lowering of the
same function, not a semantic change.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _use_pallas(x: jnp.ndarray) -> bool:
    import os

    if os.environ.get("FCDGAN_BN_PALLAS") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    width = x.shape[-1]
    if not (width % 128 == 0 or 128 % width == 0):
        return False
    if 128 % width == 0 and x.size % 128 != 0:
        return False
    return True


def _moment_sums(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 (sum, sum_sq) over all leading axes, per last-axis lane."""
    if _use_pallas(x):
        from .pallas.channel_sums import channel_sums

        return channel_sums(x, square=True)
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return jnp.sum(xf, 0), jnp.sum(jnp.square(xf), 0)


def _pair_sums(dy: jnp.ndarray, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 (sum(dy), sum(dy*x)) over all leading axes, per last-axis lane."""
    if _use_pallas(x):
        from .pallas.channel_sums import channel_sums_pair

        return channel_sums_pair(dy, x)
    dyf = dy.reshape(-1, dy.shape[-1]).astype(jnp.float32)
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return jnp.sum(dyf, 0), jnp.sum(dyf * xf, 0)


def _fold(v: jnp.ndarray, phases: int) -> jnp.ndarray:
    return v if phases == 1 else v.reshape(phases, -1).sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def bn_train(x, scale, bias, phases: int, eps: float,
             axis_name: Optional[str], out_dtype):
    """Train-mode BN: returns ``(y, mean, var)``; stats over leading axes
    and the ``phases`` channel groups; ``scale``/``bias``/stats per C =
    x.shape[-1]//phases."""
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, phases, eps, axis_name,
                                   out_dtype)
    return y, mean, var


def _counts(x, phases, axis_name):
    n_local = x.size // (x.shape[-1] // phases)
    if axis_name is not None:
        return n_local * jax.lax.psum(1, axis_name)
    return n_local


def _bn_fwd_impl(x, scale, bias, phases, eps, axis_name, out_dtype):
    c = x.shape[-1] // phases
    s, ss = _moment_sums(x)
    s, ss = _fold(s, phases), _fold(ss, phases)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
    n = _counts(x, phases, axis_name)
    mean = s / n
    var = jnp.maximum(ss / n - jnp.square(mean), 0.0)
    r = jax.lax.rsqrt(var + eps)
    dtype = out_dtype or x.dtype
    mul = (scale * r).astype(dtype)
    mean_c = jnp.tile(mean, phases).astype(dtype)
    mul_c = jnp.tile(mul, phases)
    bias_c = jnp.tile(bias.astype(dtype), phases)
    y = (x.astype(dtype) - mean_c) * mul_c + bias_c
    return y, mean, var, r


def _bn_fwd(x, scale, bias, phases, eps, axis_name, out_dtype):
    y, mean, var, r = _bn_fwd_impl(x, scale, bias, phases, eps, axis_name,
                                   out_dtype)
    return (y, mean, var), (x, scale, mean, var, r)


def _bn_bwd(phases, eps, axis_name, out_dtype, res, cts):
    x, scale, mean, var, r = res
    dy, dmean_ct, dvar_ct = cts
    n = _counts(x, phases, axis_name)

    sdy, sdyx = _pair_sums(dy, x)
    sdy, sdyx = _fold(sdy, phases), _fold(sdyx, phases)
    if axis_name is not None:
        sdy = jax.lax.psum(sdy, axis_name)
        sdyx = jax.lax.psum(sdyx, axis_name)

    # sum(dy * xhat) with xhat = (x - mean) * r
    sdyxh = r * (sdyx - mean * sdy)
    dscale = sdyxh
    dbias = sdy

    # dx = scale*r*dy - scale*r/n*sdy - scale*r^2/n*(x-mean)*sdyxh
    #      + dmean_ct/n + dvar_ct*(2x - 2mean)/n   (exact mean/var cotangents)
    # in per-channel coefficient form dx = a*dy + b*x + d:
    a = scale * r
    b = -(scale * jnp.square(r) * sdyxh) / n + 2.0 * dvar_ct / n
    d = (-scale * r * sdy / n
         + scale * jnp.square(r) * sdyxh * mean / n
         + dmean_ct / n
         - 2.0 * dvar_ct * mean / n)
    dt = x.dtype
    a_c = jnp.tile(a, phases).astype(dt)
    b_c = jnp.tile(b, phases).astype(dt)
    d_c = jnp.tile(d, phases).astype(dt)
    dx = dy.astype(dt) * a_c + x * b_c + d_c
    return dx, dscale, dbias


bn_train.defvjp(_bn_fwd, _bn_bwd)
