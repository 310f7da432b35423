"""Shared flax building blocks (NHWC, TPU conv layouts).

Functional counterparts of the reference's Module.py building blocks:
DoubleConv (Module.py:18-35), Down (:38-49), Up (:52-79), OutConv (:82-90),
ResidualBlock (:174-190) — rebuilt as flax.linen modules in NHWC with
torch-matched default initialization (kaiming-uniform kernels, fan-in uniform
bias) so training dynamics track the reference.

BatchNorm follows torch semantics: momentum 0.1 (flax momentum=0.9),
eps 1e-5, train mode uses batch statistics. ``axis_name`` enables sync-BN
when the step runs under shard_map data parallelism — with tiny global
batches (10-15 in the reference demos) per-replica statistics would diverge
from the single-device reference, so cross-replica stats are the default
parity choice (SURVEY.md section 7 "hard parts" #2).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_kernel_init():
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def bn_fold_enabled() -> bool:
    """Fold conv biases into the following BatchNorm (default ON).

    A conv bias immediately followed by train-mode BN cancels exactly in the
    normalized output — its only effect is shifting the running-mean buffer,
    and its gradient is identically zero. Deferring the bias add (TorchConv
    ``defer_bias``) and folding it into the BN running-mean update
    (``BatchNorm(..., fold_bias=b)``) removes one full-HBM ``sum(dy)``
    bias-gradient pass per conv from the backward (~5.7 ms of the 135 ms
    joint step at the production config) plus the forward bias adds.

    Exact up to float reassociation. One deliberate semantic deviation: the
    reference's torch autograd computes those zero gradients as O(eps)
    rounding noise, which Adam normalizes to +-lr random-walk steps on the
    bias; with the fold the gradient is exactly zero so the bias stays at
    init. The walk is sub-1e-2 over full schedules and cancels in the BN
    output either way (running stats track it); head-to-head trajectories
    are unchanged (tests/test_layers_bn_fold.py). Disable with
    FCDGAN_NO_BN_FOLD=1 for bit-faithful graph shape.
    """
    import os

    return os.environ.get("FCDGAN_NO_BN_FOLD") != "1"


def bn_fused_enabled() -> bool:
    """Custom-VJP train-mode BN with one-pass per-channel reductions
    (ops/fused_bn.py; Pallas on TPU, jnp elsewhere). Opt-in
    FCDGAN_FUSED_BN=1 — measured NET-NEGATIVE on the v5e joint step
    (3.61 -> 2.91 Mpx/s with the Pallas reductions, 3.38 with jnp +
    FCDGAN_BN_PALLAS=0): XLA fuses the stat reductions into the conv
    backward epilogues, which the custom VJP forecloses, and its separate
    dx pass re-reads x. Kept as a verified-correct building block (see
    tests/test_fused_bn.py) for layouts where the fusion argument flips."""
    import os

    return os.environ.get("FCDGAN_FUSED_BN") == "1"


class _S2dConv(nn.Module):
    """Conv with the same parameter tree as nn.Conv, computed through the
    exact space-to-depth transform (ops/s2d_conv.py) — the lane-utilization
    fix for narrow convs (the generator's 9x9s: 2-D; its 3x3 trunk: 1-D).
    Mode '1d_pre' consumes/produces tensors already in W-s2d layout (the
    whole-trunk form; channel layouts: input (px, c), output (qx, o))."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Optional[jnp.dtype] = None
    mode: str = "2d"
    defer_bias: bool = False  # return (y, bias) instead of y + bias

    @nn.compact
    def __call__(self, x):
        from ..ops.s2d_conv import conv_s2d, conv_s2d_w, conv_s2d_w_pre

        k = self.kernel_size[0]
        c_in = x.shape[-1] // 2 if self.mode == "1d_pre" else x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, c_in, self.features),
            jnp.float32,
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype
        if self.mode == "1d_pre":
            y = conv_s2d_w_pre(x.astype(dtype), kernel.astype(dtype))
            if self.defer_bias:
                return y, bias
            return y + jnp.tile(bias.astype(dtype), 2)
        conv = conv_s2d if self.mode == "2d" else conv_s2d_w
        y = conv(x.astype(dtype), kernel.astype(dtype))
        if self.defer_bias:
            return y, bias
        return y + bias.astype(dtype)


class _SplitConcatConv(nn.Module):
    """Conv over an implicit channel concatenation, without materializing it.

    conv(concat(xs, -1), W) == sum_i conv(x_i, W[:, :, off_i:off_i+c_i]) —
    exact by linearity. The parameter tree (kernel over the FULL channel
    count + bias) is identical to nn.Conv on the concatenated input, so
    checkpoints/goldens interop. Measured on v5e at the Segmentor decoder
    shapes: the concatenated conv runs at 32-53 TF/s, the split form at
    43-68 TF/s (experiments/concat_split_bench.py) — the concat
    materialization is pure HBM churn."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Optional[jnp.dtype] = None
    defer_bias: bool = False  # return (y, bias) instead of y + bias

    @nn.compact
    def __call__(self, xs):
        k = self.kernel_size[0]
        chans = [x.shape[-1] for x in xs]
        c_in = sum(chans)
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, c_in, self.features), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        dtype = self.dtype or xs[0].dtype
        kd = kernel.astype(dtype)
        pad = [((k - 1) // 2, (k - 1) // 2)] * 2
        y = None
        off = 0
        for x, c in zip(xs, chans):
            part = jax.lax.conv_general_dilated(
                x.astype(dtype), kd[:, :, off : off + c, :], (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = part if y is None else y + part
            off += c
        if self.defer_bias:
            return y, bias
        return y + bias.astype(dtype)


class _PlainConv(nn.Module):
    """nn.Conv-equivalent (same param tree: kernel + bias) that can defer the
    bias add, returning ``(y, bias)`` for a following BatchNorm to fold."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Optional[jnp.dtype] = None
    defer_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k[0], k[1], x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), self.strides, self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.defer_bias:
            return y, bias
        return y + bias.astype(dtype)


class TorchConv(nn.Module):
    """nn.Conv with torch-default kernel/bias initialization.

    Large narrow stride-1 kernels route through the exact space-to-depth
    conv (identical parameter tree, see ops/s2d_conv.use_s2d). A tuple/list
    input routes through :class:`_SplitConcatConv` (conv over an implicit
    concat; FCDGAN_NO_SPLITCAT=1 concatenates up front instead).

    ``defer_bias=True`` (conv feeding a BatchNorm, see ``bn_fold_enabled``)
    returns ``(y_without_bias, bias_param)`` for the BN to fold."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int] = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    s2d_w_input: bool = False  # x is already in W-s2d layout (whole trunk)
    defer_bias: bool = False

    @nn.compact
    def __call__(self, x):
        import os

        if isinstance(x, (tuple, list)):
            k = self.kernel_size[0]
            splittable = (
                len(x) > 1
                and os.environ.get("FCDGAN_NO_SPLITCAT") != "1"
                and self.use_bias
                and self.strides in (1, (1, 1))
                and self.kernel_size[0] == self.kernel_size[1]
                and self.padding in ("SAME", (k - 1) // 2)
            )
            if not splittable:
                x = x[0] if len(x) == 1 else jnp.concatenate(x, axis=-1)
            else:
                c_in = sum(t.shape[-1] for t in x)
                fan_in = c_in * int(np.prod(self.kernel_size))
                bound = 1.0 / np.sqrt(fan_in)

                def bias_init(key, shape, dtype=jnp.float32):
                    return jax.random.uniform(key, shape, dtype, -bound, bound)

                return _SplitConcatConv(
                    self.features, self.kernel_size, name="Conv_0",
                    kernel_init=torch_kernel_init(), bias_init=bias_init,
                    dtype=self.dtype, defer_bias=self.defer_bias,
                )(x)
        c_in = x.shape[-1] // 2 if self.s2d_w_input else x.shape[-1]
        fan_in = c_in * int(np.prod(self.kernel_size))
        bound = 1.0 / np.sqrt(fan_in)

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        if self.s2d_w_input:
            return _S2dConv(
                self.features, self.kernel_size, name="Conv_0",
                kernel_init=torch_kernel_init(), bias_init=bias_init,
                dtype=self.dtype, mode="1d_pre", defer_bias=self.defer_bias,
            )(x)

        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides, strides)

        from ..ops.s2d_conv import s2d_mode

        k = self.kernel_size[0]
        mode = None
        if (
            self.use_bias
            and self.kernel_size[0] == self.kernel_size[1]
            and padding == [((k - 1) // 2, (k - 1) // 2)] * 2
        ):
            mode = s2d_mode(x.shape[1], x.shape[2], k, x.shape[-1],
                            self.features, strides)
        if mode is not None:
            return _S2dConv(
                self.features, self.kernel_size, name="Conv_0",
                kernel_init=torch_kernel_init(), bias_init=bias_init,
                dtype=self.dtype, mode=mode, defer_bias=self.defer_bias,
            )(x)
        if self.defer_bias:
            return _PlainConv(
                self.features, self.kernel_size, name="Conv_0",
                strides=strides, padding=padding,
                kernel_init=torch_kernel_init(), bias_init=bias_init,
                dtype=self.dtype, defer_bias=True,
            )(x)
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=strides,
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init(),
            bias_init=bias_init,
            dtype=self.dtype,
        )(x)


class _GroupedBatchNorm(nn.Module):
    """BatchNorm over a tensor whose channel axis is (phases, C) — the W-s2d
    layout. Exactly nn.BatchNorm on the de-reorganized tensor (the reorg is a
    permutation of spatial positions): stats reduce over N, H, W AND the
    phase groups; scale/bias/running stats stay per-C, so the parameter tree
    is identical to the plain layout (checkpoint/golden interop)."""

    phases: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, fold_bias=None):
        c = x.shape[-1] // self.phases
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        # fold_bias: x is a conv output WITHOUT its bias. The bias cancels in
        # the train-mode normalize (mean shifts with it), so only the
        # running-mean buffer sees it — stored stats stay interop with the
        # biased convention (see bn_fold_enabled). Non-differentiable on
        # purpose: its true gradient is identically zero.
        fb = (None if fold_bias is None
              else jax.lax.stop_gradient(fold_bias.astype(jnp.float32)))
        xg = x.reshape(x.shape[:-1] + (self.phases, c))
        if train and bn_fused_enabled():
            # custom-VJP path: Pallas one-pass reductions on TPU, identical
            # formulas via jnp elsewhere (ops/fused_bn.py)
            from ..ops.fused_bn import bn_train

            dtype = self.dtype or x.dtype
            y, mean, var = bn_train(x, scale, bias, self.phases,
                                    self.epsilon, self.axis_name, dtype)
            if not self.is_initializing():
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
                stored_mean = mean if fb is None else mean + fb
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * stored_mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
            return y.astype(dtype)
        if train:
            xf = xg.astype(jnp.float32)
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                stored_mean = mean if fb is None else mean + fb
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * stored_mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
            if fb is not None:
                mean = mean - fb

        dtype = self.dtype or x.dtype
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(dtype)
        y = (xg - mean.astype(dtype)) * mul + bias.astype(dtype)
        return y.reshape(x.shape).astype(dtype)


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm2d (momentum 0.1, eps 1e-5, optional sync).

    ``w_phases > 1``: input is in W-s2d layout; statistics aggregate across
    the phase groups so the math equals plain BN on the original layout."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    w_phases: int = 1

    @nn.compact
    def __call__(self, x, train: bool, fold_bias=None):
        if self.w_phases > 1 or fold_bias is not None:
            return _GroupedBatchNorm(
                self.w_phases, axis_name=self.axis_name, dtype=self.dtype,
                name="BatchNorm_0",
            )(x, train, fold_bias)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


class PReLU(nn.Module):
    """torch-default PReLU: one learnable slope, init 0.25 (Module.py:148)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x2 (parity: Module.py:18-35).

    ``x`` may be a tuple of tensors = an implicit channel concatenation;
    the first conv then runs split-by-input (see _SplitConcatConv).

    FCDGAN_BLOCK_S2D=1 (opt-in): when both convs are narrow (<=64 channels,
    the U-Net's first block at full tile resolution) the whole block runs in
    the W-axis space-to-depth layout: one reshape in, convs + phase-grouped
    BN + ReLU at 128 lanes / full (8,128) tiles, one reshape out — instead of
    the per-conv s2d round trips TorchConv would otherwise emit. Exact;
    identical parameter tree. Measured NEUTRAL on the v5e joint step (3.481
    without vs 3.469-3.476 with, quiet host) — XLA already folds the per-conv
    reshapes into the conv fusions, so the saved round trips buy nothing;
    kept opt-in for re-measurement after future layout changes."""

    features: int
    mid_features: Optional[int] = None
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        import os

        from ..ops.s2d_conv import depth_to_space_w, space_to_depth_w

        mid = self.mid_features or self.features
        block_s2d = (
            not isinstance(x, (tuple, list))
            and os.environ.get("FCDGAN_NO_S2D") != "1"
            and os.environ.get("FCDGAN_BLOCK_S2D") == "1"
            and max(x.shape[-1], mid, self.features) <= 64
            and x.shape[2] % 2 == 0
            and min(x.shape[1], x.shape[2]) >= 6
        )
        if block_s2d:
            x = space_to_depth_w(x)
        phases = 2 if block_s2d else 1
        fold = bn_fold_enabled()
        x = TorchConv(mid, (3, 3), padding=1, dtype=self.dtype,
                      s2d_w_input=block_s2d, defer_bias=fold)(x)
        x, fb = x if fold else (x, None)
        x = BatchNorm(self.axis_name, self.dtype, w_phases=phases)(x, train, fb)
        x = nn.relu(x)
        x = TorchConv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      s2d_w_input=block_s2d, defer_bias=fold)(x)
        x, fb = x if fold else (x, None)
        x = BatchNorm(self.axis_name, self.dtype, w_phases=phases)(x, train, fb)
        x = nn.relu(x)
        if block_s2d:
            x = depth_to_space_w(x, self.features)
        return x


def _up2(t):
    """Nearest-neighbour 2x upsample on H and W (broadcast + reshape)."""
    n, h, w, c = t.shape
    t = jnp.broadcast_to(t[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return t.reshape(n, 2 * h, 2 * w, c)


@jax.custom_vjp
def max_pool_2x2(x):
    """2x2/2 max pool whose backward is an equality mask instead of XLA's
    select-and-scatter. Gradient ties (equal maxima in a window, e.g. ReLU
    zeros) are split evenly — sum-preserving, vs select-and-scatter routing
    to one arbitrary winner.

    OFF by default (opt in with FCDGAN_FASTPOOL=1): when first measured it
    saved 5.4 ms/step of select_and_scatter, but after the slice-built s2d
    kernels and stacked-VGG changes the balance flipped — the joint-step A/B
    (2 reps each, quiet host) reads 3.38 Mpx/s with XLA's select_and_scatter
    everywhere vs 3.27 (segmentor-only mask pool) and 3.20 (mask pool also in
    the VGG trunk). Negative result kept for the record; re-measure after any
    major layout change."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _mp_fwd(x):
    y = nn.max_pool(x, (2, 2), strides=(2, 2))
    return y, (x, y)


def _mp_bwd(res, dy):
    x, y = res
    n, h2, w2, c = y.shape
    xc = x[:, : 2 * h2, : 2 * w2, :]
    mask = (xc == _up2(y)).astype(dy.dtype)
    cnt = jax.lax.reduce_window(
        mask, jnp.zeros((), dy.dtype), jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    dxc = mask * _up2(dy / jnp.maximum(cnt, 1))
    h, w = x.shape[1], x.shape[2]
    dx = jnp.pad(dxc, ((0, 0), (0, h - 2 * h2), (0, w - 2 * w2), (0, 0)))
    return (dx,)


max_pool_2x2.defvjp(_mp_fwd, _mp_bwd)


def max_pool_2x2_wsplit(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool as a W-phase select + 2x1 H-window pool.

    The W-axis reshape (N,H,W,C)->(N,H,W/2,2C) doubles the channel count —
    full (8,128) tiles and lanes for <=64-channel tensors — and the W-axis
    max becomes an elementwise first-wins select; only the H axis needs a
    windowed reduce (half the select_and_scatter work in the backward).
    Forward-exact vs nn.max_pool; tie routing composes to the same
    row-major first-max as XLA's 2x2 select_and_scatter.

    OPT-IN (FCDGAN_POOL=wsplit), measured NET-NEGATIVE in the segmentor
    (joint 3.54 -> 3.46 Mpx/s): on a plain-layout tensor the reshape is a
    relayout, and the pooled output feeds convs that re-reorganize — the
    trick only pays inside the VGG trunk where the tensor is ALREADY in
    W-s2d layout (models/vgg.py FCDGAN_VGG_S2D=2, the default there)."""
    n, h, w, c = x.shape
    if w % 2:
        x = x[:, :, : w - 1, :]
    xw = x.reshape(n, h, w // 2, 2 * c)
    a, b = xw[..., :c], xw[..., c:]
    m = jnp.where(a >= b, a, b)
    return jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
    )


def pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch the 2x2/2 max pool (FCDGAN_POOL=pallas|wsplit|mask|xla;
    default xla select_and_scatter — see each alternative's docstring for
    its measured A/B; pallas measured 9.4x SLOWER than select_and_scatter
    at block-2 shapes in isolation and, with the c>=128 Mosaic gate, whole
    joint step 3.20 vs 3.59 Mpx/s on v5e (ab_round3.jsonl pool_pallas) —
    default stays xla)."""
    import os

    mode = os.environ.get("FCDGAN_POOL")
    if mode is None and os.environ.get("FCDGAN_FASTPOOL") == "1":
        mode = "mask"  # back-compat alias
    if mode == "mask":
        return max_pool_2x2(x)
    if mode == "wsplit":
        return max_pool_2x2_wsplit(x)
    if mode == "pallas":
        # fused recompute backward (ops/pallas/pool_bwd.py): identical
        # routing to select_and_scatter, one VMEM pass instead of a scatter.
        # Falls through to XLA where the kernel can't run (f32: Mosaic
        # rejects the W-split reshape; tiny/VMEM-oversized blocks).
        from ..ops.pallas.pool_bwd import max_pool_2x2_fused, use_pallas_pool

        if use_pallas_pool(x.shape, x.dtype):
            return max_pool_2x2_fused(x)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class Down(nn.Module):
    """MaxPool2 -> DoubleConv (parity: Module.py:38-49)."""

    features: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = pool_2x2(x)
        return DoubleConv(self.features, axis_name=self.axis_name, dtype=self.dtype)(x, train)


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) corner-aligned linear interpolation matrix."""
    mat = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        mat[:, 0] = 1.0
        return mat
    src = np.linspace(0.0, in_size - 1.0, out_size)
    lo = np.clip(np.floor(src).astype(int), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = src - lo
    for i in range(out_size):
        mat[i, lo[i]] += 1.0 - frac[i]
        mat[i, hi[i]] += frac[i]
    return mat


def upsample_bilinear_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch nn.Upsample parity).

    jax.image.resize uses half-pixel centers, so the corner-aligned source
    grid ``src = i * (in-1)/(out-1)`` is applied as two separable
    interpolation **matmuls** — exact (the matrices hold the same lerp
    weights) and MXU-friendly; the gather+lerp formulation lowers to slow
    dynamic slices on TPU (measured 2.3x slower at the decoder's top level).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    wh = jnp.asarray(_interp_matrix(h, oh), x.dtype)
    ww = jnp.asarray(_interp_matrix(w, ow), x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", wh, x)
    return jnp.einsum("pw,nowc->nopc", ww, y)


def pad_to_match(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """F.pad(x1, [dx//2, dx-dx//2, dy//2, dy-dy//2]) parity (Module.py:70-74)."""
    dy = x2.shape[1] - x1.shape[1]
    dx = x2.shape[2] - x1.shape[2]
    return jnp.pad(
        x1, ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0))
    )


class Up(nn.Module):
    """Upscale x1, pad to x2's size, concat [x2, x1], DoubleConv (Module.py:52-79).

    ``x2`` (the skip) may be a tuple of tensors standing for their channel
    concatenation (the siamese per-level pair); the concat is then never
    materialized — the first DoubleConv conv splits over [*x2, x1]."""

    features: int
    bilinear: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        x2s = x2 if isinstance(x2, (tuple, list)) else (x2,)
        c2 = sum(t.shape[-1] for t in x2s)
        if self.bilinear:
            x1 = upsample_bilinear_align_corners(
                x1, (x1.shape[1] * 2, x1.shape[2] * 2)
            )
            conv = DoubleConv(
                self.features,
                mid_features=(x1.shape[-1] + c2) // 2,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
        else:
            x1 = nn.ConvTranspose(
                x1.shape[-1] // 2,
                (2, 2),
                strides=(2, 2),
                kernel_init=torch_kernel_init(),
                dtype=self.dtype,
            )(x1)
            conv = DoubleConv(self.features, axis_name=self.axis_name, dtype=self.dtype)
        x1 = pad_to_match(x1, x2s[0])
        return conv((*x2s, x1), train)


class OutConv(nn.Module):
    """Conv1x1 -> sigmoid (parity: Module.py:82-90)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, (1, 1), padding=0, dtype=self.dtype)(x)
        return nn.sigmoid(x)


class ResidualBlock(nn.Module):
    """Conv3x3-BN-PReLU-Conv3x3-BN + identity (parity: Module.py:174-190).

    ``s2d_w``: the block operates on a W-s2d-layout tensor end-to-end
    (convs via scattered kernels, BN with phase-grouped statistics); exact,
    identical parameter tree."""

    features: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    s2d_w: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        phases = 2 if self.s2d_w else 1
        fold = bn_fold_enabled()
        r = TorchConv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      s2d_w_input=self.s2d_w, defer_bias=fold)(x)
        r, fb = r if fold else (r, None)
        r = BatchNorm(self.axis_name, self.dtype, w_phases=phases)(r, train, fb)
        r = PReLU()(r)
        r = TorchConv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      s2d_w_input=self.s2d_w, defer_bias=fold)(r)
        r, fb = r if fold else (r, None)
        r = BatchNorm(self.axis_name, self.dtype, w_phases=phases)(r, train, fb)
        return x + r
