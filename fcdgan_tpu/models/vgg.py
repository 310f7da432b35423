"""VGG16 feature extractor for the perception loss.

The reference taps frozen torchvision-pretrained VGG16 features at the
post-ReLU indices [29, 22, 15, 8, 3] of ``vgg16().features``
(/root/reference/Loss.py:25-34) — i.e. relu5_3, relu4_3, relu3_3, relu2_2,
relu1_2 — and compares target vs generated feature maps with MSE.

This environment has no torchvision and no network egress, so pretrained
weights are **pluggable**: :func:`load_vgg16_params` loads a converted ``.npz``
(produced by ``tools/convert_vgg.py`` on a machine with torchvision), and falls
back to a fixed-seed He-normal random network otherwise. A frozen random
convnet is a well-documented functioning perceptual metric; swap in the
converted weights for exact reference parity.

TPU-first: NHWC, single stacked forward for per-band mode (the reference loops
bands through VGG sequentially, Loss.py:52-60).
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels per conv layer, pool positions) of vgg16().features
_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")

# torchvision sequential index of each ReLU, in _CFG conv order
_RELU_INDEX: List[int] = []
_i = 0
for _c in _CFG:
    if _c == "M":
        _i += 1
    else:
        _RELU_INDEX.append(_i + 1)  # conv at _i, relu at _i+1
        _i += 2

#: multi-layer tap list, deepest first (parity: Loss.py:30)
FEATURE_LAYER_LIST: Tuple[int, ...] = (29, 22, 15, 8, 3)


def _ppe_primal(h):
    """Primal values for the W-s2d pool exit (W-phase first-wins select +
    2x1 H max pool). FCDGAN_PHASE_POOL=pallas routes the fused kernel
    (ops/pallas/phase_pool.py) where it applies — identical values.

    NOTE (semantics, advisor r4): this env var and FCDGAN_PPE_BWD are read
    at TRACE time — a jit executable compiled before the toggle keeps its
    original routing; toggling after a warm jit cache silently has no
    effect (set the env before the first traced call, or clear jax caches).
    """
    if os.environ.get("FCDGAN_PHASE_POOL") == "pallas":
        from ..ops.pallas.phase_pool import (
            phase_pool_forward, use_pallas_phase_pool,
        )

        if use_pallas_phase_pool(h.shape, h.dtype):
            return phase_pool_forward(h)
    c = h.shape[-1] // 2
    a, b = h[..., :c], h[..., c:]
    m = jnp.where(a >= b, a, b)
    return jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
    )


@jax.custom_vjp
def _phase_pool_exit(h: jnp.ndarray) -> jnp.ndarray:
    """W-s2d pool exit: W-phase first-wins select + 2x1 H max pool.

    The primal body routes through ``_ppe_primal`` so NON-differentiated
    forwards (eval/inference) reach the pallas opt-in too (advisor r4 —
    previously only the custom_vjp fwd rule routed it). The custom VJP
    saves only ``h`` and RECOMPUTES both select masks in the backward.
    XLA's default VJP stores the phase predicate (~93 MB at the block-1
    shape) and runs a select_and_scatter for the H pool — together ~6 ms of
    the joint step; the recompute form is a pure fused elementwise pass
    near HBM bandwidth. Tie routing (first-wins on both axes) composes to
    XLA select_and_scatter's row-major first-max exactly."""
    return _ppe_primal(h)


def _ppe_fwd(h):
    return _ppe_primal(h), h


def _ppe_bwd(h, dy):
    # Elementwise-only form: H-pairing runs through repeat (broadcast +
    # leading-dim reshape, layout-free) and an even-row iota mask instead of
    # stack(axis=2) + 5-D reshape + pad — that lowering cost a layout copy
    # of the stacked tensor plus two extra full passes (traced 6.6 ms at the
    # block-1 shape; this form fuses to ~2 passes near HBM bandwidth).
    # Measured joint step on v5e (experiments/step_time.py, 3 reps each,
    # spread <0.2 ms): 134.3 -> 132.2 ms/step, 3.60 -> 3.66 Mpx/s.
    #
    # Round-4 trace truth: XLA still splits this into 2-3 fusions that
    # materialize the bool masks between them (pred tensors tile as
    # T(8,128)(4,1)), and each fusion runs at only ~312 GB/s — ~4.5 ms
    # total vs the ~1 ms single-pass bound. FCDGAN_PPE_BWD=mul is the
    # measured-variant switch: identical routing with bf16 0/1 masks and
    # multiply-routing instead of preds+selects (see _ppe_bwd_mul).
    if os.environ.get("FCDGAN_PPE_BWD") == "mul":
        return _ppe_bwd_mul(h, dy)
    c = h.shape[-1] // 2
    a, b = h[..., :c], h[..., c:]
    psel = a >= b
    m = jnp.where(psel, a, b)
    n, hh, w, _ = m.shape
    h2 = hh // 2
    m2 = m[:, : 2 * h2].reshape(n, h2, 2, w, c)
    hsel = m2[:, :, 0] >= m2[:, :, 1]  # (n, h2, w, c)
    # full-height routed gradient: row 2k takes dy[k] iff hsel[k], row 2k+1
    # takes dy[k] iff ~hsel[k] -> where(hsel == even_row, dy, 0)
    hsel_full = jnp.repeat(hsel, 2, axis=1)
    dy_full = jnp.repeat(dy.astype(h.dtype), 2, axis=1)
    even = (jax.lax.broadcasted_iota(jnp.int32, (1, 2 * h2, 1, 1), 1) % 2) == 0
    dm = jnp.where(hsel_full == even, dy_full, 0).astype(h.dtype)
    if 2 * h2 != hh:
        dm = jnp.pad(dm, ((0, 0), (0, hh - 2 * h2), (0, 0), (0, 0)))
    dh = jnp.concatenate(
        [jnp.where(psel, dm, 0), jnp.where(psel, 0, dm)], axis=-1
    ).astype(h.dtype)
    return (dh,)


def _ppe_bwd_mul(h, dy):
    """Same routing as _ppe_bwd, all-arithmetic: the selectors are 0/1
    masks in the compute dtype and the gradient is routed by multiplication.

    EXACT for every routed value: dy*1 == dy, and the unrouted positions
    are dy*0 == 0 (dy is finite — it is a mean-MSE cotangent). The ``m``
    recompute uses ``maximum`` (== where(a>=b, a, b) for all non-NaN inputs
    INCLUDING +/-inf — bf16 activations can overflow to inf, and the
    multiply-routed form a*sa + b*(1-sa) would produce inf*0 = NaN there,
    corrupting the H selector; advisor finding r4) — still no pred
    intermediates between fusions (bf16 tiles as (8,128)(2,1) instead of
    pred's (4,1))."""
    c = h.shape[-1] // 2
    a, b = h[..., :c], h[..., c:]
    one = jnp.ones((), h.dtype)
    zero = jnp.zeros((), h.dtype)
    sa = jnp.where(a >= b, one, zero)          # W-phase first-wins, 0/1
    m = jnp.maximum(a, b)                      # inf-safe first-wins value
    n, hh, w, _ = m.shape
    h2 = hh // 2
    m2 = m[:, : 2 * h2].reshape(n, h2, 2, w, c)
    st = jnp.where(m2[:, :, 0] >= m2[:, :, 1], one, zero)  # H first-wins 0/1
    st_full = jnp.repeat(st, 2, axis=1)
    dy_full = jnp.repeat(dy.astype(h.dtype), 2, axis=1)
    ev = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (1, 2 * h2, 1, 1), 1) % 2) == 0,
        one, zero)
    gate = st_full * ev + (one - st_full) * (one - ev)  # 1 iff routed here
    dm = dy_full * gate
    if 2 * h2 != hh:
        dm = jnp.pad(dm, ((0, 0), (0, hh - 2 * h2), (0, 0), (0, 0)))
    dh = jnp.concatenate([dm * sa, dm * (one - sa)], axis=-1)
    return (dh.astype(h.dtype),)


_phase_pool_exit.defvjp(_ppe_fwd, _ppe_bwd)


def vgg16_random_params(seed: int = 0, dtype=jnp.float32) -> Dict[str, np.ndarray]:
    """Deterministic He-normal random VGG16 conv weights (fallback)."""
    rng = np.random.default_rng(seed)
    params = {}
    in_c = 3
    for li, c in enumerate([c for c in _CFG if c != "M"]):
        fan_in = in_c * 9
        std = float(np.sqrt(2.0 / fan_in))
        params[f"conv{li}_kernel"] = rng.normal(0, std, (3, 3, in_c, c)).astype(np.float32)
        params[f"conv{li}_bias"] = np.zeros((c,), np.float32)
        in_c = c
    return params


def load_vgg16_params(
    path: Optional[str] = None, require: bool = False
) -> Dict[str, np.ndarray]:
    """Load converted torchvision weights from ``.npz``; random fallback.

    Search order: explicit ``path`` -> ``$FCDGAN_VGG16_NPZ`` -> bundled asset
    ``fcdgan_tpu/assets/vgg16_features.npz`` -> fixed-seed random.

    The random fallback is a *different* perceptual metric than the
    reference's pretrained VGG16 (Loss.py:25-28) — functional, but not
    reference-parity (bound measured in VGG16_WEIGHTS.md). Falling back
    therefore WARNS loudly once per process; ``require=True`` (drivers:
    ``--require-vgg true``; env ``FCDGAN_REQUIRE_VGG=1``) hard-fails instead.
    """
    candidates = []
    if path:
        candidates.append(path)
    env = os.environ.get("FCDGAN_VGG16_NPZ")
    if env:
        candidates.append(env)
    candidates.append(os.path.join(os.path.dirname(__file__), "..", "assets", "vgg16_features.npz"))
    for c in candidates:
        if c and os.path.exists(c):
            with np.load(c) as z:
                return {k: z[k] for k in z.files}
    if require or os.environ.get("FCDGAN_REQUIRE_VGG") == "1":
        raise FileNotFoundError(
            "no pretrained VGG16 weights found (searched: %s); the perception "
            "loss requires vgg16_features.npz — produce it with "
            "tools/convert_vgg.py on a machine with torchvision, then pass "
            "--vgg-npz / set $FCDGAN_VGG16_NPZ (see VGG16_WEIGHTS.md)"
            % ", ".join(candidates))
    global _WARNED_FALLBACK
    if not _WARNED_FALLBACK:
        _WARNED_FALLBACK = True
        print(
            "WARNING fcdgan_tpu: no pretrained VGG16 weights found — the "
            "perception loss is using a FIXED-SEED RANDOM VGG, which is NOT "
            "the reference's pretrained perceptual metric (Loss.py:25-28). "
            "Convert weights with tools/convert_vgg.py and pass --vgg-npz, "
            "or pass --require-vgg true to fail instead (VGG16_WEIGHTS.md).",
            file=sys.stderr, flush=True)
    return vgg16_random_params()


_WARNED_FALLBACK = False


def vgg16_features(
    x: jnp.ndarray,
    params: Dict[str, np.ndarray],
    tap_indices: Sequence[int],
    dtype=None,
) -> List[jnp.ndarray]:
    """Run NHWC RGB input through VGG16 features, returning tapped activations.

    ``tap_indices`` are torchvision sequential indices (see
    FEATURE_LAYER_LIST); computation stops at the deepest requested tap —
    unlike the reference, which runs the full stack regardless (Loss.py:45).
    ``dtype`` sets the conv compute dtype (bf16 under mixed precision — TPU
    "f32" convs decompose into multiple bf16 passes, so this is ~3x cheaper);
    tapped features are returned in f32 for the MSE."""
    taps = set(int(t) for t in tap_indices)
    deepest = max(taps)
    out: List[Tuple[int, jnp.ndarray]] = []
    li = 0
    seq = 0
    h = x if dtype is None else x.astype(dtype)
    from .layers import max_pool_2x2, pool_2x2
    from ..ops.s2d_conv import (
        depth_to_space_w, s2d_mode, s2d_w_kernel, space_to_depth_w,
    )

    fastpool = os.environ.get("FCDGAN_FASTPOOL") == "1"
    # OPT-IN (FCDGAN_VGG_S2D=1|2): run the 64-channel block-1 convs in the
    # W-axis space-to-depth layout (exact rewrite, ops/s2d_conv — the same
    # transform that wins 2x in the generator trunk). The device trace shows
    # the [60,220,220,64] block-1 tensors at 44-54 TF/s: 64 channels half-fill
    # both the 128 lanes and the (8,128) memory tiles.
    #   "1": de-reorganize (depth_to_space_w) before each pool. Measured
    #        NET-NEGATIVE: joint step 3.45 -> 3.41 Mpx/s (2 reps each, quiet
    #        host) — the transform's 2x FLOP factor + the d2s relayout at
    #        pool1 eat the tiling win (the frozen-VGG bwd has no dW convs to
    #        gain, unlike the generator).
    #   "2": exit the layout THROUGH the pool: in W-s2d the pool's W-axis max
    #        is an elementwise first-wins select of the two phase channel
    #        halves (no d2s), then a 2x1 H-window pool lands directly in the
    #        plain pooled layout. Exact in forward AND backward: first-in-W
    #        then first-in-H tie routing composes to exactly the row-major
    #        first-max routing of XLA select_and_scatter / torch max_pool2d.
    #        Measured +0.9%: joint 3.45 -> 3.48 Mpx/s — THE DEFAULT.
    vgg_s2d = os.environ.get("FCDGAN_VGG_S2D", "2")
    in_s2d = False
    for c in _CFG:
        if c == "M":
            if seq > deepest:
                break
            if in_s2d and vgg_s2d == "2":
                # W-phase max + 2x1 H pool, recompute-in-backward VJP
                h = _phase_pool_exit(h)
                in_s2d = False
                seq += 1
                continue
            if in_s2d:
                h = depth_to_space_w(h, prev_c)
                in_s2d = False
            if fastpool:
                # opt-in equality-mask VJP (see models/layers.max_pool_2x2:
                # measured SLOWER than XLA's select_and_scatter here)
                h = max_pool_2x2(h)
            else:
                # routes FCDGAN_POOL=pallas|wsplit too (default: XLA
                # select_and_scatter), so pool A/Bs cover the VGG trunk
                h = pool_2x2(h)
            seq += 1
        else:
            if seq > deepest:
                break
            k = jnp.asarray(params[f"conv{li}_kernel"], h.dtype)
            b = jnp.asarray(params[f"conv{li}_bias"], h.dtype)
            if li == 0 and h.shape[-1] == 1 and k.shape[2] == 3:
                # Per-band perception feeds each band as a 1-channel plane
                # instead of replicating it to RGB (Loss.py:52 replicates):
                # conv(tile(x,3), k) == conv(x, k.sum(in_axis)) by linearity,
                # so the (2*C*B, H, W, 3) stacked input and its BW-bound dX
                # pass shrink 3x. The sum runs in f32 regardless of compute
                # dtype: exact in f32 mode; under bf16 the only deviation is
                # one bf16 rounding of the summed kernel (vs the replicated
                # conv's f32 accumulation of three bf16 products).
                k = jnp.asarray(params[f"conv{li}_kernel"], jnp.float32).sum(
                    axis=2, keepdims=True).astype(h.dtype)
            if vgg_s2d in ("1", "2") and not in_s2d and s2d_mode(
                h.shape[1], h.shape[2], 3, h.shape[-1], c
            ) == "1d":
                h = space_to_depth_w(h)
                in_s2d = True
            if in_s2d:
                w2, pad2 = s2d_w_kernel(k, 1)
                h = jax.lax.conv_general_dilated(
                    h, w2, (1, 1), [(pad2, pad2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.tile(b, 2)
            else:
                h = jax.lax.conv_general_dilated(
                    h, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b
            h = jax.nn.relu(h)
            prev_c = c
            seq += 2
            if seq - 1 in taps:  # relu index
                t = depth_to_space_w(h, c) if in_s2d else h
                out.append((seq - 1, t.astype(jnp.float32)))
            li += 1
    order = {t: i for i, t in enumerate(tap_indices)}
    out.sort(key=lambda kv: order[kv[0]])
    return [h for _, h in out]


def select_feature_layers(feature_layer: int) -> Tuple[int, ...]:
    """First N entries of the tap list, clamped to [1, 5] (Loss.py:32-34)."""
    n = max(1, min(int(feature_layer), 5))
    return FEATURE_LAYER_LIST[:n]
