"""FCD-GAN loss family — pure functions over NHWC batches.

Semantic parity with /root/reference/Loss.py:
  * :func:`perception_loss`       — PerceptionLoss (Loss.py:17-61)
  * :func:`cnet_loss`             — CNetLoss, USSS (Loss.py:64-95)
  * :func:`cgenerator_loss`       — CGeneratorLoss, WSSS/RSSS (Loss.py:100-124)
  * :func:`region_loss`           — region_loss, RSSS (Loss.py:127-141)

All functions take an optional ``sample_weight`` (B,) so fixed-shape padded
batches (the XLA-friendly replacement for the reference's variable last batch)
contribute exactly like the reference's true batch: weighted terms divide by
``sum(sample_weight)``, matching the reference's division by the batch size.

Masks: ``cmap`` is the (B, H, W, 1) soft change-density; images are masked by
``1 - cmap`` broadcast over channels; per-sample losses are rescaled by
``num_pixel / num_wnc`` (the unchanged-weighted pixel count) exactly as
Loss.py:81-84. Samples with ``num_wnc == 0`` are skipped in
:func:`cgenerator_loss` (Loss.py:116-117) and empty regions in
:func:`region_loss` (Loss.py:136-137); the batch denominator is unaffected,
like the reference.

TPU-first: everything is batched (no per-sample python loops); per-band
perception stacks bands on the batch axis for one VGG pass instead of the
reference's sequential per-band loop.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models import vgg as vgg_mod
from . import ssim as ssim_mod


def _weights(x: jnp.ndarray, sample_weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    if sample_weight is None:
        return jnp.ones((x.shape[0],), x.dtype)
    return sample_weight.astype(x.dtype)


def _mask_image(img: jnp.ndarray, cmap: jnp.ndarray) -> jnp.ndarray:
    """img * (1 - cmap) with the 1-channel map broadcast over bands."""
    return img * (1.0 - cmap)


def hard_mask(cmap: jnp.ndarray) -> jnp.ndarray:
    """cmask = (sign(cmap - 0.5) + 1) / 2 (parity: Loss.py:75)."""
    return (jnp.sign(cmap - 0.5) + 1.0) / 2.0


# ---------------------------------------------------------------------------
# Perception loss
# ---------------------------------------------------------------------------


def perception_loss(
    target: jnp.ndarray,
    generated: jnp.ndarray,
    cmask: jnp.ndarray,
    vgg_params: Dict,
    feature_layers: Sequence[int] = (29,),
    per_band: bool = False,
    sample_weight: Optional[jnp.ndarray] = None,
    dtype=None,
    target_grad: bool = True,
) -> jnp.ndarray:
    """Frozen-VGG16 MSE over unchanged pixels (parity: Loss.py:17-61).

    RGB mode uses the first three bands; per-band mode replicates each band to
    three channels and averages over bands — here as one stacked VGG pass.

    ``target_grad=False`` declares the target branch gradient-dead — true in
    every G-pretrain phase, where both ``target`` and ``cmask`` are data
    (cmap=0 at Demo_USSS.py:151/Demo_WSSS.py:167, cmap=region at
    Demo_RSSS.py:203), so d(masked target)/d(params) == 0 identically. The
    two branches then run as SEPARATE VGG passes with the target pass under
    ``stop_gradient``: stacked, one conv op carries both halves and XLA must
    compute the backward dX for the full stack; split, the target half's
    backward disappears — ~half the perception backward FLOPs for free.
    Forward math is unchanged (VGG16 features have no cross-sample ops).
    """
    w = _weights(target, sample_weight)
    layer_num = len(feature_layers)

    if not per_band:
        assert target.shape[-1] >= 3
        x = _mask_image(target[..., :3], cmask)
        y = _mask_image(generated[..., :3], cmask)
        n_rep = 1
    else:
        n_channels = target.shape[-1]
        xm = _mask_image(target, cmask)  # (B, H, W, C)
        ym = _mask_image(generated, cmask)
        # (C*B, H, W, 1): one plane per band, stacked on batch. The reference
        # replicates each band to RGB (Loss.py:52); vgg16_features collapses
        # conv1_1's in-channels instead (k.sum == conv of the replicated
        # input, exactly), so the 3x band replication never materializes.
        def stack(img):
            bands = jnp.moveaxis(img, -1, 0)[..., None]  # (C, B, H, W, 1)
            return bands.reshape((-1,) + img.shape[1:3] + (1,))

        x, y = stack(xm), stack(ym)
        n_rep = n_channels

    loss = jnp.zeros((), jnp.float32)
    if target_grad:
        # one stacked VGG pass over both branches: double the conv batch
        # (better MXU fill at this model's 64-ch early layers) and half the
        # kernel count
        n_stack = x.shape[0]
        feats = vgg_mod.vgg16_features(
            jnp.concatenate([x, y], axis=0), vgg_params, feature_layers,
            dtype=dtype,
        )
        fx = [f[:n_stack] for f in feats]
        fy = [f[n_stack:] for f in feats]
    else:
        fx = vgg_mod.vgg16_features(
            jax.lax.stop_gradient(x), vgg_params, feature_layers, dtype=dtype
        )
        fy = vgg_mod.vgg16_features(y, vgg_params, feature_layers, dtype=dtype)
    wn = jnp.maximum(w.sum(), 1.0)
    for a, b in zip(fx, fy):
        # per-sample MSE -> weighted batch mean (== torch global MSE when
        # weights are uniform)
        per_sample = jnp.mean((a - b) ** 2, axis=(1, 2, 3))  # (n_rep*B,)
        per_sample = per_sample.reshape(n_rep, -1).mean(axis=0)  # (B,)
        loss = loss + (per_sample * w).sum() / wn / layer_num
    return loss


def make_perception_fn(
    vgg_params: Dict,
    feature_layer: int = 1,
    per_band: bool = False,
) -> Callable:
    """Configured perception callable (PerceptionLoss-module equivalent)."""
    layers = vgg_mod.select_feature_layers(feature_layer)
    return functools.partial(
        perception_loss, vgg_params=vgg_params, feature_layers=layers, per_band=per_band
    )


# ---------------------------------------------------------------------------
# Masked reconstruction losses
# ---------------------------------------------------------------------------


def _masked_recon_terms(
    target: jnp.ndarray,
    generated: jnp.ndarray,
    cmap: jnp.ndarray,
    kind: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared core: per-sample rescaled reconstruction on masked images.

    Returns (per_sample_loss, num_wnc, target_mask, generate_mask).
    """
    num_pixel = target.shape[1] * target.shape[2]
    num_wnc = jnp.sum(1.0 - cmap, axis=(1, 2, 3))  # (B,)
    tm = _mask_image(target, cmap)
    gm = _mask_image(generated, cmap)
    diff = tm - gm
    if kind == "l1":
        per = jnp.mean(jnp.abs(diff), axis=(1, 2, 3))
    else:
        per = jnp.mean(diff**2, axis=(1, 2, 3))
    safe_wnc = jnp.where(num_wnc > 0, num_wnc, 1.0)
    per = per * num_pixel / safe_wnc
    return per, num_wnc, tm, gm


def cnet_loss(
    target: jnp.ndarray,
    generated: jnp.ndarray,
    cmap: jnp.ndarray,
    vgg_params: Dict,
    feature_layers: Sequence[int] = (29,),
    perception_per_band: bool = True,
    generator_mask_switch: bool = False,
    msssim_weights: Optional[Sequence[float]] = None,
    sample_weight: Optional[jnp.ndarray] = None,
    ssim_grad: bool = True,
    perception_dtype=None,
    perception_target_grad: bool = True,
    compute_ssim: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """USSS loss tuple (generator, l1, perception, ssim) (parity: Loss.py:64-95).

    generator: per-sample L1 on (1-cmap)-masked images, rescaled by
    num_pixel/num_wnc, batch-averaged. l1: mean |cmap| sparsity. perception on
    the hard cmask when ``generator_mask_switch`` else the soft cmap. ssim:
    1 - MS-SSIM of the masked images.
    """
    w = _weights(target, sample_weight)
    wn = jnp.maximum(w.sum(), 1.0)

    per, _, tm, gm = _masked_recon_terms(target, generated, cmap, "l1")
    generator_loss = (per * w).sum() / wn

    l1_per = jnp.mean(jnp.abs(cmap), axis=(1, 2, 3))
    l1_loss = (l1_per * w).sum() / wn

    pmask = hard_mask(cmap) if generator_mask_switch else cmap
    p_loss = perception_loss(
        target, generated, pmask, vgg_params, feature_layers,
        per_band=perception_per_band, sample_weight=sample_weight,
        dtype=perception_dtype, target_grad=perception_target_grad,
    )

    # when the driver weights SSIM at 0 (all reference demos do,
    # Demo_USSS.py:42) the value is still reported but its backward pass is
    # cut — XLA cannot fold 0*grad because of NaN semantics. compute_ssim=
    # False (driver --ssim-metric false, only legal at weight 0) skips the
    # forward too and reports 0.
    if not compute_ssim:
        return generator_loss, l1_loss, p_loss, jnp.zeros((), jnp.float32)
    if not ssim_grad:
        tm, gm = jax.lax.stop_gradient(tm), jax.lax.stop_gradient(gm)
    ssim_per = ssim_mod.ms_ssim(
        tm, gm, data_range=1.0, size_average=False, weights=msssim_weights
    )
    ssim_loss = 1.0 - (ssim_per * w).sum() / wn
    return generator_loss, l1_loss, p_loss, ssim_loss


def cgenerator_loss(
    target: jnp.ndarray,
    generated: jnp.ndarray,
    cmap: jnp.ndarray,
    vgg_params: Dict,
    feature_layers: Sequence[int] = (29,),
    perception_per_band: bool = False,
    msssim_weights: Optional[Sequence[float]] = None,
    sample_weight: Optional[jnp.ndarray] = None,
    ssim_grad: bool = True,
    perception_dtype=None,
    perception_target_grad: bool = True,
    compute_ssim: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """WSSS/RSSS loss tuple (generator, ssim, perception) (parity: Loss.py:100-124).

    Same structure as :func:`cnet_loss` but MSE reconstruction, and samples
    whose mask covers everything (num_wnc == 0) are skipped while the batch
    denominator stays the full (weighted) batch size (Loss.py:116-119).
    """
    w = _weights(target, sample_weight)
    wn = jnp.maximum(w.sum(), 1.0)

    per, num_wnc, tm, gm = _masked_recon_terms(target, generated, cmap, "mse")
    keep = (num_wnc > 0).astype(per.dtype)
    generator_loss = (per * keep * w).sum() / wn

    if not compute_ssim:
        ssim_loss = jnp.zeros((), jnp.float32)
    else:
        if not ssim_grad:
            tm, gm = jax.lax.stop_gradient(tm), jax.lax.stop_gradient(gm)
        ssim_per = ssim_mod.ms_ssim(
            tm, gm, data_range=1.0, size_average=False, weights=msssim_weights
        )
        ssim_loss = 1.0 - (ssim_per * w).sum() / wn

    p_loss = perception_loss(
        target, generated, cmap, vgg_params, feature_layers,
        per_band=perception_per_band, sample_weight=sample_weight,
        dtype=perception_dtype, target_grad=perception_target_grad,
    )
    return generator_loss, ssim_loss, p_loss


def region_loss(
    cmap: jnp.ndarray,
    region: jnp.ndarray,
    kind: str = "l1",
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked criterion vs zeros, rescaled by region size (parity: Loss.py:127-141).

    ``criterion(cmap * region, 0) * num_pixel / num_region`` per sample,
    batch-averaged, skipping empty regions.
    """
    w = _weights(cmap, sample_weight)
    wn = jnp.maximum(w.sum(), 1.0)
    num_pixel = cmap.shape[1] * cmap.shape[2]
    num_region = jnp.sum(region, axis=(1, 2, 3))
    masked = cmap * region
    if kind == "l1":
        per = jnp.mean(jnp.abs(masked), axis=(1, 2, 3))
    else:
        per = jnp.mean(masked**2, axis=(1, 2, 3))
    safe = jnp.where(num_region > 0, num_region, 1.0)
    per = per * num_pixel / safe
    keep = (num_region > 0).astype(per.dtype)
    return (per * keep * w).sum() / wn
