"""Jitted train/eval steps for the three supervision modes.

Each mode's per-batch logic from the reference drivers becomes one pure jitted
function (losses, both optimizer updates, BatchNorm stat threading, and
on-device confusion-matrix accumulation — no host sync inside the epoch):

  * USSS   — Demo_USSS.py phases 1-3 (:124-400) + inference (:404-473)
  * WSSS   — Demo_WSSS.py G-pretrain (:140-204) and adversarial D/S (:208-385)
  * RSSS   — Demo_RSSS.py G-pretrain (:173-238) and adversarial D/S (:244-447)

Gradient-flow parity notes:
  * USSS joint phase (Demo_USSS.py:310-341): optimizerG.zero_grad() precedes
    both backwards, optimizerS.zero_grad() sits between them, so
    gradG = d(LossG + NetLoss)/dG and gradS = d(NetLoss)/dS. With
    LossG = A and NetLoss = A + l1_weight*l1 (where A = gen + pw*perc +
    sw*ssim and l1 has no G dependence), one jax.vjp with cotangent
    (1, l1_weight) yields dA/dG and gradS; gradG = 2*dA/dG. One forward, one
    backward — half the reference's backward cost.
  * WSSS/RSSS D update treats the segmentor output as data
    (stop-gradient), matching backward(d_loss) touching only D; the S update
    re-evaluates the discriminator with the *updated* D params
    (Demo_WSSS.py:302, Demo_RSSS.py:317) with gradients flowing through the
    masked images into S but not into D's params.
  * BatchNorm running stats update on every train-mode forward exactly as
    torch does, including nets that are forwarded but not stepped (the frozen
    generator in USSS phase 2) and the reference's eval()-frozen generator in
    WSSS/RSSS adversarial phases (netG.eval(), Demo_WSSS.py:206).

Data parallelism: steps are sharding-agnostic. Feed batches placed with
``parallel.mesh.shard_batch`` and replicated states; GSPMD inserts gradient
all-reduces and computes global-batch BN statistics (sync-BN) automatically.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.evaluator import confusion_update
from ..ops import losses as L
from .optim import apply_updates
from .state import NetState


@dataclasses.dataclass(frozen=True)
class PerceptionConfig:
    feature_layers: Tuple[int, ...]
    per_band: bool
    dtype: Optional[str] = None  # 'bfloat16' under mixed precision


def interior_valid_mask(
    item: jnp.ndarray,
    interior_sizes: jnp.ndarray,
    canvas_hw: Tuple[int, int],
    pad: Tuple[int, int],
) -> jnp.ndarray:
    """(B, H, W) {0,1} mask of each tile's stitched interior, on device.

    Replaces the reference's per-sample host slicing (Demo_USSS.py:238-248)
    with broadcasted-iota masks from the per-item core sizes."""
    h, w = canvas_hw
    padx, pady = pad
    sizes = interior_sizes[item]  # (B, 2) = (core_h, core_w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
    ch = sizes[:, 0][:, None, None]
    cw = sizes[:, 1][:, None, None]
    return (
        (rows >= pady) & (rows < pady + ch) & (cols >= padx) & (cols < padx + cw)
    ).astype(jnp.float32)


def _threshold(cmap: jnp.ndarray, prob_thresh: float) -> jnp.ndarray:
    """cmask[cmap > thresh] = 1 (strictly greater, Demo_USSS.py:430-431)."""
    return (cmap > prob_thresh).astype(jnp.float32)


def _wmean(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted batch mean over per-sample values (padded samples weight 0)."""
    return (x * w).sum() / jnp.maximum(w.sum(), 1.0)


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    """Model outputs come back in the compute dtype (bf16 under mixed
    precision); losses/metrics always run in f32."""
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# USSS — unsupervised (Demo_USSS.py)
# ---------------------------------------------------------------------------


class USSSSteps:
    """Step factory for the unsupervised mode.

    ``interior_sizes``: (n_tiles, 2) core sizes from TileGrid.interior_sizes()
    — item indices select their interior masks on device."""

    def __init__(
        self,
        generator,
        segmentor,
        tx_g,
        tx_s,
        vgg_params: Dict,
        perception: PerceptionConfig,
        perception_weight: float,
        l1_weight: float,
        ssim_weight: float,
        interior_sizes: np.ndarray,
        pad: Tuple[int, int],
        gt_map: Sequence[int] = (1, 2),
        pre_map: Sequence[int] = (0, 1),
        prob_thresh: float = 0.5,
        msssim_weights: Optional[Sequence[float]] = None,
        remat: bool = False,
        ssim_metric: bool = True,
    ):
        if not ssim_metric and ssim_weight != 0:
            raise ValueError("ssim_metric=False requires ssim_weight == 0")
        self.ssim_metric = ssim_metric
        self.G, self.S = generator, segmentor
        self.tx_g, self.tx_s = tx_g, tx_s
        self.vgg = vgg_params
        self.pc = perception
        self.pw, self.l1w, self.sw = perception_weight, l1_weight, ssim_weight
        self.interior = jnp.asarray(interior_sizes, jnp.int32)
        self.pad = pad
        self.gt_map, self.pre_map = tuple(gt_map), tuple(pre_map)
        self.prob_thresh = prob_thresh
        self.msw = tuple(msssim_weights) if msssim_weights is not None else None

        # gradient rematerialization: recompute the big forwards (both nets +
        # the VGG loss stack) in the backward instead of storing activations —
        # identical math, ~full-forward extra FLOPs, lifts the per-chip batch
        # HBM ceiling (bs80 at 220px OOMs one v5e without it; bench.py
        # --batch-sweep). Enable with remat=True / --remat / FCDGAN_REMAT=1.
        ck = jax.checkpoint if remat else (lambda f: f)
        self._g_fwd = ck(lambda pg, bs_, x: self.G.apply(
            {"params": pg, "batch_stats": bs_}, x, train=True,
            mutable=["batch_stats"]))
        self._s_fwd = ck(lambda ps, bs_, x, y: self.S.apply(
            {"params": ps, "batch_stats": bs_}, x, y, train=True,
            mutable=["batch_stats"]))
        self._cnet_ck = ck(self._cnet)
        # G-pretrain variant: cmap/target are data there, so the perception
        # target branch is gradient-dead and runs forward-only (losses.py
        # perception_loss target_grad=False) — ~half the VGG backward cut
        self._cnet_ck_pre = ck(functools.partial(self._cnet, target_grad=False))

        # donated states: the caller rebinds on every step, so the old
        # buffers feed the outputs in place (no HBM churn; no-op on CPU)
        self.g_pretrain = jax.jit(self._g_pretrain, donate_argnums=(0,))
        self.s_init = jax.jit(self._s_init, donate_argnums=(0, 1))
        self.joint = jax.jit(self._joint, donate_argnums=(0, 1))
        self.infer = jax.jit(self._infer)

    def _cnet(self, y, y_fake, cmap, w, target_grad=True):
        return L.cnet_loss(
            y, y_fake, cmap, self.vgg, self.pc.feature_layers,
            perception_per_band=self.pc.per_band, msssim_weights=self.msw,
            sample_weight=w, ssim_grad=self.sw != 0,
            perception_dtype=jnp.bfloat16 if self.pc.dtype == "bfloat16" else None,
            perception_target_grad=target_grad,
            compute_ssim=self.ssim_metric,
        )

    def _confusion(self, cmap, ref, item, w):
        cmask = _threshold(cmap[..., 0], self.prob_thresh)
        valid = interior_valid_mask(item, self.interior, cmap.shape[1:3], self.pad)
        valid = valid * w[:, None, None]
        return confusion_update(ref[..., 0], cmask, self.gt_map, self.pre_map, valid)

    # -- phase 1: generator pretrain (Demo_USSS.py:124-189) -----------------
    def _g_pretrain(self, gstate: NetState, x, y, w, lr):
        cmap = jnp.zeros(x.shape[:3] + (1,), x.dtype)

        def loss_fn(pg):
            y_fake, muts = self._g_fwd(pg, gstate.batch_stats, x)
            gen, l1, perc, ssim = self._cnet_ck_pre(y, _f32(y_fake), cmap, w)
            loss = gen + self.pw * perc + self.sw * ssim
            return loss, (muts["batch_stats"], gen, l1, perc, ssim)

        (loss, (g_bs, gen, l1, perc, ssim)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(gstate.params)
        params, opt = apply_updates(gstate.params, gstate.opt_state, grads, self.tx_g, lr)
        gstate = NetState(params=params, batch_stats=g_bs, opt_state=opt)
        metrics = {"NetLoss": loss, "generator_loss": gen, "l1_loss": l1,
                   "perception_loss": perc, "ssim_loss": ssim}
        return gstate, metrics

    # -- phase 2: segmentor init, G forwarded but not stepped (:192-286) ----
    def _s_init(self, gstate: NetState, sstate: NetState, x, y, ref, item, w, lr):
        # train-mode G forward updates its BN running stats (torch parity)
        y_fake, g_muts = self.G.apply(
            gstate.variables, x, train=True, mutable=["batch_stats"]
        )
        y_fake = jax.lax.stop_gradient(_f32(y_fake))

        def loss_fn(ps):
            cmap, muts = self._s_fwd(ps, sstate.batch_stats, x, y)
            cmap = _f32(cmap)
            gen, l1, perc, ssim = self._cnet_ck(y, y_fake, cmap, w)
            loss = gen + self.l1w * l1 + self.pw * perc + self.sw * ssim
            return loss, (muts["batch_stats"], gen, l1, perc, ssim, cmap)

        (loss, (s_bs, gen, l1, perc, ssim, cmap)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(sstate.params)
        params, opt = apply_updates(sstate.params, sstate.opt_state, grads, self.tx_s, lr)
        sstate = NetState(params=params, batch_stats=s_bs, opt_state=opt)
        gstate = dataclasses.replace(gstate, batch_stats=g_muts["batch_stats"])
        cm = self._confusion(cmap, ref, item, w)
        metrics = {"NetLoss": loss, "generator_loss": gen, "l1_loss": l1,
                   "perception_loss": perc, "ssim_loss": ssim, "confusion": cm}
        return gstate, sstate, metrics

    # -- phase 3: joint alternating with G-grad accumulation (:289-400) -----
    def _joint(self, gstate: NetState, sstate: NetState, x, y, ref, item, w, lr_g, lr_s):
        def fwd(pg, ps):
            y_fake, g_muts = self._g_fwd(pg, gstate.batch_stats, x)
            cmap, s_muts = self._s_fwd(ps, sstate.batch_stats, x, y)
            y_fake, cmap = _f32(y_fake), _f32(cmap)
            gen, l1, perc, ssim = self._cnet_ck(y, y_fake, cmap, w)
            a = gen + self.pw * perc + self.sw * ssim  # == LossG
            aux = (g_muts["batch_stats"], s_muts["batch_stats"], gen, l1, perc, ssim, cmap)
            return (a, l1), aux

        (a, l1), vjp_fn, aux = jax.vjp(fwd, gstate.params, sstate.params, has_aux=True)
        g_bs, s_bs, gen, l1_v, perc, ssim, cmap = aux
        one = jnp.ones((), a.dtype)
        d_pg, d_ps = vjp_fn((one, one * self.l1w))
        grads_g = jax.tree.map(lambda t: 2.0 * t, d_pg)  # dLossG/dG + dNetLoss/dG
        grads_s = d_ps  # dNetLoss/dS

        pg, opt_g = apply_updates(gstate.params, gstate.opt_state, grads_g, self.tx_g, lr_g)
        ps, opt_s = apply_updates(sstate.params, sstate.opt_state, grads_s, self.tx_s, lr_s)
        gstate = NetState(params=pg, batch_stats=g_bs, opt_state=opt_g)
        sstate = NetState(params=ps, batch_stats=s_bs, opt_state=opt_s)

        net_loss = a + self.l1w * l1
        cm = self._confusion(cmap, ref, item, w)
        metrics = {"NetLoss": net_loss, "generator_loss": gen, "l1_loss": l1_v,
                   "perception_loss": perc, "ssim_loss": ssim, "confusion": cm}
        return gstate, sstate, metrics

    # -- inference (:404-473) -------------------------------------------------
    def _infer(self, sstate: NetState, x, y):
        return _f32(self.S.apply(sstate.variables, x, y, train=False))


# ---------------------------------------------------------------------------
# WSSS — weakly supervised adversarial (Demo_WSSS.py)
# ---------------------------------------------------------------------------


class WSSSSteps:
    def __init__(
        self,
        generator,
        segmentor,
        discriminator,
        tx_g,
        tx_s,
        tx_d,
        vgg_params: Dict,
        perception: PerceptionConfig,
        perception_weight: float,
        ssim_weight: float,
        g_weight: float,
        l1_weight: float,
        d_weight: float,
        nc_weight: float,
        prob_thresh: float = 0.6,
        discriminator_continuous: bool = True,
        msssim_weights: Optional[Sequence[float]] = None,
        remat: bool = False,
        ssim_metric: bool = True,
    ):
        if not ssim_metric and ssim_weight != 0:
            raise ValueError("ssim_metric=False requires ssim_weight == 0")
        self.ssim_metric = ssim_metric
        self.G, self.S, self.D = generator, segmentor, discriminator
        self.tx_g, self.tx_s, self.tx_d = tx_g, tx_s, tx_d
        self.vgg = vgg_params
        self.pc = perception
        self.pw, self.sw = perception_weight, ssim_weight
        self.gw, self.l1w, self.dw, self.ncw = g_weight, l1_weight, d_weight, nc_weight
        self.prob_thresh = prob_thresh
        self.continuous = discriminator_continuous
        self.msw = tuple(msssim_weights) if msssim_weights is not None else None
        # see USSSSteps.__init__: recompute-in-backward for the big forwards
        ck = jax.checkpoint if remat else (lambda f: f)
        self._g_fwd = ck(lambda pg, bs_, x: self.G.apply(
            {"params": pg, "batch_stats": bs_}, x, train=True,
            mutable=["batch_stats"]))
        self._cgen_ck = ck(self._cgen)
        # G-pretrain: cmap is data (zeros / region raster) -> perception
        # target branch gradient-dead, run forward-only (losses.py)
        self._cgen_ck_pre = ck(functools.partial(self._cgen, target_grad=False))

        self.g_pretrain = jax.jit(self._g_pretrain, donate_argnums=(0,))
        self.adversarial = jax.jit(self._adversarial, donate_argnums=(0, 1))
        self.infer = jax.jit(self._infer)
        self.infer_train_mode = jax.jit(self._infer_train_mode)

    def _cgen(self, y, y_fake, cmap, w, target_grad=True):
        return L.cgenerator_loss(
            y, y_fake, cmap, self.vgg, self.pc.feature_layers,
            perception_per_band=self.pc.per_band, msssim_weights=self.msw,
            sample_weight=w, ssim_grad=self.sw != 0,
            perception_dtype=jnp.bfloat16 if self.pc.dtype == "bfloat16" else None,
            perception_target_grad=target_grad,
            compute_ssim=self.ssim_metric,
        )

    # -- G pretrain on unchanged pairs, cmap = 0 (Demo_WSSS.py:140-204) -----
    def _g_pretrain(self, gstate: NetState, x, y, w, lr):
        cmap = jnp.zeros(x.shape[:3] + (1,), x.dtype)

        def loss_fn(pg):
            y_fake, muts = self._g_fwd(pg, gstate.batch_stats, x)
            gen, ssim, perc = self._cgen_ck_pre(y, _f32(y_fake), cmap, w)
            loss = gen + self.pw * perc + self.sw * ssim
            return loss, (muts["batch_stats"], gen, ssim, perc)

        (loss, (g_bs, gen, ssim, perc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(gstate.params)
        params, opt = apply_updates(gstate.params, gstate.opt_state, grads, self.tx_g, lr)
        gstate = NetState(params=params, batch_stats=g_bs, opt_state=opt)
        metrics = {"g_loss": loss, "generator_loss": gen,
                   "perception_loss": perc, "ssim_loss": ssim}
        return gstate, metrics

    def _mask_pair(self, x, y, cmask):
        return x * (1 - cmask), y * (1 - cmask)

    # -- adversarial D-then-S step (Demo_WSSS.py:235-343) -------------------
    def _adversarial(self, sstate: NetState, dstate: NetState, gstate: NetState,
                     c_x, c_y, c_ref, nc_x, nc_y, w, lr_s, lr_d):
        # ONE pair of segmentor forwards, captured with jax.vjp so the S
        # update can backprop through them without recomputing — the JAX
        # equivalent of torch's retained graph (Demo_WSSS.py:256,273 computed
        # once and reused by both the D and S objectives)
        def s_fwd(ps):
            cmap_, m1 = self.S.apply(
                {"params": ps, "batch_stats": sstate.batch_stats},
                c_x, c_y, train=True, mutable=["batch_stats"],
            )
            ncmap_, m2 = self.S.apply(
                {"params": ps, "batch_stats": m1["batch_stats"]},
                nc_x, nc_y, train=True, mutable=["batch_stats"],
            )
            return (_f32(cmap_), _f32(ncmap_)), m2["batch_stats"]

        (cmap, ncmap), s_vjp, s_bs2 = jax.vjp(s_fwd, sstate.params, has_aux=True)

        cmask_sg = jax.lax.stop_gradient(
            cmap if self.continuous else L.hard_mask(cmap)
        )
        xm_sg, ym_sg = self._mask_pair(c_x, c_y, cmask_sg)
        # the unchanged pair is masked by the CHANGED pair's mask — documented
        # as intentional for convergence (Demo_WSSS.py:275-281)
        xm_nc_sg, ym_nc_sg = self._mask_pair(nc_x, nc_y, cmask_sg)

        # --- D update (cmap is data; grads only into D) ---------------------
        def d_loss_fn(pd):
            c_out, muts = self.D.apply(
                {"params": pd, "batch_stats": dstate.batch_stats},
                xm_sg, ym_sg, train=True, mutable=["batch_stats"],
            )
            nc_out, muts = self.D.apply(
                {"params": pd, "batch_stats": muts["batch_stats"]},
                xm_nc_sg, ym_nc_sg, train=True, mutable=["batch_stats"],
            )
            d_loss = 1.0 + _wmean(_f32(nc_out), w) - _wmean(_f32(c_out), w)
            return d_loss, muts["batch_stats"]

        (d_loss, d_bs2), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            dstate.params
        )
        pd, opt_d = apply_updates(dstate.params, dstate.opt_state, d_grads, self.tx_d, lr_d)

        # --- frozen-G branch (eval mode: netG.eval(), Demo_WSSS.py:206) -----
        if self.gw != 0:
            y_fake = self.G.apply(gstate.variables, c_x, train=False)
            y_fake = jax.lax.stop_gradient(_f32(y_fake))
        else:
            y_fake = None

        # --- S update against the UPDATED discriminator (:302) --------------
        # the loss is differentiated w.r.t. the S OUTPUTS (cmap, ncmap) and
        # chained through the captured s_vjp — no segmentor recompute
        def s_loss_fn(cmap_s, ncmap_s):
            cmask = cmap_s if self.continuous else L.hard_mask(cmap_s)
            xm, ym = self._mask_pair(c_x, c_y, cmask)
            c_out, muts = self.D.apply(
                {"params": jax.lax.stop_gradient(pd), "batch_stats": d_bs2},
                xm, ym, train=True, mutable=["batch_stats"],
            )
            c_out = _f32(c_out)
            nc_loss = _wmean(jnp.mean(ncmap_s**2, axis=(1, 2, 3)), w)
            if y_fake is not None:
                gen, ssim, perc = self._cgen_ck(c_y, y_fake, cmap_s, w)
            else:
                gen = ssim = perc = jnp.zeros((), c_x.dtype)
            g_loss = gen + self.pw * perc + self.sw * ssim
            l1_loss = _wmean(jnp.mean(jnp.abs(cmap_s), axis=(1, 2, 3)), w)
            s_d_loss = _wmean(c_out, w)
            s_loss = (self.dw * s_d_loss + self.l1w * l1_loss
                      + self.gw * g_loss + self.ncw * nc_loss)
            aux = (muts["batch_stats"], s_d_loss, l1_loss, nc_loss, g_loss,
                   gen, ssim, perc)
            return s_loss, aux

        (s_loss, aux), map_grads = jax.value_and_grad(
            s_loss_fn, argnums=(0, 1), has_aux=True
        )(cmap, ncmap)
        d_bs3, s_d_loss, l1_loss, nc_loss, g_loss, gen, ssim, perc = aux
        (s_grads,) = s_vjp(map_grads)
        cmap_out = cmap
        ps, opt_s = apply_updates(sstate.params, sstate.opt_state, s_grads, self.tx_s, lr_s)

        sstate = NetState(params=ps, batch_stats=s_bs2, opt_state=opt_s)
        dstate = NetState(params=pd, batch_stats=d_bs3, opt_state=opt_d)

        # in-training eval on the changed pair, full patch (Demo_WSSS.py:337-343)
        cmask_t = _threshold(cmap_out[..., 0], self.prob_thresh)
        valid = jnp.broadcast_to(w[:, None, None], cmask_t.shape)
        cm = confusion_update(c_ref[..., 0], cmask_t, (0, 1), (0, 1), valid)

        metrics = {"d_loss": d_loss, "s_loss": s_loss, "s_d_loss": s_d_loss,
                   "l1_loss": l1_loss, "nc_loss": nc_loss, "g_loss": g_loss,
                   "generator_loss": gen, "ssim_loss": ssim,
                   "perception_loss": perc, "confusion": cm}
        return sstate, dstate, metrics

    def _infer(self, sstate: NetState, x, y):
        return _f32(self.S.apply(sstate.variables, x, y, train=False))

    def _infer_train_mode(self, sstate: NetState, x, y):
        """Final WSSS inference intentionally keeps train-mode BN ("train mode
        gets better performance", Demo_WSSS.py:389-391). torch updates BN
        running statistics on train-mode forwards even under no_grad, and the
        reference saves SModel afterwards — so the mutated stats are returned
        for the driver to thread through."""
        out, muts = self.S.apply(sstate.variables, x, y, train=True,
                                 mutable=["batch_stats"])
        return _f32(out), dataclasses.replace(sstate, batch_stats=muts["batch_stats"])


# ---------------------------------------------------------------------------
# RSSS — regional supervised adversarial (Demo_RSSS.py)
# ---------------------------------------------------------------------------


class RSSSSteps:
    def __init__(
        self,
        generator,
        segmentor,
        discriminator,
        tx_g,
        tx_s,
        tx_d,
        vgg_params: Dict,
        perception: PerceptionConfig,
        perception_weight: float,
        ssim_weight: float,
        g_weight: float,
        l1_weight: float,
        d_weight: float,
        r_weight: float,
        interior_sizes: np.ndarray,
        pad: Tuple[int, int],
        gt_map: Sequence[int] = (1, 2),
        pre_map: Sequence[int] = (0, 1),
        prob_thresh: float = 0.5,
        discriminator_continuous: bool = True,
        msssim_weights: Optional[Sequence[float]] = None,
        test_interior_sizes: Optional[np.ndarray] = None,
        remat: bool = False,
        ssim_metric: bool = True,
    ):
        if not ssim_metric and ssim_weight != 0:
            raise ValueError("ssim_metric=False requires ssim_weight == 0")
        self.ssim_metric = ssim_metric
        self.G, self.S, self.D = generator, segmentor, discriminator
        self.tx_g, self.tx_s, self.tx_d = tx_g, tx_s, tx_d
        self.vgg = vgg_params
        self.pc = perception
        self.pw, self.sw = perception_weight, ssim_weight
        self.gw, self.l1w, self.dw, self.rw = g_weight, l1_weight, d_weight, r_weight
        # see USSSSteps.__init__: recompute-in-backward for the big forwards
        ck = jax.checkpoint if remat else (lambda f: f)
        self._g_fwd = ck(lambda pg, bs_, x_: self.G.apply(
            {"params": pg, "batch_stats": bs_}, x_, train=True,
            mutable=["batch_stats"]))
        self._cgen_ck = ck(self._cgen)
        # G-pretrain variant: mask is the region raster (data), so the
        # perception target branch is gradient-dead (see losses.perception_loss)
        self._cgen_ck_pre = ck(functools.partial(self._cgen, target_grad=False))
        self.interior = jnp.asarray(interior_sizes, jnp.int32)
        self.test_interior = (
            jnp.asarray(test_interior_sizes, jnp.int32)
            if test_interior_sizes is not None else self.interior
        )
        self.pad = pad
        self.gt_map, self.pre_map = tuple(gt_map), tuple(pre_map)
        self.prob_thresh = prob_thresh
        self.continuous = discriminator_continuous
        self.msw = tuple(msssim_weights) if msssim_weights is not None else None

        self.g_pretrain = jax.jit(self._g_pretrain, donate_argnums=(0,))
        self.adversarial = jax.jit(self._adversarial, donate_argnums=(0, 1))
        self.infer = jax.jit(self._infer)
        self.eval_confusion = jax.jit(self._eval_confusion)
        self.eval_confusion_train = jax.jit(self._eval_confusion_train,
                                            donate_argnums=(0,))

    def _cgen(self, y, y_fake, cmap, w, target_grad=True):
        return L.cgenerator_loss(
            y, y_fake, cmap, self.vgg, self.pc.feature_layers,
            perception_per_band=self.pc.per_band, msssim_weights=self.msw,
            sample_weight=w, ssim_grad=self.sw != 0,
            perception_dtype=jnp.bfloat16 if self.pc.dtype == "bfloat16" else None,
            perception_target_grad=target_grad,
            compute_ssim=self.ssim_metric,
        )

    # -- G pretrain with the REGION raster as mask (Demo_RSSS.py:200-205) ---
    def _g_pretrain(self, gstate: NetState, x, y, region, w, lr):
        def loss_fn(pg):
            y_fake, muts = self._g_fwd(pg, gstate.batch_stats, x)
            gen, ssim, perc = self._cgen_ck_pre(y, _f32(y_fake), region, w)
            loss = gen + self.pw * perc + self.sw * ssim
            return loss, (muts["batch_stats"], gen, ssim, perc)

        (loss, (g_bs, gen, ssim, perc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(gstate.params)
        params, opt = apply_updates(gstate.params, gstate.opt_state, grads, self.tx_g, lr)
        gstate = NetState(params=params, batch_stats=g_bs, opt_state=opt)
        metrics = {"g_loss": loss, "generator_loss": gen,
                   "perception_loss": perc, "ssim_loss": ssim}
        return gstate, metrics

    # -- adversarial step with synthesized unchanged pair (:266-354) --------
    def _adversarial(self, sstate: NetState, dstate: NetState, gstate: NetState,
                     x, y, ref, region, item, w, lr_s, lr_d):
        # one segmentor forward captured with jax.vjp and reused by both the
        # D and S objectives (torch retained-graph pattern, Demo_RSSS.py:285)
        def s_fwd(ps):
            cmap_, muts = self.S.apply(
                {"params": ps, "batch_stats": sstate.batch_stats},
                x, y, train=True, mutable=["batch_stats"],
            )
            return _f32(cmap_), muts["batch_stats"]

        cmap, s_vjp, s_bs = jax.vjp(s_fwd, sstate.params, has_aux=True)

        cmask_sg = jax.lax.stop_gradient(
            cmap if self.continuous else L.hard_mask(cmap)
        )
        xm_sg = x * (1 - cmask_sg)
        ym_sg = y * (1 - cmask_sg)
        # fake unchanged pair synthesized from the region label: inside
        # regions copy x over y (Demo_RSSS.py:296-301)
        y_unc = y * (1 - region) + x * region
        x_unc_sg = x * (1 - cmask_sg)
        y_unc_sg = y_unc * (1 - cmask_sg)

        def d_loss_fn(pd):
            c_out, muts = self.D.apply(
                {"params": pd, "batch_stats": dstate.batch_stats},
                xm_sg, ym_sg, train=True, mutable=["batch_stats"],
            )
            nc_out, muts = self.D.apply(
                {"params": pd, "batch_stats": muts["batch_stats"]},
                x_unc_sg, y_unc_sg, train=True, mutable=["batch_stats"],
            )
            d_loss = 1.0 + _wmean(_f32(nc_out), w) - _wmean(_f32(c_out), w)
            return d_loss, muts["batch_stats"]

        (d_loss, d_bs2), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            dstate.params
        )
        pd, opt_d = apply_updates(dstate.params, dstate.opt_state, d_grads, self.tx_d, lr_d)

        # frozen generator, eval mode (netG.eval(), Demo_RSSS.py:240)
        y_fake = self.G.apply(gstate.variables, x, train=False)
        y_fake = jax.lax.stop_gradient(_f32(y_fake))

        def s_loss_fn(cmap_s):
            cmask = cmap_s if self.continuous else L.hard_mask(cmap_s)
            xm = x * (1 - cmask)
            ym = y * (1 - cmask)
            c_out, muts = self.D.apply(
                {"params": jax.lax.stop_gradient(pd), "batch_stats": d_bs2},
                xm, ym, train=True, mutable=["batch_stats"],
            )
            gen, ssim, perc = self._cgen_ck(y, y_fake, cmap_s, w)
            g_loss = gen + self.pw * perc + self.sw * ssim
            l1_loss = L.region_loss(cmap_s, region, "l1", sample_weight=w)
            r_loss = L.region_loss(cmap_s, 1 - region, "mse", sample_weight=w)
            s_d_loss = _wmean(_f32(c_out), w)
            s_loss = (self.dw * s_d_loss + self.l1w * l1_loss
                      + self.gw * g_loss + self.rw * r_loss)
            aux = (muts["batch_stats"], s_d_loss, l1_loss, r_loss, g_loss,
                   gen, ssim, perc)
            return s_loss, aux

        (s_loss, aux), g_cmap = jax.value_and_grad(s_loss_fn, has_aux=True)(cmap)
        d_bs3, s_d_loss, l1_loss, r_loss, g_loss, gen, ssim, perc = aux
        (s_grads,) = s_vjp(g_cmap)
        cmap_out = cmap
        ps, opt_s = apply_updates(sstate.params, sstate.opt_state, s_grads, self.tx_s, lr_s)

        sstate = NetState(params=ps, batch_stats=s_bs, opt_state=opt_s)
        dstate = NetState(params=pd, batch_stats=d_bs3, opt_state=opt_d)

        cm = self._confusion(cmap_out, ref, item, w, self.interior)
        metrics = {"d_loss": d_loss, "s_loss": s_loss, "s_d_loss": s_d_loss,
                   "l1_loss": l1_loss, "r_loss": r_loss, "g_loss": g_loss,
                   "generator_loss": gen, "ssim_loss": ssim,
                   "perception_loss": perc, "confusion": cm}
        return sstate, dstate, metrics

    def _confusion(self, cmap, ref, item, w, interior):
        cmask = _threshold(cmap[..., 0], self.prob_thresh)
        valid = interior_valid_mask(item, interior, cmap.shape[1:3], self.pad)
        valid = valid * w[:, None, None]
        return confusion_update(ref[..., 0], cmask, self.gt_map, self.pre_map, valid)

    def _infer(self, sstate: NetState, x, y):
        return _f32(self.S.apply(sstate.variables, x, y, train=False))

    def _eval_confusion(self, sstate: NetState, x, y, ref, item, w):
        """Per-epoch test eval over interiors (Demo_RSSS.py:399-447)."""
        cmap = _f32(self.S.apply(sstate.variables, x, y, train=False))
        return self._confusion(cmap, ref, item, w, self.test_interior), cmap

    def _eval_confusion_train(self, sstate: NetState, x, y, ref, item, w):
        """Reference-parity test eval: the reference never calls
        ``netS.eval()`` inside the adversarial loop, so its per-epoch test
        forward (Demo_RSSS.py:415) runs train-mode BN — batch statistics for
        the prediction AND the running stats absorb the test batches (which
        the eval-mode final inference then uses, Demo_RSSS.py:451)."""
        cmap, muts = self.S.apply(sstate.variables, x, y, train=True,
                                  mutable=["batch_stats"])
        cmap = _f32(cmap)
        sstate = sstate.replace(batch_stats=muts["batch_stats"])
        return self._confusion(cmap, ref, item, w, self.test_interior), sstate
