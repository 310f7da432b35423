"""Unsupervised change detection driver (reference: /root/reference/Demo_USSS.py).

End-to-end flow (call-stack parity with SURVEY.md section 3.1):
stats pass -> normalized tile dataset -> G pretrain (50 ep) -> S init (50 ep)
-> joint alternating (100 ep, G-gradient accumulation) -> stitched
change-density GeoTIFF + {TN,FN,FP,TP} color raster + final metrics ->
SModel/GModel checkpoints + Para txt.

TPU-native: fixed-shape prefetched batches, one jitted step per phase with
on-device interior-masked confusion accumulation, optional data-parallel mesh
(``config.n_devices``).

Run: ``python -m fcdgan_tpu.demos.demo_usss --dir /data --ext _run1``
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import USSSConfig, parse_cli
from ..data.datasets import ScenePairDataset
from ..data.normalize import Normalize
from ..data.pipeline import BatchLoader, prefetch
from ..data.raster import create_raster
from ..data.stats import dataset_meanstd
from ..eval.changemap import write_changemap_gdal
from ..eval.evaluator import Evaluator
from ..io.checkpoint import TrainCheckpointer, save_net
from ..io.records import ScalarWriter, timestamped_para_path, write_para_txt
from ..models import Generator, Segmentor
from ..models.vgg import load_vgg16_params, select_feature_layers
from ..parallel.mesh import make_mesh, pad_batch_to_multiple, replicate_state, shard_batch
from ..train import schedules
from ..train.loops import DeferredEpochEnd, EpochAverages, Progress, accuracy_line
from ..train.optim import adam
from ..utils.runtime import enable_compile_cache
from ..train.state import create_net_state
from ..train.steps import PerceptionConfig, USSSSteps


def run(cfg: USSSConfig) -> Dict:
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    from ..parallel.multihost import initialize_multihost, put_multihost

    multihost = initialize_multihost(  # before any backend use
        cfg.coordinator_address, cfg.num_processes, cfg.process_id)
    enable_compile_cache()
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    outdir = cfg.outdir or cfg.dir
    os.makedirs(outdir, exist_ok=True)
    img_x = os.path.join(cfg.dir, cfg.image_x_name)
    img_y = os.path.join(cfg.dir, cfg.image_y_name)
    ref_path = os.path.join(cfg.dir, cfg.ref_name)
    stem1, ext1 = os.path.splitext(cfg.image_x_name)
    stem2, _ = os.path.splitext(cfg.image_y_name)
    cmap_name = "{}{}".format(cfg.cmap_name, cfg.ext)
    out_path = os.path.join(outdir, cmap_name + ext1)
    out_color_path = os.path.join(outdir, "{}_acc_color{}".format(cmap_name, ext1))

    # -- stats pass + normalizer (Demo_USSS.py:88-95) -----------------------
    stats_ds = ScenePairDataset(img_x, img_y, patch_size=cfg.patch_size,
                                overlap_padding=(0, 0))
    sp1 = os.path.join(cfg.dir, "{}_{}.txt".format(stem1, cfg.stats_name))
    sp2 = os.path.join(cfg.dir, "{}_{}.txt".format(stem2, cfg.stats_name))
    mean_x, std_x, mean_y, std_y = dataset_meanstd(sp1, sp2, stats_ds)
    scaler = Normalize(mean_x, std_x, mean_y, std_y)

    dataset = ScenePairDataset(img_x, img_y, ref_path=ref_path, out_path=out_path,
                               enhance=scaler, patch_size=cfg.patch_size,
                               overlap_padding=cfg.overlap_padding)
    total = len(dataset)
    # native C++ threaded tile assembly when the toolchain is available;
    # identical batches through the Python path otherwise. device_normalize
    # ("auto"/"on"/"off"): ship RAW integral tiles and run the per-band
    # (v-mean)/std + pad masking on device — 2-4x fewer host->device bytes
    # (the measured driver bottleneck on remote links; parity <=1 ulp,
    # tests/test_native.py). auto = on whenever the native loader + an
    # integral raster dtype allow it (single-process only).
    mesh = make_mesh(cfg.n_devices) if (cfg.n_devices or multihost) else None

    # scene_cache ("auto"/"on"/"window"/"off"): HBM-resident raw scene +
    # on-device tile gather/normalize — each training batch uploads only
    # (item, weight) int32 pairs. Strictly dominates the per-step raw-tile
    # upload whenever the scene fits the HBM budget (data/device_cache.py;
    # single-process). Scenes PAST the budget get the rolling-window slab
    # feed (DeviceSceneWindowCache): same on-device gather from a resident
    # slab, background thread uploading the next slab during compute.
    # "window" forces the slab feed even when the whole scene would fit
    # (A/B and test hook).
    from ..data.device_cache import DeviceSceneCache, DeviceSceneWindowCache

    scene_cache = None
    if cfg.scene_cache != "off" and not multihost:
        if cfg.scene_cache != "window" and DeviceSceneCache.supports(dataset):
            scene_cache = DeviceSceneCache(dataset, scaler, mesh)
        elif DeviceSceneWindowCache.supports(dataset):
            scene_cache = DeviceSceneWindowCache(dataset, scaler, mesh)
    if cfg.scene_cache in ("on", "window") and scene_cache is None:
        raise RuntimeError(
            "--scene-cache {}: needs a single process, a Normalize enhance, "
            "no transforms, and the scene (or one tile-row slab) within "
            "FCDGAN_SCENE_CACHE_MAX_MB / FCDGAN_SCENE_WINDOW_MB".format(
                cfg.scene_cache))

    # tail batches: reference torch semantics run the true short tail
    # (config.py `tail`); mesh/multi-host keep the fixed padded shape
    tail = ("short" if cfg.tail == "short"
            or (cfg.tail == "auto" and mesh is None and not multihost)
            else "pad")

    loader = None
    device_norm = False
    if scene_cache is not None:
        loader = scene_cache.loader(cfg.batch_size, dataset,
                                    shuffle=True, seed=cfg.seed, tail=tail)
    else:
        try:
            from ..data.pipeline import NativeSceneBatchLoader

            want_raw = (cfg.device_normalize != "off" and not multihost
                        and NativeSceneBatchLoader.supports_device_normalize(dataset))
            loader = NativeSceneBatchLoader(dataset, cfg.batch_size,
                                            shuffle=True, seed=cfg.seed,
                                            device_normalize=want_raw)
            device_norm = want_raw
        except Exception:
            if cfg.device_normalize == "on":
                raise
            loader = BatchLoader(dataset, cfg.batch_size,
                                 fields=("x", "y", "item", "ref"),
                                 shuffle=True, seed=cfg.seed, tail=tail)
        if cfg.device_normalize == "on" and not device_norm:
            raise RuntimeError(
                "--device-normalize on: needs the native loader and a shared "
                "integral raster dtype (and a single process)")

    placer = None
    if device_norm:
        from ..data.pipeline import DeviceNormalizer

        placer = DeviceNormalizer(scaler, dataset.size()[2])

    def put(batch):
        if scene_cache is not None:
            return scene_cache.complete(batch)
        if mesh is not None:
            db = put_multihost(batch, mesh)  # single-process: plain DP path
        else:
            db = shard_batch(batch, mesh)
        return placer(db) if placer is not None else db

    # -- models / steps (Demo_USSS.py:110-122) -------------------------------
    nband = dataset.size()[2]
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    net_g = Generator(nband, dtype=dtype)
    net_s = Segmentor(nband, bilinear=True, dtype=dtype,
                       siamese_stats=cfg.siamese_stats)
    tx_g, tx_s = adam(), adam()
    vggp = load_vgg16_params(cfg.vgg_npz, require=cfg.require_vgg)
    steps = USSSSteps(
        net_g, net_s, tx_g, tx_s, vggp,
        PerceptionConfig(select_feature_layers(cfg.perception_layer), cfg.perception_per_band,
                         dtype=cfg.compute_dtype if cfg.compute_dtype == "bfloat16" else None),
        cfg.perception_weight, cfg.l1_weight, cfg.ssim_weight,
        dataset.interior_sizes(), cfg.overlap_padding,
        cfg.gt_map, cfg.pre_map, cfg.prob_thresh, cfg.msssim_weights,
        remat=cfg.remat, ssim_metric=cfg.ssim_metric,
    )
    key = jax.random.PRNGKey(cfg.seed)
    zx = np.zeros((1, cfg.patch_size[1], cfg.patch_size[0], nband), np.float32)
    gstate = create_net_state(net_g, key, (zx,), tx_g)
    sstate = create_net_state(net_s, jax.random.fold_in(key, 1), (zx, zx), tx_s)
    if mesh is not None:
        gstate = replicate_state(gstate, mesh)
        sstate = replicate_state(sstate, mesh)

    ckpt = TrainCheckpointer(os.path.join(outdir, "resume{}.ckpt".format(cfg.ext)),
                             cfg.checkpoint_every)
    starts = {"g": 0, "s": 0, "joint": 0}
    if cfg.resume and ckpt.exists():
        states, meta = ckpt.restore({"netG": gstate, "netS": sstate})
        gstate, sstate = states["netG"], states["netS"]
        starts = TrainCheckpointer.start_epochs(meta, ("g", "s", "joint"))
        print("Resuming from phase {} epoch {}".format(meta["phase"], meta["epoch"]))

    writer = ScalarWriter(comment="USSS{}".format(cfg.ext), enabled=cfg.log_tensorboard)
    # epoch summaries resolve one epoch late (same content/order) so the
    # metric download overlaps the next epoch's device execution; live
    # progress lines force inline resolution to keep stdout ordering
    deferred = DeferredEpochEnd(enabled=not cfg.progress)

    loss_keys = ("NetLoss", "generator_loss", "l1_loss", "perception_loss", "ssim_loss")
    loss_labels = ("NetLoss Loss", "generator_loss Loss", "l1_loss Loss",
                   "perception_loss", "ssim_loss")

    def log_losses(av: EpochAverages, step: int):
        for k in loss_keys:
            writer.add_scalar(k.replace("NetLoss", "NetLoss"), av[k], step)

    def loss_print(epoch, n_epochs, av):
        parts = ", ".join("{}: {:.4f}".format(lbl, av[k])
                          for lbl, k in zip(loss_labels, loss_keys))
        print("Epochs: {}/{}, {}".format(epoch + 1, n_epochs, parts))

    # -- phase 1: generator init (Demo_USSS.py:124-189) ---------------------
    print("Start Initial Generator Training")
    for i in range(starts["g"], cfg.init_num_epochs_g):
        lr = schedules.G_PRETRAIN(i / cfg.lr_epoch_scale) * cfg.lr_scale
        av = EpochAverages(total)
        prog = Progress(total, lambda: cfg.init_num_epochs_g - 1 - i, cfg.progress)
        for batch in prefetch(iter(loader), cfg.prefetch_depth):
            prog.start_batch()
            db = put(batch)
            gstate, m = steps.g_pretrain(gstate, db["x"], db["y"], db["weight"], lr)
            bw = float(np.asarray(batch["weight"]).sum())
            av.update(m, bw)
            prog.end_batch(int(bw))
        prog.finish()

        def _g_end(i=i, av=av, g=gstate):
            loss_print(i, cfg.init_num_epochs_g, av)
            log_losses(av, i)
            ckpt.maybe_save("g", i, netG=g)

        # checkpoint epochs run inline (after a flush, so print order is
        # kept): the save closure captures live states that the next epoch's
        # donated step would delete on TPU if the closure ran up to FCDGAN_DEFER_DEPTH epochs late
        if ckpt.due(i):
            deferred.flush()
            _g_end()
        else:
            deferred.schedule(av, _g_end)

    # -- phase 2: segmentor init (Demo_USSS.py:192-286) ---------------------
    deferred.flush()
    print("Start Initial Segmentor Training")
    for i in range(starts["s"], cfg.init_num_epochs_s):
        lr = schedules.S_INIT_USSS(i / cfg.lr_epoch_scale) * cfg.lr_scale
        av = EpochAverages(total)
        prog = Progress(total, lambda: cfg.init_num_epochs_s - 1 - i, cfg.progress)
        for batch in prefetch(iter(loader), cfg.prefetch_depth):
            prog.start_batch()
            db = put(batch)
            gstate, sstate, m = steps.s_init(
                gstate, sstate, db["x"], db["y"], db["ref"], db["item"],
                db["weight"], lr)
            bw = float(np.asarray(batch["weight"]).sum())
            av.update(m, bw)
            prog.end_batch(int(bw))
        prog.finish()

        def _s_end(i=i, av=av, g=gstate, s=sstate):
            ev = av.evaluator(len(cfg.gt_map))
            loss_print(i, cfg.init_num_epochs_s, av)
            print(accuracy_line(i, cfg.init_num_epochs_s, ev))
            step = i + cfg.init_num_epochs_g
            log_losses(av, step)
            _log_accuracy(writer, ev, step)
            ckpt.maybe_save("s", i, netG=g, netS=s)

        # checkpoint epochs run inline (after a flush, so print order is
        # kept): the save closure captures live states that the next epoch's
        # donated step would delete on TPU if the closure ran up to FCDGAN_DEFER_DEPTH epochs late
        if ckpt.due(i):
            deferred.flush()
            _s_end()
        else:
            deferred.schedule(av, _s_end)

    # -- phase 3: joint alternating (Demo_USSS.py:289-400) ------------------
    deferred.flush()
    print("Start Training")
    for i in range(starts["joint"], cfg.num_epochs):
        lr_s = schedules.JOINT_USSS(i / cfg.lr_epoch_scale) * cfg.lr_scale
        lr_g = schedules.JOINT_USSS(i / cfg.lr_epoch_scale) * cfg.lr_scale
        av = EpochAverages(total)
        prog = Progress(total, lambda: cfg.num_epochs - 1 - i, cfg.progress)
        for batch in prefetch(iter(loader), cfg.prefetch_depth):
            prog.start_batch()
            db = put(batch)
            gstate, sstate, m = steps.joint(
                gstate, sstate, db["x"], db["y"], db["ref"], db["item"],
                db["weight"], lr_g, lr_s)
            bw = float(np.asarray(batch["weight"]).sum())
            av.update(m, bw)
            prog.end_batch(int(bw))
        prog.finish()

        def _joint_end(i=i, av=av, g=gstate, s=sstate):
            ev = av.evaluator(len(cfg.gt_map))
            loss_print(i, cfg.num_epochs, av)
            print(accuracy_line(i, cfg.num_epochs, ev))
            step = i + cfg.init_num_epochs_g + cfg.init_num_epochs_s
            log_losses(av, step)
            _log_accuracy(writer, ev, step)
            ckpt.maybe_save("joint", i, netG=g, netS=s)

        # checkpoint epochs run inline (after a flush, so print order is
        # kept): the save closure captures live states that the next epoch's
        # donated step would delete on TPU if the closure ran up to FCDGAN_DEFER_DEPTH epochs late
        if ckpt.due(i):
            deferred.flush()
            _joint_end()
        else:
            deferred.schedule(av, _joint_end)

    # -- inference + stitched write-back (Demo_USSS.py:404-473) -------------
    deferred.flush()
    print("Saving Change Map and Model")
    print("Segmentation of Change")
    if scene_cache is not None and not multihost:
        # FUSED full-scene inference: one device program stitches the whole
        # density raster (DeviceSceneCache.stitched_density), one download;
        # color map + confusion + ROC vectorize over the full arrays (tile
        # interiors tile the scene disjointly, so full-scene metrics equal
        # the reference's per-interior accumulation exactly)
        acc = Evaluator(num_class=len(cfg.gt_map))
        from ..eval.roc import RocCurve

        roc = RocCurve()
        density = scene_cache.stitched_density(
            steps.infer, sstate, batch_size=cfg.batch_size,
            density_dtype=cfg.density_dtype)
        dataset.write_full(density)
        cmask_full = (density > cfg.prob_thresh).astype(np.int16)
        ref_full = np.zeros_like(cmask_full)
        if dataset.raster_ref is not None:
            ref_full = dataset.raster_ref.read_block()[..., 0].astype(np.int16)
        if cfg.write_color:
            xs, ys, _ = dataset.size()
            out_color = create_raster(out_color_path, xs, ys, 1, np.int32,
                                      like=dataset.raster_x)
            codes = write_changemap_gdal(cmask_full[None], ref_full[None],
                                         write_color=True,
                                         ref_map=cfg.gt_map, dt_map=cfg.pre_map)
            out_color.write_block(codes[0].astype(np.int32), 0, 0, band=0)
            out_color.close()
        acc.add_batch_map(ref_full, cmask_full,
                          list(cfg.gt_map), list(cfg.pre_map))
        roc.add_batch(density, ref_full == cfg.gt_map[1])
        dataset.close_outputs()
        from ..io.records import segmentation_summary

        print(segmentation_summary(acc))
        print("AUC: {:.4f}".format(roc.auc()))
        print("\r" + "End of Saving", flush=True)
        return _finish_usss(cfg, outdir, acc, roc, out_path, out_color_path,
                            sstate, gstate, writer)

    test_loader = BatchLoader(dataset, cfg.batch_size,
                              fields=("x", "y", "item", "ref"), shuffle=False)
    acc = Evaluator(num_class=len(cfg.gt_map))
    from ..eval.roc import RocCurve

    roc = RocCurve()  # AUC extension (no reference counterpart)
    out_color = None
    pad = cfg.overlap_padding
    processed = 0
    from ..eval.inference import quantized_infer, run_overlapped

    infer_q, dequant = quantized_infer(steps.infer, cfg.density_dtype)

    def infer_compute(batch):
        db = put(batch)
        return infer_q(sstate, db["x"], db["y"])

    def infer_process(cmap_dev, batch):
        # writer thread: the blocking device->host download + raster/PNG
        # writes + metric accumulation overlap the next batch's device compute
        nonlocal out_color, processed
        cmap = dequant(cmap_dev)
        cmask = (cmap > cfg.prob_thresh).astype(np.int16)
        for ns in range(len(batch["weight"])):
            if batch["weight"][ns] == 0:
                continue
            item = int(batch["item"][ns])
            dataset.write_default(cmap[ns], item)
            ref_chw = np.moveaxis(batch["ref"][ns], -1, 0)
            cmask_chw = np.moveaxis(cmask[ns], -1, 0)
            if cfg.write_color:
                if out_color is None:
                    xs, ys, _ = dataset.size()
                    out_color = create_raster(out_color_path, xs, ys, 1, np.int32,
                                              like=dataset.raster_x)
                codes = write_changemap_gdal(cmask_chw, ref_chw, write_color=True,
                                             ref_map=cfg.gt_map, dt_map=cfg.pre_map)
                dataset.write(np.moveaxis(codes, 0, -1).astype(np.int32), item, out_color)
            y0, y1, x0, x1 = dataset.grid.interior(item)
            acc.add_batch_map(
                ref_chw[0, y0:y1, x0:x1].astype(np.int16),
                cmask_chw[0, y0:y1, x0:x1].astype(np.int16),
                list(cfg.gt_map), list(cfg.pre_map),
            )
            roc.add_batch(cmap[ns, y0:y1, x0:x1, 0],
                          (ref_chw[0, y0:y1, x0:x1] == cfg.gt_map[1]))
        processed += int(np.asarray(batch["weight"]).sum())
        if cfg.progress:
            print("\rProcessing batch: {}/{}".format(processed, total), end="", flush=True)

    run_overlapped(prefetch(iter(test_loader), cfg.prefetch_depth),
                   infer_compute, infer_process)
    if cfg.progress:
        print("\r", end="", flush=True)
    from ..io.records import segmentation_summary

    print(segmentation_summary(acc))
    print("AUC: {:.4f}".format(roc.auc()))
    print("\r" + "End of Saving", flush=True)
    dataset.close_outputs()
    if out_color is not None and hasattr(out_color, "close"):
        out_color.close()
    return _finish_usss(cfg, outdir, acc, roc, out_path, out_color_path,
                        sstate, gstate, writer)


def _finish_usss(cfg, outdir, acc, roc, out_path, out_color_path,
                 sstate, gstate, writer):
    """Save checkpoints + Para txt and build the result dict
    (Demo_USSS.py:477-501)."""
    smodel_path = os.path.join(outdir, "SModel{}.ckpt".format(cfg.ext))
    gmodel_path = os.path.join(outdir, "GModel{}.ckpt".format(cfg.ext))
    if cfg.save_checkpoints:
        save_net(smodel_path, sstate)
        save_net(gmodel_path, gstate)
    writer.close()

    para_path = timestamped_para_path(outdir, cfg.ext)
    write_para_txt(para_path, {
        "perception_weight": cfg.perception_weight,
        "ssim_weight": cfg.ssim_weight,
        "perception_perBand": cfg.perception_per_band,
        "perception_layer": cfg.perception_layer,
        "l1_weight": cfg.l1_weight,
        "discriminator_continuous": cfg.discriminator_continuous,
        "prob_thresh": cfg.prob_thresh,
    }, acc=acc, tips=cfg.tips)

    return {
        "evaluator": acc,
        "auc": roc.auc(),
        "density_path": out_path,
        "color_path": out_color_path if cfg.write_color else None,
        "para_path": para_path,
        "smodel_path": smodel_path if cfg.save_checkpoints else None,
        "gmodel_path": gmodel_path if cfg.save_checkpoints else None,
        "sstate": sstate,
        "gstate": gstate,
    }


def _log_accuracy(writer: ScalarWriter, ev: Evaluator, step: int):
    miou, ciou = ev.Mean_Intersection_over_Union()
    writer.add_scalar("Overall Accuracy:", ev.Pixel_Accuracy(), step)
    writer.add_scalar("Precision Rate", ev.Pixel_Precision_Rate(), step)
    writer.add_scalar("Recall Rate", ev.Pixel_Recall_Rate(), step)
    writer.add_scalar("Kappa Coefficient:", ev.Pixel_Kappa(), step)
    writer.add_scalar("F1", ev.Pixel_F1_score(), step)
    writer.add_scalar("mIOU", miou, step)
    writer.add_scalar("cIOU", ciou, step)


def run_profiled(cfg) -> Dict:
    """run() under a jax.profiler trace when config.profile_dir is set."""
    from ..utils.timing import maybe_profile

    with maybe_profile(cfg.profile_dir):
        return run(cfg)


def main(argv=None):
    run_profiled(parse_cli(USSSConfig, argv))


if __name__ == "__main__":
    main()
