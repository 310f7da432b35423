"""Regional supervised change detection driver (reference: /root/reference/Demo_RSSS.py).

End-to-end flow (call-stack parity with SURVEY.md section 3.3): per-scene
stats/normalizers over the OSCD layout -> G pretrain with the REGION raster as
mask (modelG_reuse shortcut) -> adversarial S vs D with region-synthesized
unchanged pairs + region losses -> per-epoch test-set evaluation -> final
density/color rasters per scene -> SModel/GModel/DModel checkpoints, Para txt.

Run: ``python -m fcdgan_tpu.demos.demo_rsss --img-dir /OSCD-10m-Dataset``
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RSSSConfig, parse_cli
from ..data.datasets import OSCDDataset, ScenePairDataset
from ..data.erasers import build_eraser
from ..data.normalize import Normalize
from ..data.pipeline import BatchLoader, prefetch
from ..data.stats import dataset_meanstd
from ..eval.changemap import write_changemap_gdal
from ..eval.evaluator import Evaluator
from ..io.checkpoint import TrainCheckpointer, model_g_reuse, save_net
from ..io.records import ScalarWriter, segmentation_summary, write_para_txt
from ..models import Discriminator, Generator, Segmentor
from ..models.vgg import load_vgg16_params, select_feature_layers
from ..parallel.mesh import make_mesh, pad_batch_to_multiple, replicate_state, shard_batch
from ..train import schedules
from ..train.loops import DeferredEpochEnd, EpochAverages, Progress, accuracy_line
from ..train.optim import adam, rmsprop
from ..utils.runtime import enable_compile_cache
from ..train.state import create_net_state
from ..train.steps import PerceptionConfig, RSSSSteps


def _scene_scalers(img_dir: str, txt_name: str, patch_size, stats_name: str) -> List:
    """Per-scene normalizers with cached statsMS txts (Demo_RSSS.py:75-97)."""
    tmp = OSCDDataset(img_dir, txt_name)
    scalers = []
    for path in tmp.pathlist:
        img_x, img_y = path[0], path[1]
        cur_dir, name_x = os.path.split(img_x)
        _, name_y = os.path.split(img_y)
        name_x, _ = os.path.splitext(name_x)
        name_y, _ = os.path.splitext(name_y)
        ds_tmp = ScenePairDataset(img_x, img_y, patch_size=patch_size,
                                  overlap_padding=(0, 0))
        sp1 = os.path.join(cur_dir, "{}_{}.txt".format(name_x, stats_name))
        sp2 = os.path.join(cur_dir, "{}_{}.txt".format(name_y, stats_name))
        mean_x, std_x, mean_y, std_y = dataset_meanstd(sp1, sp2, ds_tmp)
        scalers.append(Normalize(mean_x, std_x, mean_y, std_y))
    return scalers


def run(cfg: RSSSConfig) -> Dict:
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    from ..parallel.multihost import initialize_multihost, put_multihost

    multihost = initialize_multihost(  # before any backend use
        cfg.coordinator_address, cfg.num_processes, cfg.process_id)
    enable_compile_cache()
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    out_dir = os.path.join(cfg.img_dir, "model{}".format(cfg.ext))
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(cfg.out_g_model_dir, exist_ok=True)

    # -- datasets with per-scene normalizers (Demo_RSSS.py:75-134) -----------
    train_scalers = _scene_scalers(cfg.img_dir, cfg.txt_name, cfg.patch_size, cfg.stats_name)
    # optional random-erase augmentation on the train scenes only
    # (reference wiring: Demo_RSSS.py:96,128 / CommonFunc.py:78-141)
    eraser = build_eraser(cfg.random_eraser, cfg.eraser_regions,
                          cfg.erase_thresh, cfg.seed)
    dataset = OSCDDataset(cfg.img_dir, cfg.txt_name, scaler=train_scalers,
                          transforms=[eraser] * len(train_scalers),
                          patch_size=cfg.patch_size, overlap_padding=cfg.overlap_padding)
    total = len(dataset)
    test_scalers = _scene_scalers(cfg.img_dir, cfg.test_txt_name, cfg.patch_size, cfg.stats_name)
    test_dataset = OSCDDataset(cfg.img_dir, cfg.test_txt_name, scaler=test_scalers,
                               transforms=None, patch_size=cfg.patch_size,
                               overlap_padding=cfg.overlap_padding)
    total_test = len(test_dataset)

    fields = ("x", "y", "item", "ref", "region")

    mesh = make_mesh(cfg.n_devices) if (cfg.n_devices or multihost) else None

    # tile_cache ("auto"/"on"/"off"): HBM-resident raw tile stacks with
    # per-scene on-device normalization — per-batch upload drops to
    # (item, weight) int32 pairs for BOTH the adversarial loop and the
    # per-epoch test eval (data/device_cache.py)
    from ..data.device_cache import DeviceOSCDCache

    train_cache = test_cache = None
    if (cfg.tile_cache != "off" and not multihost and eraser is None
            and DeviceOSCDCache.supports(dataset)
            and DeviceOSCDCache.supports(test_dataset)):
        train_cache = DeviceOSCDCache(dataset, mesh)
        test_cache = DeviceOSCDCache(test_dataset, mesh)
    if cfg.tile_cache == "on" and train_cache is None:
        raise RuntimeError(
            "--tile-cache on: needs a single process, no random_eraser, and "
            "tiles within FCDGAN_TILE_CACHE_MAX_MB")

    # tail batches: reference torch semantics run the true short tail
    # (config.py `tail`); mesh/multi-host keep the fixed padded shape
    tail = ("short" if cfg.tail == "short"
            or (cfg.tail == "auto" and mesh is None and not multihost)
            else "pad")

    def make_loader(ds, bs, shuffle, seed):
        cache = train_cache if ds is dataset else test_cache
        if cache is not None:
            return cache.loader(bs, ds, shuffle=shuffle, seed=seed, tail=tail)
        # native C++ per-scene tile assembly when available (fixed-shape
        # buffers: padded tails)
        try:
            from ..data.pipeline import NativeOSCDBatchLoader

            return NativeOSCDBatchLoader(ds, bs, shuffle=shuffle, seed=seed)
        except Exception:
            return BatchLoader(ds, bs, fields=fields, shuffle=shuffle,
                               seed=seed, tail=tail)

    init_loader = make_loader(dataset, cfg.init_batch_size, True, cfg.seed)
    train_loader = make_loader(dataset, cfg.batch_size, True, cfg.seed + 1)
    test_loader = make_loader(test_dataset, cfg.batch_size, False, cfg.seed)

    def put(batch):
        if mesh is not None:
            return put_multihost(batch, mesh)  # single-process: plain DP path
        return shard_batch(batch, mesh)

    def put_train(batch):
        return train_cache.complete(batch) if train_cache is not None else put(batch)

    def put_test(batch):
        return test_cache.complete(batch) if test_cache is not None else put(batch)

    # -- models / optimizers (Demo_RSSS.py:137-158) --------------------------
    nband = dataset[0][0].shape[-1]
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    net_g = Generator(nband, dtype=dtype)
    net_s = Segmentor(nband, bilinear=True, dtype=dtype,
                       siamese_stats=cfg.siamese_stats)
    net_d = Discriminator(nband, dtype=dtype)
    tx_g, tx_s, tx_d = adam(), rmsprop(), rmsprop()
    vggp = load_vgg16_params(cfg.vgg_npz, require=cfg.require_vgg)
    steps = RSSSSteps(
        net_g, net_s, net_d, tx_g, tx_s, tx_d, vggp,
        PerceptionConfig(select_feature_layers(cfg.perception_layer), cfg.perception_per_band,
                         dtype=cfg.compute_dtype if cfg.compute_dtype == "bfloat16" else None),
        cfg.perception_weight, cfg.ssim_weight, cfg.g_weight, cfg.l1_weight,
        cfg.d_weight, cfg.r_weight,
        dataset.interior_sizes(), cfg.overlap_padding,
        cfg.gt_map, cfg.pre_map, cfg.prob_thresh,
        cfg.discriminator_continuous, cfg.msssim_weights,
        test_interior_sizes=test_dataset.interior_sizes(),
        remat=cfg.remat, ssim_metric=cfg.ssim_metric,
    )
    key = jax.random.PRNGKey(cfg.seed)
    zx = np.zeros((1, cfg.patch_size[1], cfg.patch_size[0], nband), np.float32)
    gstate = create_net_state(net_g, key, (zx,), tx_g)
    sstate = create_net_state(net_s, jax.random.fold_in(key, 1), (zx, zx), tx_s)
    dstate = create_net_state(net_d, jax.random.fold_in(key, 2), (zx, zx), tx_d)

    gstate, init_epochs_g = model_g_reuse(
        cfg.out_g_model_dir, gstate, cfg.init_num_epochs_g, cfg.model_g_reuse)

    if mesh is not None:
        gstate = replicate_state(gstate, mesh)
        sstate = replicate_state(sstate, mesh)
        dstate = replicate_state(dstate, mesh)

    ckpt = TrainCheckpointer(os.path.join(out_dir, "resume.ckpt"), cfg.checkpoint_every)
    starts = {"g": 0, "adv": 0}
    if cfg.resume and ckpt.exists():
        states, meta = ckpt.restore({"netG": gstate, "netS": sstate, "netD": dstate})
        gstate, sstate, dstate = states["netG"], states["netS"], states["netD"]
        starts = TrainCheckpointer.start_epochs(meta, ("g", "adv"))
        print("Resuming from phase {} epoch {}".format(meta["phase"], meta["epoch"]))

    writer = ScalarWriter(comment="RSSS_OSCD{}".format(cfg.ext),
                          enabled=cfg.log_tensorboard)
    # epoch summaries resolve one epoch late (same content/order) so the
    # metric downloads overlap the next epoch's device execution
    deferred = DeferredEpochEnd(enabled=not cfg.progress)

    # -- phase 1: G pretrain with region masks (Demo_RSSS.py:173-238) --------
    print("Start Generator Training")
    for i in range(starts["g"], init_epochs_g):
        lr = schedules.G_PRETRAIN(i / cfg.lr_epoch_scale) * cfg.lr_scale
        av = EpochAverages(total)
        prog = Progress(total, lambda: init_epochs_g - 1 - i, cfg.progress)
        for batch in prefetch(iter(init_loader), cfg.prefetch_depth):
            prog.start_batch()
            db = put_train(batch)
            gstate, m = steps.g_pretrain(gstate, db["x"], db["y"], db["region"],
                                         db["weight"], lr)
            bw = float(np.asarray(batch["weight"]).sum())
            av.update(m, bw)
            prog.end_batch(int(bw))
        prog.finish()

        def _g_end(i=i, av=av, g=gstate):
            print("Epochs: {}/{}, g_loss: {:.4f}, generator_loss: {:.4f}, "
                  "perception_loss:{:.4f}, ssim_loss:{:.4f}".format(
                      i + 1, init_epochs_g, av["g_loss"], av["generator_loss"],
                      av["perception_loss"], av["ssim_loss"]))
            writer.add_scalars({k: av[k] for k in
                                ("g_loss", "generator_loss", "perception_loss",
                                 "ssim_loss")}, i)
            ckpt.maybe_save("g", i, netG=g)

        # checkpoint epochs run inline (after a flush, so print order is
        # kept): the save closure captures live states that the next epoch's
        # donated step would delete on TPU if the closure ran up to FCDGAN_DEFER_DEPTH epochs late
        if ckpt.due(i):
            deferred.flush()
            _g_end()
        else:
            deferred.schedule(av, _g_end)

    # -- phase 2: adversarial + per-epoch test eval (Demo_RSSS.py:244-447) ---
    deferred.flush()
    print("Start Adversarial Training")
    results_last_test = None
    for i in range(starts["adv"], cfg.num_epochs):
        lr_s = schedules.S_ADV_RSSS(i / cfg.lr_epoch_scale) * cfg.lr_scale
        lr_d = schedules.D_ADV_RSSS(i / cfg.lr_epoch_scale) * cfg.lr_scale
        av = EpochAverages(total)
        prog = Progress(total, lambda: cfg.num_epochs - 1 - i, cfg.progress)
        for batch in prefetch(iter(train_loader), cfg.prefetch_depth):
            prog.start_batch()
            db = put_train(batch)
            sstate, dstate, m = steps.adversarial(
                sstate, dstate, gstate, db["x"], db["y"], db["ref"], db["region"],
                db["item"], db["weight"], lr_s, lr_d)
            bw = float(np.asarray(batch["weight"]).sum())
            av.update(m, bw)
            prog.end_batch(int(bw))
        prog.finish()

        # per-epoch test evaluation (Demo_RSSS.py:399-447): confusion
        # accumulates on device via EpochAverages — one download per epoch
        # instead of a blocking transfer per batch. Default reference-parity
        # mode runs train-mode BN and lets the running stats absorb the test
        # batches (netS.eval() is never called in the reference's loop);
        # wrap-padded tail duplicates are trimmed so the batch statistics
        # match torch's drop_last=False short tail batch.
        test_av = EpochAverages(1)
        for batch in prefetch(iter(test_loader), cfg.prefetch_depth):
            if cfg.test_eval_bn == "train" and mesh is None:
                n_real = int(np.asarray(batch["weight"]).sum())
                if n_real < len(batch["weight"]):
                    batch = {k: v[:n_real] for k, v in batch.items()}
            db = put_test(batch)
            if cfg.test_eval_bn == "train":
                cm, sstate = steps.eval_confusion_train(
                    sstate, db["x"], db["y"], db["ref"], db["item"],
                    db["weight"])
            else:
                cm, _ = steps.eval_confusion(sstate, db["x"], db["y"],
                                             db["ref"], db["item"],
                                             db["weight"])
            test_av.update({"confusion": cm}, 0.0)

        # the whole epoch summary (train metrics line, test-dataset line,
        # tensorboard rows, checkpoint) resolves one epoch late so both
        # downloads overlap the next epoch's device execution; print/line
        # ORDER is unchanged (train lines, then the test line)
        def _adv_end(i=i, av=av, test_av=test_av, g=gstate, s=sstate, d=dstate):
            nonlocal results_last_test
            ev = av.evaluator(len(cfg.gt_map))
            print("Epochs: {}/{}, d_loss: {:.4f}, g_loss: {:.4f}, s_loss: {:.4f}, "
                  "l1_loss:{:.4f}, s_d_loss: {:.4f}, r_loss: {:.4f}".format(
                      i + 1, cfg.num_epochs, av["d_loss"], av["g_loss"],
                      av["s_loss"], av["l1_loss"], av["s_d_loss"], av["r_loss"]))
            print(accuracy_line(i, cfg.num_epochs, ev))
            step = i + init_epochs_g
            writer.add_scalars({k: av[k] for k in
                                ("g_loss", "d_loss", "s_loss", "s_d_loss",
                                 "l1_loss", "r_loss", "generator_loss",
                                 "perception_loss", "ssim_loss")}, step)
            _log_accuracy(writer, ev, step, prefix="")
            test_acc = Evaluator(num_class=len(cfg.gt_map))
            if test_av.confusion is not None:
                test_acc.add_confusion(test_av.confusion)
            miou, ciou = test_acc.Mean_Intersection_over_Union()
            print("Test Dataset: Overall Accuracy: {:.4f}, Kappa: {:.4f}, "
                  "Precision Rate: {:.4f}, Recall Rate: {:.4f}, F1:{:.4f}, "
                  "mIOU:{:.4f}, cIoU:{:.4f}".format(
                      test_acc.Pixel_Accuracy(), test_acc.Pixel_Kappa(),
                      test_acc.Pixel_Precision_Rate(),
                      test_acc.Pixel_Recall_Rate(),
                      test_acc.Pixel_F1_score(), miou, ciou))
            _log_accuracy(writer, test_acc, step, prefix="Test ")
            results_last_test = test_acc
            ckpt.maybe_save("adv", i, netG=g, netS=s, netD=d)

        deferred.attach(av)  # train totals ride the shared history row
        # checkpoint epochs run inline (after a flush, so print order is
        # kept): the save closure captures live states that the next epoch's
        # donated step would delete on TPU if the closure ran up to FCDGAN_DEFER_DEPTH epochs late
        if ckpt.due(i):
            deferred.flush()
            _adv_end()
        else:
            deferred.schedule(test_av, _adv_end)

    # -- final inference: density + color rasters per scene (:449-504) -------
    deferred.flush()
    print("Saving Change Map and Model")
    print("Segmentation of Change")
    acc = Evaluator(num_class=len(cfg.gt_map))
    density_name = "{}{}".format(cfg.out_name_density, cfg.ext)
    color_name = "{}{}".format(cfg.out_name_binary, cfg.ext)
    from ..eval.inference import quantized_infer, run_overlapped

    infer_q, dequant = quantized_infer(steps.infer, cfg.density_dtype)

    ph_t, pw_t = test_dataset.dslist[0].ds.grid.canvas_shape()

    def host_ref_tile(item: int) -> np.ndarray:
        # cache-fed batches carry no host ref; read the 1-band tile on the
        # writer thread (a fraction of the bytes, fully overlapped)
        s_idx, cur = test_dataset._locate(item)
        base = test_dataset.dslist[s_idx].ds
        ref = np.zeros((ph_t, pw_t, 1), np.float32)
        if base.raster_ref is not None:
            _, read, write = base.grid.slices(cur)
            r = base.raster_ref.read_block(*read).astype(np.float32)
            ref[write[1]:write[1] + write[3], write[0]:write[0] + write[2], :] = r
        return ref

    def infer_compute(batch):
        db = put_test(batch)
        return infer_q(sstate, db["x"], db["y"])

    def infer_process(cmap_dev, batch):
        # writer thread: download + per-scene raster writes + metrics overlap
        # the next batch's device compute (multi-scene OSCD stitching pipelined)
        cmap = dequant(cmap_dev)
        cmask = (cmap > cfg.prob_thresh).astype(np.int16)
        for ns in range(len(batch["weight"])):
            if batch["weight"][ns] == 0:
                continue
            item = int(batch["item"][ns])
            test_dataset.write(cmap[ns], item, density_name)
            ref_hwc = batch["ref"][ns] if "ref" in batch else host_ref_tile(item)
            ref_chw = np.moveaxis(ref_hwc, -1, 0)
            cmask_chw = np.moveaxis(cmask[ns], -1, 0)
            codes = write_changemap_gdal(cmask_chw, ref_chw, write_color=cfg.write_color,
                                         ref_map=cfg.gt_map, dt_map=cfg.pre_map)
            test_dataset.write(np.moveaxis(codes, 0, -1), item, color_name)
            y0, y1, x0, x1 = test_dataset.eff_range(item)
            acc.add_batch_map(ref_chw[0, y0:y1, x0:x1].astype(np.int16),
                              cmask_chw[0, y0:y1, x0:x1].astype(np.int16),
                              list(cfg.gt_map), list(cfg.pre_map))

    run_overlapped(prefetch(iter(test_loader), cfg.prefetch_depth),
                   infer_compute, infer_process)
    test_dataset.close_outputs()
    print(segmentation_summary(acc))
    print("\r" + "End of Saving", flush=True)

    # -- save + Para txt (Demo_RSSS.py:506-538) -------------------------------
    smodel_path = os.path.join(out_dir, "SModel.ckpt")
    gmodel_path = os.path.join(cfg.out_g_model_dir, "GModel.ckpt")
    dmodel_path = os.path.join(out_dir, "DModel.ckpt")
    if cfg.save_checkpoints:
        save_net(smodel_path, sstate)
        save_net(gmodel_path, gstate)
        save_net(dmodel_path, dstate)
    writer.close()

    para_path = write_para_txt(os.path.join(out_dir, "Para.txt"), {
        "perception_weight": cfg.perception_weight,
        "ssim_weight": cfg.ssim_weight,
        "perception_perBand": cfg.perception_per_band,
        "perception_layer": cfg.perception_layer,
        "l1_weight": cfg.l1_weight,
        "g_weight": cfg.g_weight,
        "d_weight": cfg.d_weight,
        "r_weight": cfg.r_weight,
        "discriminator_continuous": cfg.discriminator_continuous,
        "prob_thresh": cfg.prob_thresh,
    }, acc=acc, tips=cfg.tips)

    return {
        "evaluator": acc,
        "test_evaluator": results_last_test,
        "out_dir": out_dir,
        "density_name": density_name,
        "color_name": color_name,
        "para_path": para_path,
        "smodel_path": smodel_path if cfg.save_checkpoints else None,
        "gmodel_path": gmodel_path if cfg.save_checkpoints else None,
        "dmodel_path": dmodel_path if cfg.save_checkpoints else None,
        "sstate": sstate,
        "gstate": gstate,
        "dstate": dstate,
        "test_dataset": test_dataset,
    }


def _log_accuracy(writer: ScalarWriter, ev: Evaluator, step: int, prefix: str = ""):
    miou, ciou = ev.Mean_Intersection_over_Union()
    writer.add_scalar(prefix + "Overall Accuracy:", ev.Pixel_Accuracy(), step)
    writer.add_scalar(prefix + "Precision Rate", ev.Pixel_Precision_Rate(), step)
    writer.add_scalar(prefix + "Recall Rate", ev.Pixel_Recall_Rate(), step)
    writer.add_scalar(prefix + "F1", ev.Pixel_F1_score(), step)
    writer.add_scalar(prefix + "mIOU", miou, step)
    writer.add_scalar(prefix + "cIOU", ciou, step)


def run_profiled(cfg) -> Dict:
    """run() under a jax.profiler trace when config.profile_dir is set."""
    from ..utils.timing import maybe_profile

    with maybe_profile(cfg.profile_dir):
        return run(cfg)


def main(argv=None):
    run_profiled(parse_cli(RSSSConfig, argv))


if __name__ == "__main__":
    main()
