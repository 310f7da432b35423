"""Weakly supervised change detection driver (reference: /root/reference/Demo_WSSS.py).

End-to-end flow (call-stack parity with SURVEY.md section 3.2): stats over the
full WHU slice set -> G pretrain on UNCHANGED pairs (skippable via
modelG_reuse / g_weight==0) -> adversarial S vs D over changed/unchanged pairs
re-paired per epoch -> final inference on the CHANGED set with intentional
train-mode BN -> PNG eval/density maps, SModel/GModel/DModel checkpoints,
Para txt.

Run: ``python -m fcdgan_tpu.demos.demo_wsss --img-dir-x ... --img-dir-y ...``
"""

from __future__ import annotations

import os
import random
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WSSSConfig, parse_cli
from ..data.datasets import WHUDataset, WHUPairDataset
from ..data.erasers import build_eraser
from ..data.normalize import Normalize
from ..data.pipeline import BatchLoader, PairBatchLoader, prefetch
from ..data.stats import dataset_meanstd
from ..eval.changemap import write_changemap
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
from ..train.steps import PerceptionConfig, WSSSSteps


def run(cfg: WSSSConfig) -> Dict:
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    from ..parallel.multihost import initialize_multihost, put_multihost, to_host

    multihost = initialize_multihost(  # before any backend use
        cfg.coordinator_address, cfg.num_processes, cfg.process_id)
    enable_compile_cache()
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    out_dir = cfg.out_dir or os.path.join(cfg.label_dir, "Detection_WSS{}".format(cfg.ext))
    os.makedirs(out_dir, exist_ok=True)
    out_density_dir = out_dir + "_Density"
    if cfg.write_grey:
        os.makedirs(out_density_dir, exist_ok=True)
    os.makedirs(cfg.out_g_model_dir, exist_ok=True)

    # -- stats + normalizer (Demo_WSSS.py:70-78) -----------------------------
    stats_ds = WHUDataset(cfg.img_dir_x, cfg.img_dir_y, cfg.ref_dir, cfg.label_dir, "-1")
    sp1 = os.path.join(cfg.img_dir_x, "{}_meanstd.txt".format(cfg.stats_name))
    sp2 = os.path.join(cfg.img_dir_y, "{}_meanstd.txt".format(cfg.stats_name))
    mean_x, std_x, mean_y, std_y = dataset_meanstd(sp1, sp2, stats_ds)
    scaler = Normalize(mean_x, std_x, mean_y, std_y)

    # -- datasets (Demo_WSSS.py:84-92) ----------------------------------------
    # optional random-erase augmentation on the training datasets
    # (reference wiring: Demo_RSSS.py:96,128 / CommonFunc.py:78-141)
    eraser = build_eraser(cfg.random_eraser, cfg.eraser_regions,
                          cfg.erase_thresh, cfg.seed)
    pair_ds = WHUPairDataset(cfg.img_dir_x, cfg.img_dir_y, cfg.ref_dir, cfg.label_dir,
                             scale=scaler, random_assign=cfg.random_assign, transforms=eraser,
                             rng=random.Random(cfg.seed))
    total = len(pair_ds)
    fields = ("x", "y", "ref", "item", "label")
    # order_reset() re-pairs changed/unchanged every epoch (Demo_WSSS.py:233)
    # native C++ threaded slice reads when available (WSSS is feeding-limited
    # on slow hosts: adversarial step ~21 ms vs ~38 ms/batch PIL assembly);
    # identical batches through the Python path otherwise
    mesh = make_mesh(cfg.n_devices) if (cfg.n_devices or multihost) else None

    # slice_cache ("auto"/"on"/"off"): HBM-resident raw slice stacks + jitted
    # on-device gather/normalize — per-batch upload drops to index rows
    # (data/device_cache.py; WSSS is feeding-limited on slow hosts:
    # adversarial step ~21 ms vs ~38 ms/batch PIL assembly)
    from ..data.device_cache import DeviceWHUCache

    whu_cache = None
    if (cfg.slice_cache != "off" and not multihost and eraser is None
            and DeviceWHUCache.supports(pair_ds)):
        whu_cache = DeviceWHUCache(pair_ds, scaler, mesh)
    if cfg.slice_cache == "on" and whu_cache is None:
        raise RuntimeError(
            "--slice-cache on: needs a single process, no random_assign, no "
            "random_eraser, and slices within FCDGAN_SLICE_CACHE_MAX_MB")

    # tail batches: reference torch semantics run the true short tail
    # (config.py `tail`); mesh/multi-host keep the fixed padded shape
    tail = ("short" if cfg.tail == "short"
            or (cfg.tail == "auto" and mesh is None and not multihost)
            else "pad")

    if whu_cache is not None:
        pair_loader = whu_cache.pair_loader(
            cfg.batch_size, pair_ds, shuffle=True, seed=cfg.seed,
            epoch_hook=lambda e: pair_ds.order_reset(), tail=tail)
    else:
        try:
            from ..data.pipeline import NativeWHUPairBatchLoader

            pair_loader = NativeWHUPairBatchLoader(
                pair_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
                epoch_hook=lambda e: pair_ds.order_reset())
        except Exception:
            pair_loader = PairBatchLoader(pair_ds, cfg.batch_size, c_fields=fields,
                                          nc_fields=fields, shuffle=True, seed=cfg.seed,
                                          epoch_hook=lambda e: pair_ds.order_reset(),
                                          tail=tail)
    unc_ds = WHUDataset(cfg.img_dir_x, cfg.img_dir_y, cfg.ref_dir, cfg.label_dir,
                        scale=scaler, label_selected="0", transforms=eraser)
    total_unc = len(unc_ds)
    # the unchanged G-pretrain set has the same file list as the pair's
    # nc side, so it feeds from the same device stacks; gate on the exact
    # path list (not just lengths) so a selection/ordering divergence can
    # never silently index the wrong slices
    unc_cached = (whu_cache is not None and eraser is None
                  and unc_ds.img_path_x == pair_ds.nc_ds.img_path_x)
    if unc_cached:
        unc_loader = whu_cache.unc_loader(cfg.unc_batch_size, unc_ds,
                                          shuffle=True, seed=cfg.seed,
                                          tail=tail)
    else:
        try:
            from ..data.pipeline import NativeWHUBatchLoader

            unc_loader = NativeWHUBatchLoader(unc_ds, cfg.unc_batch_size,
                                              shuffle=True, seed=cfg.seed)
        except Exception:
            unc_loader = BatchLoader(unc_ds, cfg.unc_batch_size, fields=fields,
                                     shuffle=True, seed=cfg.seed, tail=tail)

    def put(batch):
        if mesh is not None:
            return put_multihost(batch, mesh)  # single-process: plain DP path
        return shard_batch(batch, mesh)

    def put_pair(batch):
        return whu_cache.complete_pair(batch) if whu_cache is not None else put(batch)

    def put_unc(batch):
        return whu_cache.complete_unc(batch) if unc_cached else put(batch)

    # -- models / optimizers (Demo_WSSS.py:103-122) --------------------------
    sample = unc_ds[0][0] if total_unc else pair_ds[0][0][0]
    nband = sample.shape[-1]
    hw = sample.shape[:2]
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    net_g = Generator(nband, dtype=dtype)
    net_s = Segmentor(nband, bilinear=True, dtype=dtype,
                       siamese_stats=cfg.siamese_stats)
    net_d = Discriminator(nband, dtype=dtype)
    tx_g, tx_s, tx_d = adam(), rmsprop(), rmsprop()
    vggp = load_vgg16_params(cfg.vgg_npz, require=cfg.require_vgg)
    steps = WSSSSteps(
        net_g, net_s, net_d, tx_g, tx_s, tx_d, vggp,
        PerceptionConfig(select_feature_layers(cfg.perception_layer), cfg.perception_per_band,
                         dtype=cfg.compute_dtype if cfg.compute_dtype == "bfloat16" else None),
        cfg.perception_weight, cfg.ssim_weight, cfg.g_weight, cfg.l1_weight,
        cfg.d_weight, cfg.nc_weight, cfg.prob_thresh,
        cfg.discriminator_continuous, cfg.msssim_weights,
        remat=cfg.remat, ssim_metric=cfg.ssim_metric,
    )
    key = jax.random.PRNGKey(cfg.seed)
    zx = np.zeros((1, hw[0], hw[1], nband), np.float32)
    gstate = create_net_state(net_g, key, (zx,), tx_g)
    sstate = create_net_state(net_s, jax.random.fold_in(key, 1), (zx, zx), tx_s)
    dstate = create_net_state(net_d, jax.random.fold_in(key, 2), (zx, zx), tx_d)

    # -- generator reuse (Demo_WSSS.py:131-138) -------------------------------
    gstate, init_epochs_g = model_g_reuse(
        cfg.out_g_model_dir, gstate, cfg.init_num_epochs_g, cfg.model_g_reuse)
    if cfg.g_weight == 0:
        init_epochs_g = 0

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

    writer = ScalarWriter(comment="Building_WSSS{}".format(cfg.ext),
                          enabled=cfg.log_tensorboard)
    # epoch summaries resolve one epoch late (same content/order) so the
    # metric download overlaps the next epoch's device execution
    deferred = DeferredEpochEnd(enabled=not cfg.progress)

    # -- phase 1: G pretrain on unchanged pairs (Demo_WSSS.py:140-204) -------
    print("Start Generator Training")
    for i in range(starts["g"], init_epochs_g):
        lr = schedules.G_PRETRAIN(i / cfg.lr_epoch_scale) * cfg.lr_scale
        av = EpochAverages(total_unc)
        prog = Progress(total_unc, lambda: init_epochs_g - 1 - i, cfg.progress)
        for batch in prefetch(iter(unc_loader), cfg.prefetch_depth):
            prog.start_batch()
            db = put_unc(batch)
            gstate, m = steps.g_pretrain(gstate, db["x"], db["y"], db["weight"], lr)
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

    # -- phase 2: adversarial S vs D (Demo_WSSS.py:208-385) ------------------
    deferred.flush()
    print("Start Adversarial Training")
    adv_keys = ("d_loss", "g_loss", "s_loss", "l1_loss", "nc_loss", "s_d_loss")
    for i in range(starts["adv"], cfg.num_epochs):
        lr_s = schedules.S_ADV_WSSS(i / cfg.lr_epoch_scale) * cfg.lr_scale
        lr_d = schedules.D_ADV_WSSS(i / cfg.lr_epoch_scale) * cfg.lr_scale
        av = EpochAverages(total)
        prog = Progress(total, lambda: cfg.num_epochs - 1 - i, cfg.progress)
        for batch in prefetch(iter(pair_loader), cfg.prefetch_depth):
            prog.start_batch()
            db = put_pair(batch)
            sstate, dstate, m = steps.adversarial(
                sstate, dstate, gstate, db["c_x"], db["c_y"], db["c_ref"],
                db["nc_x"], db["nc_y"], db["weight"], lr_s, lr_d)
            bw = float(np.asarray(batch["weight"]).sum())
            av.update(m, bw)
            prog.end_batch(int(bw))
        prog.finish()

        def _adv_end(i=i, av=av, g=gstate, s=sstate, d=dstate):
            ev = av.evaluator(2)
            print("Epochs: {}/{}, d_loss: {:.4f}, g_loss: {:.4f}, s_loss: {:.4f}, "
                  "l1_loss:{:.4f}, nc_loss:{:.4f}, s_d_loss: {:.4f}".format(
                      i + 1, cfg.num_epochs, av["d_loss"], av["g_loss"],
                      av["s_loss"], av["l1_loss"], av["nc_loss"], av["s_d_loss"]))
            print(accuracy_line(i, cfg.num_epochs, ev))
            step = i + init_epochs_g
            writer.add_scalars({k: av[k] for k in adv_keys}, step)
            writer.add_scalars({
                "generator_loss": av["generator_loss"],
                "perception_loss": av["perception_loss"],
                "ssim_loss": av["ssim_loss"],
            }, step)
            _log_accuracy(writer, ev, step)
            ckpt.maybe_save("adv", i, netG=g, netS=s, netD=d)

        # checkpoint epochs run inline (after a flush, so print order is
        # kept): the save closure captures live states that the next epoch's
        # donated step would delete on TPU if the closure ran up to FCDGAN_DEFER_DEPTH epochs late
        if ckpt.due(i):
            deferred.flush()
            _adv_end()
        else:
            deferred.schedule(av, _adv_end)

    # -- final inference on CHANGED set, train-mode BN (Demo_WSSS.py:387-445)
    deferred.flush()
    print("Saving Change Map and Model")
    print("Segmentation of Change")
    c_ds = WHUDataset(cfg.img_dir_x, cfg.img_dir_y, cfg.ref_dir, cfg.label_dir,
                      scale=scaler, label_selected="1")
    # the changed set == the pair's changed side, so it feeds from the
    # resident slice stacks; the 1-band refs are read on the writer thread
    c_cached = (whu_cache is not None
                and c_ds.img_path_x == pair_ds.c_ds.img_path_x)
    if c_cached:
        from ..data.device_cache import IndexBatchLoader

        test_loader = IndexBatchLoader(c_ds, cfg.batch_size, shuffle=False,
                                       tail=tail)
    else:
        test_loader = BatchLoader(c_ds, cfg.batch_size, fields=fields,
                                  shuffle=False, tail=tail)
    acc = Evaluator(num_class=2)
    from PIL import Image

    from ..eval.inference import run_overlapped

    def host_ref_slice(item: int) -> np.ndarray:
        # WHUDataset ref semantics (data_utils.py:501-508): binarized when
        # the slice is labeled changed, zeros otherwise
        li = c_ds.label_list[item]
        if int(li[3]) == 1:
            r = np.array(Image.open(c_ds.ref_path[item]))
            return (r > 0).astype(np.float32)
        probe = np.array(Image.open(c_ds.img_path_x[item]))
        return np.zeros(probe.shape[:2], np.float32)

    def infer_compute(batch):
        nonlocal sstate  # train-mode forward threads updated BN stats
        db = whu_cache.complete_c(batch) if c_cached else put(batch)
        cmap_dev, sstate = steps.infer_train_mode(sstate, db["x"], db["y"])
        return cmap_dev

    def infer_process(cmap_dev, batch):
        # writer thread: download + PNG writes overlap the next forward
        cmap = to_host(cmap_dev)
        cmask = (cmap > cfg.prob_thresh).astype(np.int16)
        for ns in range(len(batch["weight"])):
            if batch["weight"][ns] == 0:
                continue
            item = int(batch["item"][ns])
            change_mask = cmask[ns, :, :, 0]
            ref_mask = (batch["ref"][ns][:, :, 0] if "ref" in batch
                        else host_ref_slice(item))
            acc.add_batch(ref_mask.astype(np.int16), change_mask)
            change_write = write_changemap(change_mask, ref_mask, cfg.write_color)
            out_path = os.path.join(out_dir, c_ds.get_file_name(item))
            if cfg.write_grey:
                density = Image.fromarray(np.uint8(cmap[ns, :, :, 0] * 255))
                density.save(os.path.join(out_density_dir, c_ds.get_file_name(item)))
            if change_write.ndim == 3:
                change_write = change_write.transpose((1, 2, 0))
            Image.fromarray(np.uint8(change_write)).save(out_path)

    run_overlapped(prefetch(iter(test_loader), cfg.prefetch_depth),
                   infer_compute, infer_process)

    print("\rSegmentation, " + segmentation_summary(acc))
    print("\r" + "End of Saving", flush=True)

    # -- save + Para txt (Demo_WSSS.py:454-482) -------------------------------
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
        "nc_weight": cfg.nc_weight,
        "d_weight": cfg.d_weight,
        "g_weight": cfg.g_weight,
        "discriminator_continuous": cfg.discriminator_continuous,
        "prob_thresh": cfg.prob_thresh,
    }, acc=acc, tips=cfg.tips)

    return {
        "evaluator": acc,
        "out_dir": out_dir,
        "density_dir": out_density_dir if cfg.write_grey else None,
        "para_path": para_path,
        "smodel_path": smodel_path if cfg.save_checkpoints else None,
        "gmodel_path": gmodel_path if cfg.save_checkpoints else None,
        "dmodel_path": dmodel_path if cfg.save_checkpoints else None,
        "sstate": sstate,
        "gstate": gstate,
        "dstate": dstate,
    }


def _log_accuracy(writer: ScalarWriter, ev: Evaluator, step: int):
    miou, ciou = ev.Mean_Intersection_over_Union()
    writer.add_scalar("Overall Accuracy:", ev.Pixel_Accuracy(), step)
    writer.add_scalar("Kappa Coefficient:", ev.Pixel_Kappa(), step)
    writer.add_scalar("Precision Rate", ev.Pixel_Precision_Rate(), step)
    writer.add_scalar("Recall Rate", ev.Pixel_Recall_Rate(), step)
    writer.add_scalar("F1", ev.Pixel_F1_score(), step)
    writer.add_scalar("mIOU", miou, step)
    writer.add_scalar("cIOU", ciou, step)


def run_profiled(cfg) -> Dict:
    """run() under a jax.profiler trace when config.profile_dir is set."""
    from ..utils.timing import maybe_profile

    with maybe_profile(cfg.profile_dir):
        return run(cfg)


def main(argv=None):
    run_profiled(parse_cli(WSSSConfig, argv))


if __name__ == "__main__":
    main()
