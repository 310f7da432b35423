"""Standalone stitched inference from a saved SModel checkpoint.

The reference has no inference-only entry point — deploying a trained
model means re-running a Demo script with its training loop edited out.
This tool is the serving path: load ``SModel*.ckpt`` (saved by any of the
three drivers, io/checkpoint.py::save_net), run the eval-mode segmentor
over an arbitrary bi-temporal raster pair with the overlap-tiled grid
(parity: /root/reference/data_utils.py:57-63,154-176), and stitch the
change-density GeoTIFF (+ optional {TN,FN,FP,TP} color raster and metrics
when a reference raster is given — Demo_USSS.py:404-473 semantics).

Run:
  python -m fcdgan_tpu.tools.infer --dir /data --smodel /runs/SModel_r1.ckpt \
      [--ref-name ref.tif] [--density-dtype uint8] [--platform cpu]

Modes: ``scene`` (one raster pair, above), ``whu`` (WSSS slice set ->
per-slice PNG eval/density maps, Demo_WSSS.py:387-445), ``oscd`` (RSSS
multi-scene layout -> per-scene stitched density/color rasters,
Demo_RSSS.py:449-504).

Normalization stats are read from (or computed into) the same
``{image}_{stats}.txt`` caches the drivers use, so a pair already
prepared for training serves unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np


def _json_line(d: Dict) -> str:
    """Strict-JSON summary: non-finite metrics (e.g. precision on an all-
    negative reference) become null instead of bare NaN tokens."""
    def clean(v):
        if isinstance(v, float) and not np.isfinite(v):
            return None
        return v

    return json.dumps({k: clean(v) for k, v in d.items() if k != "evaluator"})


@dataclasses.dataclass
class InferConfig:
    mode: str = "scene"                 # 'scene' (raster pair) | 'whu' (slice set)
                                        # | 'oscd' (multi-scene RSSS layout)
    dir: str = "."
    smodel: str = ""                    # path to SModel*.ckpt (required)
    image_x_name: str = "T1.tif"
    image_y_name: str = "T2.tif"
    # -- oscd mode (multi-scene layout; Demo_RSSS.py:449-504) ----------------
    txt_name: str = "test.txt"          # one-line comma-separated scene list
    out_name_density: str = "density_serve"
    out_name_binary: str = "color_serve"
    # -- whu mode (slice dataset, PNG outputs; Demo_WSSS.py:387-445) --------
    img_dir_x: str = ""
    img_dir_y: str = ""
    ref_dir: str = ""
    label_dir: str = ""
    label_selected: str = "1"           # '1' changed / '0' unchanged / '-1' listed / '-2' all
    write_grey: bool = True             # per-slice density PNGs (cmap*255)
    bn_mode: str = "eval"               # 'train' = reference's intentional
                                        # train-mode-BN inference quirk
    ref_name: str = ""                  # optional: enables metrics + color map
    outdir: str = ""                    # default: dir
    cmap_name: str = "ChangeDensity"
    ext: str = ""
    stats_name: str = ""                # '' = per-mode driver default:
                                        # 'stats' (scene/whu), 'statsMS' (oscd)
    patch_size: Tuple[int, int] = (220, 220)
    overlap_padding: Tuple[int, int] = (10, 10)
    batch_size: int = 10
    gt_map: Tuple[int, int] = (1, 2)
    pre_map: Tuple[int, int] = (0, 1)
    prob_thresh: float = 0.5
    write_color: bool = True
    bilinear: bool = True
    platform: Optional[str] = None
    compute_dtype: str = "bfloat16"     # serving default; 'float32' for parity
    siamese_stats: str = "joint"        # must match the checkpoint's training
    density_dtype: str = "float32"      # uint8/bfloat16 = quantized download
    # 'auto': HBM-resident scene + ONE fused device program for the whole
    # stitched pass (zero per-batch transfers); 'stream' = pipelined tiles
    device_feed: str = "auto"
    transfer_dtype: str = ""            # e.g. 'bfloat16': halve upload bytes
    prefetch_depth: int = 2
    n_devices: int = 0                  # data-parallel tiles over a mesh
    progress: bool = True


def _restore_segmentor(cfg: InferConfig, nband: int, h: int, w: int):
    """Shared across the three serving modes: build the eval Segmentor and
    restore --smodel into it (orbax .ckpt dir or reference torch .pkl)."""
    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import restore_net_any
    from ..models import Segmentor
    from ..train.state import create_net_state

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    net_s = Segmentor(nband, bilinear=cfg.bilinear, dtype=dtype,
                      siamese_stats=cfg.siamese_stats)
    zx = np.zeros((1, h, w, nband), np.float32)
    template = create_net_state(net_s, jax.random.PRNGKey(0), (zx, zx), tx=None)
    return net_s, restore_net_any(cfg.smodel, template, kind="segmentor")


def run(cfg: InferConfig) -> Dict:
    import jax
    import jax.numpy as jnp

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.stats_name:
        cfg = dataclasses.replace(
            cfg, stats_name="statsMS" if cfg.mode == "oscd" else "stats")
    if cfg.mode == "whu":
        return run_whu(cfg)
    if cfg.mode == "oscd":
        return run_oscd(cfg)
    from ..data.datasets import ScenePairDataset
    from ..data.normalize import Normalize
    from ..data.raster import create_raster
    from ..data.stats import dataset_meanstd
    from ..eval.changemap import write_changemap_gdal
    from ..eval.evaluator import Evaluator
    from ..eval.inference import (cropped_infer, quantized_infer,
                                  run_overlapped)
    from ..eval.roc import RocCurve
    from ..data.pipeline import BatchLoader, prefetch
    from ..parallel.mesh import make_mesh, replicate_state, shard_batch
    from ..utils.runtime import enable_compile_cache

    enable_compile_cache()
    if not cfg.smodel:
        raise SystemExit("--smodel <SModel.ckpt> is required")
    outdir = cfg.outdir or cfg.dir
    os.makedirs(outdir, exist_ok=True)
    img_x = os.path.join(cfg.dir, cfg.image_x_name)
    img_y = os.path.join(cfg.dir, cfg.image_y_name)
    ref_path = os.path.join(cfg.dir, cfg.ref_name) if cfg.ref_name else None
    stem1, ext1 = os.path.splitext(cfg.image_x_name)
    stem2, _ = os.path.splitext(cfg.image_y_name)
    cmap_name = "{}{}".format(cfg.cmap_name, cfg.ext)
    out_path = os.path.join(outdir, cmap_name + ext1)
    out_color_path = os.path.join(outdir, "{}_acc_color{}".format(cmap_name, ext1))

    # -- normalizer from the shared stats caches ----------------------------
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
    nband = dataset.size()[2]

    # -- restore the segmentor ----------------------------------------------
    net_s, sstate = _restore_segmentor(cfg, nband,
                                       cfg.patch_size[1], cfg.patch_size[0])

    mesh = make_mesh(cfg.n_devices) if cfg.n_devices else None
    if mesh is not None:
        sstate = replicate_state(sstate, mesh)

    def put(batch):
        return shard_batch(batch, mesh) if mesh is not None else batch

    infer = jax.jit(lambda st, x, y: net_s.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    # fused serving path: whole-scene density in one device program, one
    # download; color/metrics/ROC vectorize over the full arrays (interiors
    # tile the scene disjointly - Demo_USSS.py:404-473 semantics)
    from ..data.device_cache import DeviceSceneCache

    if (cfg.device_feed == "auto" and mesh is None
            and DeviceSceneCache.supports(dataset)):
        cache = DeviceSceneCache(dataset, scaler)
        t0 = time.perf_counter()
        density = cache.stitched_density(infer, sstate,
                                         batch_size=cfg.batch_size,
                                         density_dtype=cfg.density_dtype)
        dataset.write_full(density)
        out = {
            "density_path": out_path,
            "color_path": None,
            "pixels": int(density.size),
            "seconds": time.perf_counter() - t0,
        }
        out["px_per_s"] = out["pixels"] / max(out["seconds"], 1e-9)
        acc = roc = None
        if ref_path:
            acc = Evaluator(num_class=len(cfg.gt_map))
            roc = RocCurve()
            cmask_full = (density > cfg.prob_thresh).astype(np.int16)
            ref_full = dataset.raster_ref.read_block()[..., 0].astype(np.int16)
            if cfg.write_color:
                xs, ys, _ = dataset.size()
                out_color = create_raster(out_color_path, xs, ys, 1, np.int32,
                                          like=dataset.raster_x)
                codes = write_changemap_gdal(
                    cmask_full[None], ref_full[None], write_color=True,
                    ref_map=cfg.gt_map, dt_map=cfg.pre_map)
                out_color.write_block(codes[0].astype(np.int32), 0, 0, band=0)
                out_color.close()
                out["color_path"] = out_color_path
            acc.add_batch_map(ref_full, cmask_full,
                              list(cfg.gt_map), list(cfg.pre_map))
            roc.add_batch(density, ref_full == cfg.gt_map[1])
        dataset.close_outputs()
        return _summarize(out, acc, roc, cfg)

    # device-side halo trim before the download (exact: the density write,
    # color map, metrics, and ROC below consume tile interiors only)
    infer = cropped_infer(infer, cfg.overlap_padding, cfg.patch_size)
    infer_q, dequant = quantized_infer(infer, cfg.density_dtype)
    pady, padx = cfg.overlap_padding[1], cfg.overlap_padding[0]

    fields = ("x", "y", "item", "ref") if ref_path else ("x", "y", "item")
    loader = BatchLoader(dataset, cfg.batch_size, fields=fields, shuffle=False)

    acc = Evaluator(num_class=len(cfg.gt_map)) if ref_path else None
    roc = RocCurve() if ref_path else None
    out_color = None
    processed = 0
    pixels = 0
    interior = dataset.interior_sizes()
    tdt = np.dtype(cfg.transfer_dtype) if cfg.transfer_dtype else None
    t0 = time.perf_counter()

    def compute(batch):
        nonlocal pixels
        db = put(batch)
        bx, by = db["x"], db["y"]
        if tdt is not None:
            bx = np.asarray(bx).astype(tdt)
            by = np.asarray(by).astype(tdt)
        for ns in range(len(batch["item"])):
            if batch["weight"][ns] > 0:
                ch, cw = interior[int(batch["item"][ns])]
                pixels += int(ch) * int(cw)
        return infer_q(sstate, bx, by)

    def process(cmap_dev, batch):
        nonlocal out_color, processed
        cmap = dequant(cmap_dev)
        cmask = (cmap > cfg.prob_thresh).astype(np.int16)
        for ns in range(len(batch["weight"])):
            if batch["weight"][ns] == 0:
                continue
            item = int(batch["item"][ns])
            dataset.write_default(cmap[ns], item)
            if acc is not None:
                # cmap/cmask are halo-cropped on device; crop the host-side
                # ref the same way so all arrays share the crop origin
                ref_hw = batch["ref"][ns][..., 0]
                if pady or padx:
                    ref_hw = ref_hw[pady:-pady or None, padx:-padx or None]
                ref_chw = ref_hw[None]
                cmask_chw = np.moveaxis(cmask[ns], -1, 0)
                if cfg.write_color:
                    if out_color is None:
                        xs, ys, _ = dataset.size()
                        out_color = create_raster(out_color_path, xs, ys, 1,
                                                  np.int32, like=dataset.raster_x)
                    codes = write_changemap_gdal(
                        cmask_chw, ref_chw, write_color=True,
                        ref_map=cfg.gt_map, dt_map=cfg.pre_map)
                    dataset.write(np.moveaxis(codes, 0, -1).astype(np.int32),
                                  item, out_color)
                y0, y1, x0, x1 = dataset.grid.interior(item)
                y1, x1 = y1 - pady, x1 - padx  # crop-origin coords
                acc.add_batch_map(
                    ref_chw[0, :y1, :x1].astype(np.int16),
                    cmask_chw[0, :y1, :x1].astype(np.int16),
                    list(cfg.gt_map), list(cfg.pre_map))
                roc.add_batch(cmap[ns, :y1, :x1, 0],
                              (ref_chw[0, :y1, :x1] == cfg.gt_map[1]))
        processed += int(np.asarray(batch["weight"]).sum())
        if cfg.progress:
            print("\rProcessing batch: {}/{}".format(processed, total),
                  end="", flush=True)

    run_overlapped(prefetch(iter(loader), cfg.prefetch_depth), compute, process)
    seconds = time.perf_counter() - t0
    if cfg.progress:
        print("\r", end="", flush=True)
    dataset.close_outputs()
    if out_color is not None and hasattr(out_color, "close"):
        out_color.close()

    out = {
        "density_path": out_path,
        "color_path": out_color_path if (acc is not None and cfg.write_color) else None,
        "pixels": pixels,
        "seconds": seconds,
        "px_per_s": pixels / max(seconds, 1e-9),
    }
    return _summarize(out, acc, roc, cfg)


def _summarize(out: Dict, acc, roc, cfg: InferConfig) -> Dict:
    if acc is not None:
        miou, ciou = acc.Mean_Intersection_over_Union()
        out.update(oa=acc.Pixel_Accuracy(), kappa=acc.Pixel_Kappa(),
                   precision=acc.Pixel_Precision_Rate(),
                   recall=acc.Pixel_Recall_Rate(), f1=acc.Pixel_F1_score(),
                   miou=miou, ciou=ciou, auc=roc.auc())
        out["evaluator"] = acc
    print(_json_line(out))
    return out


def run_whu(cfg: InferConfig) -> Dict:
    """Serve a WSSS checkpoint over a WHU slice set (PNG outputs).

    Mirrors the reference's final-inference block (Demo_WSSS.py:387-445):
    per-slice eval map via write_changemap (FN blue / FP red / TP white)
    plus optional grayscale density PNG. ``bn_mode='train'`` replicates the
    reference's intentional train-mode-BN inference ("train mode gets
    better performance", Demo_WSSS.py:389-391); the serving default 'eval'
    uses the checkpoint's running stats."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..data.datasets import WHUDataset
    from ..data.normalize import Normalize
    from ..data.pipeline import BatchLoader, prefetch
    from ..data.stats import dataset_meanstd
    from ..eval.changemap import write_changemap
    from ..eval.evaluator import Evaluator
    from ..eval.inference import run_overlapped
    from ..utils.runtime import enable_compile_cache

    enable_compile_cache()
    if not cfg.smodel:
        raise SystemExit("--smodel <SModel.ckpt> is required")
    if not (cfg.img_dir_x and cfg.img_dir_y and cfg.ref_dir and cfg.label_dir):
        raise SystemExit(
            "whu mode needs --img-dir-x/--img-dir-y/--ref-dir/--label-dir")
    out_dir = cfg.outdir or os.path.join(
        cfg.label_dir, "Detection_serve{}".format(cfg.ext))
    os.makedirs(out_dir, exist_ok=True)
    out_density_dir = out_dir + "_Density"
    if cfg.write_grey:
        os.makedirs(out_density_dir, exist_ok=True)

    # same stats caches the WSSS driver writes/reads (Demo_WSSS.py:70-78)
    stats_ds = WHUDataset(cfg.img_dir_x, cfg.img_dir_y, cfg.ref_dir,
                          cfg.label_dir, "-1")
    sp1 = os.path.join(cfg.img_dir_x, "{}_meanstd.txt".format(cfg.stats_name))
    sp2 = os.path.join(cfg.img_dir_y, "{}_meanstd.txt".format(cfg.stats_name))
    mean_x, std_x, mean_y, std_y = dataset_meanstd(sp1, sp2, stats_ds)
    scaler = Normalize(mean_x, std_x, mean_y, std_y)

    ds = WHUDataset(cfg.img_dir_x, cfg.img_dir_y, cfg.ref_dir, cfg.label_dir,
                    scale=scaler, label_selected=cfg.label_selected)
    x0 = ds[0][0]
    h, w, nband = x0.shape

    net_s, sstate = _restore_segmentor(cfg, nband, h, w)

    if cfg.bn_mode == "train":
        def fwd(st, x, y):
            out, mut = net_s.apply(st.variables, x, y, train=True,
                                   mutable=["batch_stats"])
            return out.astype(jnp.float32), st.replace(batch_stats=mut["batch_stats"])
        infer_train = jax.jit(fwd)
    else:
        infer = jax.jit(lambda st, x, y: net_s.apply(
            st.variables, x, y, train=False).astype(jnp.float32))

    loader = BatchLoader(ds, cfg.batch_size,
                         fields=("x", "y", "ref", "item", "label"), shuffle=False)
    acc = Evaluator(num_class=2)
    pixels = 0
    t0 = time.perf_counter()

    def compute(batch):
        nonlocal sstate, pixels
        n_real = int(np.asarray(batch["weight"]).sum())
        pixels += h * w * n_real
        if cfg.bn_mode == "train":
            # train-mode BN statistics must come from the REAL slices only —
            # the wrap-padded tail duplicates (weight 0, appended last by
            # BatchLoader) would skew them vs the reference's short tail
            # batch (Demo_WSSS.py:387-445). Costs one extra compile for the
            # tail shape, exactly like torch's drop_last=False.
            bx, by = batch["x"][:n_real], batch["y"][:n_real]
            cmap_dev, sstate = infer_train(sstate, bx, by)
            return cmap_dev
        return infer(sstate, batch["x"], batch["y"])

    def process(cmap_dev, batch):
        cmap = np.asarray(cmap_dev)
        cmask = (cmap > cfg.prob_thresh).astype(np.int16)
        for ns in range(len(batch["weight"])):
            if batch["weight"][ns] == 0:
                continue
            item = int(batch["item"][ns])
            change_mask = cmask[ns, :, :, 0]
            ref_mask = batch["ref"][ns][:, :, 0]
            acc.add_batch(ref_mask.astype(np.int16), change_mask)
            change_write = write_changemap(change_mask, ref_mask, cfg.write_color)
            if cfg.write_grey:
                Image.fromarray(np.uint8(cmap[ns, :, :, 0] * 255)).save(
                    os.path.join(out_density_dir, ds.get_file_name(item)))
            if change_write.ndim == 3:
                change_write = change_write.transpose((1, 2, 0))
            Image.fromarray(np.uint8(change_write)).save(
                os.path.join(out_dir, ds.get_file_name(item)))

    run_overlapped(prefetch(iter(loader), cfg.prefetch_depth), compute, process)
    seconds = time.perf_counter() - t0
    miou, ciou = acc.Mean_Intersection_over_Union()
    out = {
        "out_dir": out_dir,
        "density_dir": out_density_dir if cfg.write_grey else None,
        "pixels": pixels, "seconds": seconds,
        "px_per_s": pixels / max(seconds, 1e-9),
        "oa": acc.Pixel_Accuracy(), "kappa": acc.Pixel_Kappa(),
        "precision": acc.Pixel_Precision_Rate(),
        "recall": acc.Pixel_Recall_Rate(), "f1": acc.Pixel_F1_score(),
        "miou": miou, "ciou": ciou,
    }
    print(_json_line(out))
    out["evaluator"] = acc
    return out


def run_oscd(cfg: InferConfig) -> Dict:
    """Serve an RSSS checkpoint over a prepared OSCD multi-scene layout.

    Mirrors the reference's final-inference block (Demo_RSSS.py:449-504):
    per-scene stitched density + {TN,FN,FP,TP} color rasters written into
    each scene's ``ImagePair/`` dir, metrics over the tile interiors
    (EffRange). Scene list comes from ``--txt-name`` (default test.txt);
    normalization reuses the same per-scene ``*_statsMS.txt`` caches the
    RSSS driver writes, so a trained layout serves unchanged."""
    import jax
    import jax.numpy as jnp

    from ..data.datasets import OSCDDataset
    from ..data.pipeline import BatchLoader, prefetch
    from ..demos.demo_rsss import _scene_scalers
    from ..eval.changemap import write_changemap_gdal
    from ..eval.evaluator import Evaluator
    from ..eval.inference import (cropped_infer, quantized_infer,
                                  run_overlapped)
    from ..eval.roc import RocCurve
    from ..parallel.mesh import make_mesh, replicate_state, shard_batch
    from ..utils.runtime import enable_compile_cache

    enable_compile_cache()
    if not cfg.smodel:
        raise SystemExit("--smodel <SModel.ckpt> is required")
    scalers = _scene_scalers(cfg.dir, cfg.txt_name, cfg.patch_size, cfg.stats_name)
    dataset = OSCDDataset(cfg.dir, cfg.txt_name, scaler=scalers,
                          patch_size=cfg.patch_size,
                          overlap_padding=cfg.overlap_padding)
    total = len(dataset)
    nband = dataset.dslist[0].ds.size()[2]
    density_name = "{}{}".format(cfg.out_name_density, cfg.ext)
    color_name = "{}{}".format(cfg.out_name_binary, cfg.ext)

    net_s, sstate = _restore_segmentor(cfg, nband,
                                       cfg.patch_size[1], cfg.patch_size[0])

    mesh = make_mesh(cfg.n_devices) if cfg.n_devices else None
    if mesh is not None:
        sstate = replicate_state(sstate, mesh)

    infer = jax.jit(lambda st, x, y: net_s.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    # fused serving: one device program + one download PER SCENE (tile
    # interiors tile each scene disjointly, so full-array color/metrics
    # equal the per-EffRange accumulation exactly)
    from ..data.device_cache import DeviceSceneCache

    if (cfg.device_feed == "auto" and mesh is None
            and all(DeviceSceneCache.supports(s.ds) for s in dataset.dslist)):
        acc = Evaluator(num_class=len(cfg.gt_map))
        roc = RocCurve()
        pixels = 0
        t0 = time.perf_counter()

        def resolve(s_idx, base, dev):
            nonlocal pixels
            density = DeviceSceneCache.stitched_density_finish(
                dev, cfg.density_dtype)
            dataset.write_full_scene(s_idx, density, density_name)
            cmask_full = (density > cfg.prob_thresh).astype(np.int16)
            ref_full = np.zeros_like(cmask_full)
            if base.raster_ref is not None:
                ref_full = base.raster_ref.read_block()[..., 0].astype(np.int16)
            codes = write_changemap_gdal(
                cmask_full[None], ref_full[None], write_color=cfg.write_color,
                ref_map=cfg.gt_map, dt_map=cfg.pre_map)
            dataset.write_full_scene(s_idx, codes[0].astype(np.float32),
                                     color_name)
            acc.add_batch_map(ref_full, cmask_full,
                              list(cfg.gt_map), list(cfg.pre_map))
            roc.add_batch(density, ref_full == cfg.gt_map[1])
            pixels += int(density.size)

        # two-deep scene pipeline: upload + dispatch scene i+1, THEN resolve
        # scene i — its download/raster-writes/metrics overlap scene i+1's
        # device compute (per-scene round trips otherwise serialize on
        # high-latency links; same answers, scenes are independent)
        prev = None
        for s_idx, scene in enumerate(dataset.dslist):
            base = scene.ds
            cache = DeviceSceneCache(base, base.enhance)
            dev = cache.stitched_density_start(infer, sstate,
                                               batch_size=cfg.batch_size,
                                               density_dtype=cfg.density_dtype)
            if prev is not None:
                resolve(*prev)
            prev = (s_idx, base, dev)
        if prev is not None:
            resolve(*prev)
        seconds = time.perf_counter() - t0
        dataset.close_outputs()
        miou, ciou = acc.Mean_Intersection_over_Union()
        out = {
            "scenes": dataset.namelist,
            "density_name": density_name, "color_name": color_name,
            "pixels": pixels, "seconds": seconds,
            "px_per_s": pixels / max(seconds, 1e-9),
            "oa": acc.Pixel_Accuracy(), "kappa": acc.Pixel_Kappa(),
            "precision": acc.Pixel_Precision_Rate(),
            "recall": acc.Pixel_Recall_Rate(), "f1": acc.Pixel_F1_score(),
            "miou": miou, "ciou": ciou, "auc": roc.auc(),
            "evaluator": acc,
        }
        print(_json_line(out))
        return out

    # device-side halo trim before the download (exact; see cropped_infer)
    infer = cropped_infer(infer, cfg.overlap_padding, cfg.patch_size)
    infer_q, dequant = quantized_infer(infer, cfg.density_dtype)
    pady, padx = cfg.overlap_padding[1], cfg.overlap_padding[0]

    def make_loader():
        try:
            from ..data.pipeline import NativeOSCDBatchLoader

            return NativeOSCDBatchLoader(dataset, cfg.batch_size, shuffle=False)
        except Exception:
            return BatchLoader(dataset, cfg.batch_size,
                               fields=("x", "y", "item", "ref", "region"),
                               shuffle=False)

    acc = Evaluator(num_class=len(cfg.gt_map))
    roc = RocCurve()
    interior = dataset.interior_sizes()
    processed = 0
    pixels = 0
    t0 = time.perf_counter()

    def compute(batch):
        nonlocal pixels
        db = shard_batch(batch, mesh) if mesh is not None else batch
        for ns in range(len(batch["item"])):
            if batch["weight"][ns] > 0:
                ch, cw = interior[int(batch["item"][ns])]
                pixels += int(ch) * int(cw)
        return infer_q(sstate, db["x"], db["y"])

    def process(cmap_dev, batch):
        nonlocal processed
        cmap = dequant(cmap_dev)
        cmask = (cmap > cfg.prob_thresh).astype(np.int16)
        for ns in range(len(batch["weight"])):
            if batch["weight"][ns] == 0:
                continue
            item = int(batch["item"][ns])
            dataset.write(cmap[ns], item, density_name)
            # cmap/cmask are halo-cropped on device; crop the host ref to
            # the same origin before the color map + interior metrics
            ref_hw = batch["ref"][ns][..., 0]
            if pady or padx:
                ref_hw = ref_hw[pady:-pady or None, padx:-padx or None]
            ref_chw = ref_hw[None]
            cmask_chw = np.moveaxis(cmask[ns], -1, 0)
            # always written, like the driver (Demo_RSSS.py:486-487):
            # write_color=False yields the binary {0,1} detection raster
            codes = write_changemap_gdal(
                cmask_chw, ref_chw, write_color=cfg.write_color,
                ref_map=cfg.gt_map, dt_map=cfg.pre_map)
            dataset.write(np.moveaxis(codes, 0, -1), item, color_name)
            y0, y1, x0, x1 = dataset.eff_range(item)
            y1, x1 = y1 - pady, x1 - padx  # crop-origin coords
            acc.add_batch_map(ref_chw[0, :y1, :x1].astype(np.int16),
                              cmask_chw[0, :y1, :x1].astype(np.int16),
                              list(cfg.gt_map), list(cfg.pre_map))
            roc.add_batch(cmap[ns, :y1, :x1, 0],
                          (ref_chw[0, :y1, :x1] == cfg.gt_map[1]))
        processed += int(np.asarray(batch["weight"]).sum())
        if cfg.progress:
            print("\rProcessing batch: {}/{}".format(processed, total),
                  end="", flush=True)

    run_overlapped(prefetch(iter(make_loader()), cfg.prefetch_depth),
                   compute, process)
    seconds = time.perf_counter() - t0
    if cfg.progress:
        print("\r", end="", flush=True)
    dataset.close_outputs()

    miou, ciou = acc.Mean_Intersection_over_Union()
    out = {
        "scenes": dataset.namelist,
        "density_name": density_name, "color_name": color_name,
        "pixels": pixels, "seconds": seconds,
        "px_per_s": pixels / max(seconds, 1e-9),
        "oa": acc.Pixel_Accuracy(), "kappa": acc.Pixel_Kappa(),
        "precision": acc.Pixel_Precision_Rate(),
        "recall": acc.Pixel_Recall_Rate(), "f1": acc.Pixel_F1_score(),
        "miou": miou, "ciou": ciou, "auc": roc.auc(),
    }
    print(_json_line(out))
    out["evaluator"] = acc
    return out


def main(argv=None):
    import os

    from ..config import parse_cli

    # production serving default: 32-wide fused-stitch chunks run the MXU
    # deeper (+22-27% in-process, 11.0-11.2 vs 7.4-9.2 Mpx/s uint8 on a
    # 2048px scene — over half the ~21 Mpx/s device ceiling; round 5).
    # Values shift by <= 1 uint8 quantization step on ~6% of pixels (XLA
    # picks per-batch-size conv lowerings); FCDGAN_SERVE_BS=0 restores the
    # batch-exact chunking that is bit-identical across serve paths.
    os.environ.setdefault("FCDGAN_SERVE_BS", "32")
    run(parse_cli(InferConfig, argv))


if __name__ == "__main__":
    main()
