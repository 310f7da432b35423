"""Dataclass configs for the three drivers, defaults mirroring the reference.

The reference's "config system" is the constants block at the top of each demo
script (Demo_USSS.py:33-76, Demo_WSSS.py:31-66, Demo_RSSS.py:31-67;
README.md:17-26 documents editing those lines). Here each mode gets a
dataclass with those exact defaults plus TPU-native extras (mesh size, dtype,
MS-SSIM level override for small tiles, VGG weight path), overridable from the
command line via :func:`parse_cli`."""

from __future__ import annotations

import argparse
import dataclasses
import typing
from typing import Optional, Tuple


@dataclasses.dataclass
class USSSConfig:
    """Unsupervised mode (defaults: Demo_USSS.py:33-76)."""

    dir: str = "/data"
    image_x_name: str = "T1.tif"
    image_y_name: str = "T2.tif"
    ref_name: str = "ref.tif"
    outdir: Optional[str] = None  # None -> dir
    ext: str = ""
    cmap_name: str = "ChangeDensity"
    stats_name: str = "stats"

    init_num_epochs_g: int = 50
    init_num_epochs_s: int = 50
    num_epochs: int = 100
    learning_rate: float = 0.0002
    batch_size: int = 10
    # linear large-batch LR rule: multiply every phase schedule by this
    # (e.g. 4.0 when raising --batch-size 10 -> 40; see BASELINE.md
    # batch sweep and the bs40 accuracy A/B)
    lr_scale: float = 1.0
    # large-batch schedule clock: every phase evaluates its per-epoch LR
    # curve at epoch/lr_epoch_scale, stretching warm-up/decay by this factor
    # in epoch units — at k-fold larger batch each epoch has k-fold fewer
    # updates, so the reference-shaped curve otherwise decays k-fold faster
    # per UPDATE (see experiments/batch_scale_ab.py; 1.0 = reference parity)
    lr_epoch_scale: float = 1.0

    perception_weight: float = 0.4
    l1_weight: float = 0.65
    ssim_weight: float = 0.0
    perception_per_band: bool = True
    perception_layer: int = 1

    patch_size: Tuple[int, int] = (220, 220)
    overlap_padding: Tuple[int, int] = (10, 10)
    gt_map: Tuple[int, int] = (1, 2)
    pre_map: Tuple[int, int] = (0, 1)
    prob_thresh: float = 0.5
    write_color: bool = True
    discriminator_continuous: bool = True
    tips: str = "eval_patch"

    msssim_weights: Optional[Tuple[float, ...]] = None
    platform: Optional[str] = None  # force jax platform ('cpu'/'tpu'); None = default
    compute_dtype: str = "float32"  # 'bfloat16' = mixed precision (f32 losses/BN)
    siamese_stats: str = "joint"    # 'split' = reference per-branch BN stats
    density_dtype: str = "float32"  # uint8/bfloat16 = quantized density download
    # 'auto'/'on'/'off': ship RAW integral tiles, normalize + pad-mask on
    # device (2-4x fewer upload bytes; <=1 ulp vs host normalize)
    device_normalize: str = "auto"
    # 'auto'/'on'/'off': HBM-resident raw scene, on-device tile gather +
    # normalize — per-step upload drops to (item, weight) int32 pairs
    # (data/device_cache.py; auto gates on FCDGAN_SCENE_CACHE_MAX_MB)
    scene_cache: str = "auto"
    # partial final batch: 'short' = run it at its true size (the reference
    # torch drop_last=False semantics — BN batch stats see only real samples;
    # no duplicate compute, one extra compiled shape), 'pad' = wrap-pad to
    # the fixed shape with weight-0 duplicates (required under a device
    # mesh), 'auto' = short single-process, pad under mesh/multi-host
    tail: str = "auto"
    remat: bool = False             # recompute forwards in backward (bigger batches)
    ssim_metric: bool = True        # False skips the MS-SSIM metric forward
                                    # entirely (only legal at ssim_weight 0;
                                    # the reported ssim_loss becomes 0)
    debug_nans: bool = False        # jax.debug_nans for fault isolation
    profile_dir: Optional[str] = None  # jax.profiler trace dir (tensorboard)
    seed: int = 0
    checkpoint_every: int = 0  # >0: resumable checkpoint every N epochs
    resume: bool = False       # resume from the periodic checkpoint if present
    n_devices: Optional[int] = None
    # multi-host (one process per host): jax.distributed settings
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    vgg_npz: Optional[str] = None
    require_vgg: bool = False  # hard-fail if no pretrained VGG16 npz is found
    prefetch_depth: int = 2
    log_tensorboard: bool = True
    save_checkpoints: bool = True
    progress: bool = True


@dataclasses.dataclass
class WSSSConfig:
    """Weakly supervised mode (defaults: Demo_WSSS.py:31-66)."""

    img_dir_x: str = ""
    img_dir_y: str = ""
    ref_dir: str = ""
    label_dir: str = ""
    out_g_model_dir: str = ""
    ext: str = ""
    out_dir: Optional[str] = None  # None -> {label_dir}/Detection_WSS{ext}

    init_num_epochs_g: int = 50
    num_epochs: int = 50
    learning_rate: float = 0.0005
    unc_batch_size: int = 50
    batch_size: int = 15
    # linear large-batch LR rule: multiply every phase schedule by this
    # (e.g. 4.0 when raising --batch-size 10 -> 40; see BASELINE.md
    # batch sweep and the bs40 accuracy A/B)
    lr_scale: float = 1.0
    # large-batch schedule clock: every phase evaluates its per-epoch LR
    # curve at epoch/lr_epoch_scale, stretching warm-up/decay by this factor
    # in epoch units — at k-fold larger batch each epoch has k-fold fewer
    # updates, so the reference-shaped curve otherwise decays k-fold faster
    # per UPDATE (see experiments/batch_scale_ab.py; 1.0 = reference parity)
    lr_epoch_scale: float = 1.0
    prob_thresh: float = 0.6
    tips: str = "train"

    perception_weight: float = 0.5
    ssim_weight: float = 0.0
    perception_per_band: bool = False
    perception_layer: int = 1

    g_weight: float = 0.2
    l1_weight: float = 1.6
    d_weight: float = 1.0
    nc_weight: float = 1.5

    write_grey: bool = True
    write_color: bool = True
    model_g_reuse: bool = True
    discriminator_continuous: bool = True
    stats_name: str = "stats"
    # True: re-pick a random unchanged partner per __getitem__ instead of the
    # per-epoch order_reset pairing (reference: data_utils.py:611-617)
    random_assign: bool = False

    # random-erase augmentation on the training datasets
    # (reference wiring: CommonFunc.py:78-141, Demo_RSSS.py:96,128)
    random_eraser: bool = False
    eraser_regions: int = 1
    erase_thresh: float = 0.3

    msssim_weights: Optional[Tuple[float, ...]] = None
    platform: Optional[str] = None  # force jax platform ('cpu'/'tpu'); None = default
    compute_dtype: str = "float32"  # 'bfloat16' = mixed precision (f32 losses/BN)
    siamese_stats: str = "joint"    # 'split' = reference per-branch BN stats
    density_dtype: str = "float32"  # uint8/bfloat16 = quantized density download
    # 'auto'/'on'/'off': HBM-resident raw slice stacks, on-device gather +
    # normalize — per-step upload drops to (c_item, nc_item, weight) int32
    # rows (data/device_cache.py; auto gates on FCDGAN_SLICE_CACHE_MAX_MB,
    # disabled under random_assign / random_eraser / multi-host)
    slice_cache: str = "auto"
    # partial final batch: 'short' (reference torch drop_last=False; no
    # wrap-duplicate compute or BN-stat duplicates) | 'pad' | 'auto'
    # (= short single-process, pad under mesh/multi-host)
    tail: str = "auto"
    remat: bool = False             # recompute forwards in backward (bigger batches)
    ssim_metric: bool = True        # False skips the MS-SSIM metric forward
                                    # entirely (only legal at ssim_weight 0;
                                    # the reported ssim_loss becomes 0)
    debug_nans: bool = False        # jax.debug_nans for fault isolation
    profile_dir: Optional[str] = None  # jax.profiler trace dir (tensorboard)
    seed: int = 0
    checkpoint_every: int = 0  # >0: resumable checkpoint every N epochs
    resume: bool = False       # resume from the periodic checkpoint if present
    n_devices: Optional[int] = None
    # multi-host (one process per host): jax.distributed settings
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    vgg_npz: Optional[str] = None
    require_vgg: bool = False  # hard-fail if no pretrained VGG16 npz is found
    prefetch_depth: int = 2
    log_tensorboard: bool = True
    save_checkpoints: bool = True
    progress: bool = True


@dataclasses.dataclass
class RSSSConfig:
    """Regional supervised mode (defaults: Demo_RSSS.py:31-67)."""

    img_dir: str = ""
    out_g_model_dir: str = ""
    txt_name: str = "train.txt"
    test_txt_name: str = "test.txt"
    out_name_density: str = "density"
    out_name_binary: str = "color"
    ext: str = ""

    init_num_epochs_g: int = 50
    num_epochs: int = 100
    learning_rate: float = 0.00005
    init_batch_size: int = 20
    batch_size: int = 12
    # linear large-batch LR rule: multiply every phase schedule by this
    # (e.g. 4.0 when raising --batch-size 10 -> 40; see BASELINE.md
    # batch sweep and the bs40 accuracy A/B)
    lr_scale: float = 1.0
    # large-batch schedule clock: every phase evaluates its per-epoch LR
    # curve at epoch/lr_epoch_scale, stretching warm-up/decay by this factor
    # in epoch units — at k-fold larger batch each epoch has k-fold fewer
    # updates, so the reference-shaped curve otherwise decays k-fold faster
    # per UPDATE (see experiments/batch_scale_ab.py; 1.0 = reference parity)
    lr_epoch_scale: float = 1.0

    patch_size: Tuple[int, int] = (200, 200)
    overlap_padding: Tuple[int, int] = (10, 10)
    gt_map: Tuple[int, int] = (1, 2)
    pre_map: Tuple[int, int] = (0, 1)
    prob_thresh: float = 0.5
    tips: str = ""

    perception_weight: float = 0.1
    ssim_weight: float = 0.0
    perception_per_band: bool = True
    perception_layer: int = 1

    l1_weight: float = 0.02
    g_weight: float = 0.5
    d_weight: float = 1.0
    r_weight: float = 2.0

    write_color: bool = True
    model_g_reuse: bool = True
    discriminator_continuous: bool = True
    stats_name: str = "statsMS"
    # 'train' = reference parity: the per-epoch test eval runs train-mode BN
    # (netS.eval() is never called in the adversarial loop, Demo_RSSS.py:415)
    # and the BN running stats absorb the test batches; 'eval' = clean
    # running-stats evaluation with no test leakage
    test_eval_bn: str = "train"

    # random-erase augmentation on the training dataset
    # (reference wiring: CommonFunc.py:78-141, Demo_RSSS.py:96,128)
    random_eraser: bool = False
    eraser_regions: int = 1
    erase_thresh: float = 0.3

    msssim_weights: Optional[Tuple[float, ...]] = None
    platform: Optional[str] = None  # force jax platform ('cpu'/'tpu'); None = default
    compute_dtype: str = "float32"  # 'bfloat16' = mixed precision (f32 losses/BN)
    siamese_stats: str = "joint"    # 'split' = reference per-branch BN stats
    density_dtype: str = "float32"  # uint8/bfloat16 = quantized density download
    # 'auto'/'on'/'off': HBM-resident raw tile stacks for both the train and
    # test scene lists, per-scene normalize + pad-mask on device — per-batch
    # upload drops to (item, weight) int32 pairs (data/device_cache.py;
    # auto gates on FCDGAN_TILE_CACHE_MAX_MB, disabled under random_eraser)
    tile_cache: str = "auto"
    # partial final batch: 'short' (reference torch drop_last=False; no
    # wrap-duplicate compute or BN-stat duplicates) | 'pad' | 'auto'
    # (= short single-process, pad under mesh/multi-host)
    tail: str = "auto"
    remat: bool = False             # recompute forwards in backward (bigger batches)
    ssim_metric: bool = True        # False skips the MS-SSIM metric forward
                                    # entirely (only legal at ssim_weight 0;
                                    # the reported ssim_loss becomes 0)
    debug_nans: bool = False        # jax.debug_nans for fault isolation
    profile_dir: Optional[str] = None  # jax.profiler trace dir (tensorboard)
    seed: int = 0
    checkpoint_every: int = 0  # >0: resumable checkpoint every N epochs
    resume: bool = False       # resume from the periodic checkpoint if present
    n_devices: Optional[int] = None
    # multi-host (one process per host): jax.distributed settings
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    vgg_npz: Optional[str] = None
    require_vgg: bool = False  # hard-fail if no pretrained VGG16 npz is found
    prefetch_depth: int = 2
    log_tensorboard: bool = True
    save_checkpoints: bool = True
    progress: bool = True


def _parse_bool(s: str) -> bool:
    return s.lower() in ("1", "true", "yes")


def _tuple_parser(tp):
    """Comma-separated tuple parser, casting per the annotation's element
    types (``Tuple[int, int]`` casts each to int; ``Tuple[float, ...]`` casts
    all to float; untyped tuples infer int-vs-float per token)."""
    el = typing.get_args(tp)

    def parse(s: str):
        toks = [t for t in s.split(",") if t != ""]
        if el and el[-1] is Ellipsis:
            return tuple(el[0](t) for t in toks)
        if el and len(el) == len(toks):
            return tuple(cast(t) for cast, t in zip(el, toks))
        return tuple(float(v) if "." in v else int(v) for v in toks)

    return parse


def _unwrap_optional(tp):
    """Optional[X] / X | None -> X (the non-None member)."""
    if typing.get_origin(tp) in (typing.Union, getattr(__import__("types"), "UnionType", ())):
        non_none = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(non_none) == 1:
            return non_none[0]
    return tp


def parse_cli(config_cls, argv=None):
    """Build a config from CLI flags: every dataclass field becomes --field.

    Field types are RESOLVED from the annotations via
    ``typing.get_type_hints`` (not substring-matched against the annotation
    string), so ``Optional[float]``, ``Optional[Tuple[float, ...]]`` etc.
    parse by their real type — ``--msssim-weights 0.5,0.5`` is a float tuple
    and ``--n-devices 8`` an int even though both default to ``None``."""
    hints = typing.get_type_hints(config_cls)
    ap = argparse.ArgumentParser(description=config_cls.__doc__)
    for f in dataclasses.fields(config_cls):
        name = "--" + f.name.replace("_", "-")
        tp = _unwrap_optional(hints[f.name])
        if tp is bool:
            parser = _parse_bool
        elif typing.get_origin(tp) is tuple or tp is tuple:
            parser = _tuple_parser(tp)
        elif tp in (int, float, str):
            parser = tp
        else:
            raise TypeError(
                f"{config_cls.__name__}.{f.name}: unsupported CLI field type "
                f"{hints[f.name]!r} — add a parser branch in parse_cli")
        ap.add_argument(name, type=parser, default=f.default)
    args = ap.parse_args(argv)
    return config_cls(**{f.name: getattr(args, f.name) for f in dataclasses.fields(config_cls)})
