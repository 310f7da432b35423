"""Synthetic dataset generators for tests, smoke runs and benchmarks.

Produces miniature datasets in the exact on-disk layouts the three drivers
consume (SURVEY.md section 4 "golden-behavior tests"):

  * :func:`make_usss_scene` — one bi-temporal GeoTIFF pair + {1,2}-coded
    reference raster (the Demo_USSS input contract, Demo_USSS.py:47-50,64),
  * :func:`make_whu_dataset` — before/after/Label slice dirs + label.txt
    (the BuildingProcess.py output contract, BuildingProcess.py:150-167),
  * :func:`make_oscd_dataset` — per-scene ImagePair dirs with ENVI pairs,
    ``{name}-cm.tif`` ({1,2} coded) and ``{name}-region.tif`` + train/test txts
    (the OSCDProcess.py output contract, OSCDProcess.py:22-30,75-78).

Change structure: image Y = smooth band-mixed function of X outside change
rectangles, plus a strong offset inside them — learnable by the generator,
detectable by the segmentor."""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np

from .envi import write_envi
from .tiff import TiffWriter

Rect = Tuple[int, int, int, int]  # (x, y, w, h)

GT = (300000.0, 10.0, 0.0, 5000000.0, 0.0, -10.0)
PROJ = "SYNTHETIC/UTM"


def _scene_pair(rng, ysize: int, xsize: int, nband: int, rects: Sequence[Rect]):
    """(x, y, change_mask): y is a smooth transform of x + change offsets."""
    base = rng.normal(100.0, 30.0, size=(ysize, xsize, nband))
    # smooth spatial structure
    for _ in range(2):
        base[1:] = 0.5 * base[1:] + 0.5 * base[:-1]
        base[:, 1:] = 0.5 * base[:, 1:] + 0.5 * base[:, :-1]
    x = base
    mix = np.eye(nband) * 0.9 + 0.1 / nband
    y = x @ mix + 5.0 + rng.normal(0, 1.0, size=x.shape)
    mask = np.zeros((ysize, xsize), np.uint8)
    for rx, ry, rw, rh in rects:
        mask[ry : ry + rh, rx : rx + rw] = 1
        y[ry : ry + rh, rx : rx + rw] += 80.0
    return (
        np.clip(x, 1.0, None).astype(np.float32),
        np.clip(y, 1.0, None).astype(np.float32),
        mask,
    )


def make_usss_scene(out_dir: str, xsize: int = 96, ysize: int = 96, nband: int = 3,
                    rects: Sequence[Rect] = ((20, 24, 18, 14), (60, 60, 16, 20)),
                    seed: int = 0, dtype=np.float32) -> dict:
    """``dtype``: sample type of the bi-temporal rasters (np.uint16 mimics
    real Sentinel-2/aerial scenes and exercises the raw-upload
    device_normalize path; values are rounded before writing)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    x, y, mask = _scene_pair(rng, ysize, xsize, nband, rects)
    dtype = np.dtype(dtype)
    if np.issubdtype(dtype, np.integer):
        x = np.round(x).astype(dtype)
        y = np.round(y).astype(dtype)
    paths = {
        "x": os.path.join(out_dir, "T1.tif"),
        "y": os.path.join(out_dir, "T2.tif"),
        "ref": os.path.join(out_dir, "ref.tif"),
    }
    with TiffWriter(paths["x"], xsize, ysize, nband, dtype, GT, PROJ) as w:
        w.write_block(x)
    with TiffWriter(paths["y"], xsize, ysize, nband, dtype, GT, PROJ) as w:
        w.write_block(y)
    # reference coded {1 unchanged, 2 changed} (Demo_USSS.py:64 gt_map=[1,2])
    with TiffWriter(paths["ref"], xsize, ysize, 1, np.uint8, GT, PROJ) as w:
        w.write_block((mask + 1).astype(np.uint8))
    paths["mask"] = mask
    return paths


def make_whu_dataset(out_dir: str, n_changed: int = 4, n_unchanged: int = 6,
                     size: int = 48, seed: int = 0) -> dict:
    from PIL import Image

    dirs = {k: os.path.join(out_dir, k) for k in ("before", "after", "Label")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_changed + n_unchanged):
        changed = i < n_changed
        rects = [(size // 4, size // 4, size // 3, size // 3)] if changed else []
        x, y, mask = _scene_pair(rng, size, size, 3, rects)
        name = f"{i}_0.tif"
        Image.fromarray(np.clip(x, 0, 255).astype(np.uint8)).save(os.path.join(dirs["before"], name))
        Image.fromarray(np.clip(y, 0, 255).astype(np.uint8)).save(os.path.join(dirs["after"], name))
        Image.fromarray((mask * 255).astype(np.uint8)).save(os.path.join(dirs["Label"], name))
        lines.append(f"{name},0,0,{1 if changed else 0}")
    with open(os.path.join(out_dir, "label.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return {"root": out_dir, **dirs, "label_txt": os.path.join(out_dir, "label.txt")}


def make_oscd_dataset(out_dir: str, train_scenes: Sequence[str] = ("alpha", "beta"),
                      test_scenes: Sequence[str] = ("gamma",),
                      xsize: int = 64, ysize: int = 64, nband: int = 4,
                      region_expand: int = 6, seed: int = 0) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for scene in list(train_scenes) + list(test_scenes):
        d = os.path.join(out_dir, scene, "ImagePair")
        os.makedirs(d, exist_ok=True)
        rects = [(10, 12, 14, 12), (40, 36, 12, 16)]
        x, y, mask = _scene_pair(rng, ysize, xsize, nband, rects)
        write_envi(os.path.join(d, f"{scene}_20160120"), x, geotransform=GT)
        write_envi(os.path.join(d, f"{scene}_20180328"), y, geotransform=GT)
        # cm coded {1 unchanged, 2 changed} (OSCDProcess.py:57)
        with TiffWriter(os.path.join(d, f"{scene}-cm.tif"), xsize, ysize, 1, np.uint8, GT) as w:
            w.write_block((mask + 1).astype(np.uint8))
        region = np.zeros_like(mask)
        for rx, ry, rw, rh in rects:
            x0 = max(rx - region_expand, 0)
            y0 = max(ry - region_expand, 0)
            x1 = min(rx + rw + region_expand, xsize)
            y1 = min(ry + rh + region_expand, ysize)
            region[y0:y1, x0:x1] = 255
        with TiffWriter(os.path.join(d, f"{scene}-region.tif"), xsize, ysize, 1, np.uint8, GT) as w:
            w.write_block(region)
    with open(os.path.join(out_dir, "train.txt"), "w") as f:
        f.write(",".join(train_scenes) + "\n")
    with open(os.path.join(out_dir, "test.txt"), "w") as f:
        f.write(",".join(test_scenes) + "\n")
    return {"root": out_dir, "train_txt": "train.txt", "test_txt": "test.txt"}
