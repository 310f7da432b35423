"""Dataset statistics with resumable txt caches.

Parity with the reference's preprocessing stat passes
(/root/reference/CommonFunc.py:246-500): per-band mean/std and min/max over a
bi-temporal dataset's tiles, **ignoring zero pixels** (the zero canvas padding
and nodata regions; ``idx = sum(x, bands) != 0``, CommonFunc.py:446,481), with
pixel-count-weighted combination across tiles and an (n-1) variance
denominator. Results are cached to txt files in the exact reference format
("mean: a b c\\nstd: a b c" / "max: ...\\nmin: ...",
CommonFunc.py:380-402,326-348) so caches interoperate both ways.

Tiles come from any iterable yielding (x, y, ...) with (h, w, nband) arrays —
the reference's torch Dataset protocol replaced by plain numpy."""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np


def _write_two_rows(path: str, name_a: str, row_a: Sequence[float],
                    name_b: str, row_b: Sequence[float]) -> None:
    with open(path, "w") as f:
        f.write(name_a + ":")
        for v in row_a:
            f.write(" {}".format(v))
        f.write("\n")
        f.write(name_b + ":")
        for v in row_b:
            f.write(" {}".format(v))
        f.write("\n")


def _read_two_rows(path: str) -> Tuple[List[float], List[float]]:
    with open(path, "r") as f:
        contents = f.readlines()
    a = [float(x) for x in contents[0].split()[1:]]
    b = [float(x) for x in contents[1].split()[1:]]
    return a, b


def _nonzero_mask(x: np.ndarray) -> np.ndarray:
    """Valid-pixel mask: pixels whose band sum is nonzero (CommonFunc.py:446)."""
    return x.sum(axis=-1) != 0


def dataset_mean(dataset) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel-count-weighted per-band means of both temporal images
    (parity: Dataset_mean, CommonFunc.py:436-465)."""
    sums_x = sums_y = None
    npix = 0
    for i in range(len(dataset)):
        item = dataset[i]
        x, y = np.asarray(item[0], np.float64), np.asarray(item[1], np.float64)
        idx = _nonzero_mask(x)
        n = int(idx.sum())
        if sums_x is None:
            sums_x = np.zeros(x.shape[-1])
            sums_y = np.zeros(y.shape[-1])
        if n == 0:
            continue
        sums_x += x[idx].sum(axis=0)
        sums_y += y[idx].sum(axis=0)
        npix += n
    return sums_x / npix, sums_y / npix


def dataset_std(dataset, mean_x: np.ndarray, mean_y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted per-band stds with (n-1) denominator
    (parity: Dataset_std, CommonFunc.py:467-500)."""
    var_x = np.zeros_like(mean_x)
    var_y = np.zeros_like(mean_y)
    npix = 0
    for i in range(len(dataset)):
        item = dataset[i]
        x, y = np.asarray(item[0], np.float64), np.asarray(item[1], np.float64)
        idx = _nonzero_mask(x)
        n = int(idx.sum())
        if n == 0:
            continue
        var_x += ((x[idx] - mean_x) ** 2).sum(axis=0)
        var_y += ((y[idx] - mean_y) ** 2).sum(axis=0)
        npix += n
    return np.sqrt(var_x / (npix - 1)), np.sqrt(var_y / (npix - 1))


def dataset_meanstd(txt_path1: str, txt_path2: str, dataset):
    """Cached mean/std of a bi-temporal dataset
    (parity: Dataset_meanstd, CommonFunc.py:373-434). Returns
    (meanX, stdX, meanY, stdY) as float lists."""
    if not (os.path.exists(txt_path1) and os.path.exists(txt_path2)):
        mean_x, mean_y = dataset_mean(dataset)
        std_x, std_y = dataset_std(dataset, mean_x, mean_y)
        _write_two_rows(txt_path1, "mean", mean_x.tolist(), "std", std_x.tolist())
        _write_two_rows(txt_path2, "mean", mean_y.tolist(), "std", std_y.tolist())
        return mean_x.tolist(), std_x.tolist(), mean_y.tolist(), std_y.tolist()
    mean_x, std_x = _read_two_rows(txt_path1)
    mean_y, std_y = _read_two_rows(txt_path2)
    return mean_x, std_x, mean_y, std_y


def dataset_maxmin(txt_path1: str, txt_path2: str, dataset):
    """Cached per-band [min, max] of both images over nonzero pixels
    (parity: Dataset_maxmin, CommonFunc.py:294-370). Returns two lists of
    [min, max] pairs."""
    if not (os.path.exists(txt_path1) and os.path.exists(txt_path2)):
        mm1 = mm2 = None
        for i in range(len(dataset)):
            item = dataset[i]
            x, y = np.asarray(item[0], np.float64), np.asarray(item[1], np.float64)
            idx = _nonzero_mask(x)
            if not idx.any():
                continue
            xv, yv = x[idx], y[idx]
            lo1, hi1 = xv.min(axis=0), xv.max(axis=0)
            lo2, hi2 = yv.min(axis=0), yv.max(axis=0)
            if mm1 is None:
                mm1 = np.stack([lo1, hi1], axis=1)
                mm2 = np.stack([lo2, hi2], axis=1)
            else:
                mm1[:, 0] = np.minimum(mm1[:, 0], lo1)
                mm1[:, 1] = np.maximum(mm1[:, 1], hi1)
                mm2[:, 0] = np.minimum(mm2[:, 0], lo2)
                mm2[:, 1] = np.maximum(mm2[:, 1], hi2)
        _write_two_rows(txt_path1, "max", mm1[:, 1].tolist(), "min", mm1[:, 0].tolist())
        _write_two_rows(txt_path2, "max", mm2[:, 1].tolist(), "min", mm2[:, 0].tolist())
        return mm1.tolist(), mm2.tolist()
    hi1, lo1 = _read_two_rows(txt_path1)
    hi2, lo2 = _read_two_rows(txt_path2)
    return (
        [[lo, hi] for lo, hi in zip(lo1, hi1)],
        [[lo, hi] for lo, hi in zip(lo2, hi2)],
    )


def raster_maxmin(txt_path: str, img_path: str):
    """Cached per-band [min, max] over one raster's nonzero pixels
    (parity: GDALmaxmin, CommonFunc.py:246-291)."""
    from .raster import open_raster

    if not os.path.exists(txt_path):
        r = open_raster(img_path)
        mm = []
        for b in range(r.nband):
            band = r.read_band(b)
            vals = band[band != 0]
            mm.append([float(vals.min()), float(vals.max())])
        _write_two_rows(txt_path, "max", [v[1] for v in mm], "min", [v[0] for v in mm])
        return mm
    hi, lo = _read_two_rows(txt_path)
    return [[l, h] for l, h in zip(lo, hi)]
