"""Change-map colorizers for evaluation rasters.

Value parity with the reference's two writers:
  * :func:`write_changemap` — PIL/PNG path (WSSS), RGB uint8 coding:
    FN blue, FP red, TP white; or grayscale {0,255} when not colored
    (/root/reference/CommonFunc.py:39-57).
  * :func:`write_changemap_gdal` — raster path (USSS/RSSS), single band coded
    {0 TN implicit, 1 FN, 2 FP, 3 TP} with gt/pred value indirection
    (/root/reference/CommonFunc.py:59-75).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def write_changemap(change_mask: np.ndarray, ref_mask: np.ndarray, write_color: bool = False) -> np.ndarray:
    """(H, W) binary masks -> (3, H, W) RGB codes or (H, W) grayscale."""
    if write_color:
        out = np.zeros((3, change_mask.shape[0], change_mask.shape[1]))
        fn = (change_mask == 0) & (ref_mask == 1)
        out[2, fn] = 255  # missed detection: blue
        fp = (change_mask == 1) & (ref_mask == 0)
        out[0, fp] = 255  # false detection: red
        tp = (change_mask == 1) & (ref_mask == 1)
        out[0, tp] = 255
        out[1, tp] = 255
        out[2, tp] = 255  # true detection: white
        return out
    out = np.zeros((change_mask.shape[0], change_mask.shape[1]))
    out[change_mask == 1] = 255
    return out


def write_changemap_gdal(
    change_mask: np.ndarray,
    ref_mask: np.ndarray,
    write_color: bool = False,
    ref_map: Sequence[int] = (0, 1),
    dt_map: Sequence[int] = (0, 1),
) -> np.ndarray:
    """(1, H, W) coded masks -> (1, H, W) {0 TN, 1 FN, 2 FP, 3 TP} raster."""
    out = np.zeros((1, change_mask.shape[1], change_mask.shape[2]))
    if write_color:
        fn = (change_mask[0] == dt_map[0]) & (ref_mask[0] == ref_map[1])
        out[0, fn] = 1
        fp = (change_mask[0] == dt_map[1]) & (ref_mask[0] == ref_map[0])
        out[0, fp] = 2
        tp = (change_mask[0] == dt_map[1]) & (ref_mask[0] == ref_map[1])
        out[0, tp] = 3
    else:
        out[0, change_mask[0] == dt_map[1]] = 1
    return out
