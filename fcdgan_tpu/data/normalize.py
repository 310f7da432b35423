"""Per-band normalizers applied at tile-read time.

Functional counterparts of the reference's preprocessing transforms
(/root/reference/CommonFunc.py:144-224): SCALE (min-max to [0,1]), SCALE_NORM
(min-max to an arbitrary range) and NORMALIZE (zero-mean/unit-std — the one
every demo actually uses, e.g. Demo_USSS.py:95). Each holds separate stats per
temporal image, selected by ``switch`` (1 = image X, 2 = image Y), exactly
like the reference's switch argument (CommonFunc.py:151,208).

Inputs/outputs are (h, w, nband) numpy arrays (NHWC tile layout)."""

from __future__ import annotations

from typing import Sequence

import numpy as np


class _TwoImageTransform:
    def _check(self, x: np.ndarray, n_stats: int, switch: int):
        if x.shape[-1] > n_stats:
            raise ValueError(
                "The input channel doesn't match the stats list "
                f"(bands={x.shape[-1]}, stats={n_stats}, switch={switch})"
            )


class Scale(_TwoImageTransform):
    """Per-band min-max scaling to [0, 1] (parity: SCALE, CommonFunc.py:144-167)."""

    def __init__(self, scale_list1: Sequence[Sequence[float]], scale_list2: Sequence[Sequence[float]]):
        self.scale_list1 = [list(map(float, s)) for s in scale_list1]
        self.scale_list2 = [list(map(float, s)) for s in scale_list2]

    def __call__(self, x: np.ndarray, switch: int = 1) -> np.ndarray:
        stats = self.scale_list1 if switch == 1 else self.scale_list2
        self._check(x, len(stats), switch)
        lo = np.array([s[0] for s in stats[: x.shape[-1]]], x.dtype)
        hi = np.array([s[1] for s in stats[: x.shape[-1]]], x.dtype)
        return (x - lo) / (hi - lo)


class ScaleNorm(_TwoImageTransform):
    """Min-max to a target range (parity: SCALE_NORM, CommonFunc.py:170-196)."""

    def __init__(self, scale_list1, scale_list2, scale=(-1.0, 1.0)):
        self.scale_list1 = [list(map(float, s)) for s in scale_list1]
        self.scale_list2 = [list(map(float, s)) for s in scale_list2]
        self.scale = (float(scale[0]), float(scale[1]))

    def __call__(self, x: np.ndarray, switch: int = 1) -> np.ndarray:
        stats = self.scale_list1 if switch == 1 else self.scale_list2
        self._check(x, len(stats), switch)
        lo = np.array([s[0] for s in stats[: x.shape[-1]]], x.dtype)
        hi = np.array([s[1] for s in stats[: x.shape[-1]]], x.dtype)
        a, b = self.scale
        return (b - a) * (x - lo) / (hi - lo) + a


class Normalize(_TwoImageTransform):
    """Per-band (x - mean) / std, separate stats per temporal image
    (parity: NORMALIZE, CommonFunc.py:199-224)."""

    def __init__(self, meansX, stdX, meansY, stdY):
        self.meansX = [float(v) for v in meansX]
        self.stdX = [float(v) for v in stdX]
        self.meansY = [float(v) for v in meansY]
        self.stdY = [float(v) for v in stdY]

    def __call__(self, x: np.ndarray, switch: int = 1) -> np.ndarray:
        means = self.meansX if switch == 1 else self.meansY
        stds = self.stdX if switch == 1 else self.stdY
        self._check(x, len(means), switch)
        m = np.array(means[: x.shape[-1]], x.dtype)
        s = np.array(stds[: x.shape[-1]], x.dtype)
        return (x - m) / s
