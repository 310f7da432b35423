"""Confusion-matrix evaluator — host (numpy) and on-device (JAX) paths.

API parity with the reference's ``Evaluator`` (/root/reference/metrics.py:6-85),
including the ``add_batch_map`` value-indirection needed because USSS/RSSS
references encode unchanged/changed as {1, 2} while predictions use {0, 1}
(metrics.py:67-72; gt_map=[1,2], pre_map=[0,1] at Demo_USSS.py:64-65).

TPU-native addition: :func:`confusion_update` accumulates the (C, C) matrix
*inside* a jitted step (optionally psum-reduced over a data-parallel axis),
replacing the reference's per-sample host loop (Demo_USSS.py:238-248) — the
matrix crosses to the host once per epoch instead of once per sample.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class Evaluator:
    """Accumulating confusion-matrix metrics (parity: metrics.py:6-85)."""

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.confusion_matrix = np.zeros((num_class, num_class), dtype=np.float64)

    # -- metrics -------------------------------------------------------------
    def Pixel_Accuracy(self) -> float:
        return np.diag(self.confusion_matrix).sum() / self.confusion_matrix.sum()

    def Pixel_Kappa(self) -> float:
        po = self.Pixel_Accuracy()
        pe = np.dot(
            self.confusion_matrix.sum(axis=0), self.confusion_matrix.sum(axis=1)
        ) / np.square(self.confusion_matrix.sum())
        return (po - pe) / (1 - pe)

    def Pixel_Accuracy_Class(self):
        acc = np.diag(self.confusion_matrix) / self.confusion_matrix.sum(axis=1)
        return np.nanmean(acc), acc

    def Pixel_Precision_Rate(self) -> float:
        assert self.confusion_matrix.shape[0] == 2
        cm = self.confusion_matrix
        return cm[1, 1] / (cm[0, 1] + cm[1, 1])

    def Pixel_Recall_Rate(self) -> float:
        assert self.confusion_matrix.shape[0] == 2
        cm = self.confusion_matrix
        return cm[1, 1] / (cm[1, 0] + cm[1, 1])

    def Pixel_F1_score(self) -> float:
        rec = self.Pixel_Recall_Rate()
        pre = self.Pixel_Precision_Rate()
        return 2 * rec * pre / (rec + pre)

    def Mean_Intersection_over_Union(self) -> Tuple[float, float]:
        cm = self.confusion_matrix
        iou = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        ciou = float(iou[1])
        return float(np.nanmean(iou)), ciou

    def Frequency_Weighted_Intersection_over_Union(self) -> float:
        cm = self.confusion_matrix
        freq = cm.sum(axis=1) / cm.sum()
        iu = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        return float((freq[freq > 0] * iu[freq > 0]).sum())

    # -- ingest ----------------------------------------------------------------
    def _generate_matrix(self, gt: np.ndarray, pre: np.ndarray) -> np.ndarray:
        mask = (gt >= 0) & (gt < self.num_class)
        label = self.num_class * gt[mask].astype(int) + pre[mask].astype(int)
        count = np.bincount(label, minlength=self.num_class**2)
        return count.reshape(self.num_class, self.num_class)

    def _generate_matrix_bymap(self, gt, pre, gt_map, pre_map) -> np.ndarray:
        cm = np.zeros((self.num_class, self.num_class))
        for i, gv in enumerate(gt_map):
            for j, pv in enumerate(pre_map):
                cm[i, j] = np.sum((gt == gv) & (pre == pv))
        return cm

    def add_batch(self, gt: np.ndarray, pre: np.ndarray) -> None:
        assert gt.shape == pre.shape
        self.confusion_matrix += self._generate_matrix(gt, pre)

    def add_batch_map(self, gt, pre, gt_map=(0, 1), pre_map=(0, 1)) -> None:
        assert gt.shape == pre.shape
        assert len(gt_map) == len(pre_map) == self.num_class
        self.confusion_matrix += self._generate_matrix_bymap(gt, pre, gt_map, pre_map)

    def add_confusion(self, cm) -> None:
        """Merge an externally accumulated (C, C) matrix (device epoch totals)."""
        self.confusion_matrix += np.asarray(cm, dtype=np.float64)

    def reset(self) -> None:
        self.confusion_matrix = np.zeros((self.num_class, self.num_class))


# ---------------------------------------------------------------------------
# On-device confusion accumulation (jit-safe, psum-able)
# ---------------------------------------------------------------------------


def confusion_update(
    gt: jnp.ndarray,
    pre: jnp.ndarray,
    gt_map: Sequence[float],
    pre_map: Sequence[float],
    valid: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """(C, C) confusion matrix of one batch, entirely on device.

    ``gt``/``pre`` are any-shape arrays of class codes; ``gt_map[i]`` /
    ``pre_map[j]`` are the codes for row i / column j (value indirection as
    in metrics.py:67-72). ``valid`` is an optional same-shape {0,1} mask for
    interior-only evaluation. With ``axis_name`` the matrix is psum-reduced
    over a data-parallel mesh axis so each replica holds the global count.
    """
    c = len(gt_map)
    assert len(pre_map) == c
    gt = gt.reshape(-1)
    pre = pre.reshape(-1)
    w = jnp.ones_like(gt, dtype=jnp.float32) if valid is None else valid.reshape(-1).astype(jnp.float32)
    rows = jnp.stack([(gt == g).astype(jnp.float32) for g in gt_map])  # (C, N)
    cols = jnp.stack([(pre == p).astype(jnp.float32) for p in pre_map])  # (C, N)
    cm = jnp.einsum("in,jn,n->ij", rows, cols, w)
    if axis_name is not None:
        cm = jax.lax.psum(cm, axis_name)
    return cm
