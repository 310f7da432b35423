"""ROC / AUC over change-density maps — an extension beyond the reference.

The reference has no ROC/AUC (SURVEY.md §2e note); the driver metadata's
configs mention "metrics.py ROC/AUC/kappa scoring", so the framework provides
it as a histogram-based accumulator: density values are bucketed into K
threshold bins, positive/negative counts accumulate per bin (on host or on
device via :func:`roc_histogram_update`, psum-able like the confusion matrix),
and the ROC curve / AUC come from the cumulative counts. Exact for densities
quantized to the bin resolution; K=1024 gives ~1e-3 AUC resolution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def roc_histogram_update(
    density: jnp.ndarray,
    gt_positive: jnp.ndarray,
    n_bins: int = 1024,
    valid: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """(2, n_bins) histogram of density values split by ground truth.

    ``density`` in [0, 1]; ``gt_positive`` a same-shape {0,1} mask; ``valid``
    optional mask (interior / padded-sample weighting)."""
    d = jnp.clip(density.reshape(-1), 0.0, 1.0)
    pos = gt_positive.reshape(-1).astype(jnp.float32)
    w = jnp.ones_like(pos) if valid is None else valid.reshape(-1).astype(jnp.float32)
    idx = jnp.minimum((d * n_bins).astype(jnp.int32), n_bins - 1)
    hist_pos = jnp.zeros((n_bins,), jnp.float32).at[idx].add(pos * w)
    hist_neg = jnp.zeros((n_bins,), jnp.float32).at[idx].add((1 - pos) * w)
    out = jnp.stack([hist_neg, hist_pos])
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


class RocCurve:
    """Accumulates (2, K) histograms; yields ROC points and AUC."""

    def __init__(self, n_bins: int = 1024):
        self.n_bins = n_bins
        self.hist = np.zeros((2, n_bins), np.float64)

    def add_histogram(self, hist) -> None:
        self.hist += np.asarray(hist, np.float64)

    def add_batch(self, density: np.ndarray, gt_positive: np.ndarray,
                  valid: Optional[np.ndarray] = None) -> None:
        d = np.clip(np.asarray(density).reshape(-1), 0.0, 1.0)
        pos = np.asarray(gt_positive).reshape(-1).astype(bool)
        w = np.ones_like(d) if valid is None else np.asarray(valid).reshape(-1).astype(np.float64)
        idx = np.minimum((d * self.n_bins).astype(np.int64), self.n_bins - 1)
        self.hist[1] += np.bincount(idx[pos], weights=w[pos], minlength=self.n_bins)
        self.hist[0] += np.bincount(idx[~pos], weights=w[~pos], minlength=self.n_bins)

    def curve(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(fpr, tpr, thresholds), thresholds descending from 1 to 0."""
        neg, pos = self.hist[0], self.hist[1]
        # predictions >= threshold t are positive; sweep bins high -> low
        tp = np.cumsum(pos[::-1])
        fp = np.cumsum(neg[::-1])
        p = max(pos.sum(), 1e-12)
        n = max(neg.sum(), 1e-12)
        tpr = np.concatenate([[0.0], tp / p])
        fpr = np.concatenate([[0.0], fp / n])
        thresholds = np.concatenate([[1.0], (np.arange(self.n_bins)[::-1]) / self.n_bins])
        return fpr, tpr, thresholds

    def auc(self) -> float:
        fpr, tpr, _ = self.curve()
        return float(np.trapezoid(tpr, fpr))

    def reset(self) -> None:
        self.hist[:] = 0
