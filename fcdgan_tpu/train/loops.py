"""Epoch-loop plumbing shared by the three drivers.

Hosts the pieces every reference driver repeats: weighted epoch averages
(``aver += loss * bs / total``, e.g. Demo_USSS.py:161-165), the '\\r' progress
ETA line (:175-176), and device->host metric collection with a single
confusion-matrix transfer per epoch (the reference's per-sample host eval loop
collapsed onto the device, SURVEY.md section 2g)."""

from __future__ import annotations

import time
from typing import Dict

import numpy as np

from ..eval.evaluator import Evaluator
from ..utils.timing import progress_line


class EpochAverages:
    """Weighted running averages of per-batch scalar metrics."""

    def __init__(self, total_size: int):
        self.total = max(total_size, 1)
        self.sums: Dict[str, float] = {}
        self.confusion = None

    def update(self, metrics: Dict, batch_weight_sum: float) -> None:
        for k, v in metrics.items():
            if k == "confusion":
                cm = np.asarray(v)
                self.confusion = cm if self.confusion is None else self.confusion + cm
            else:
                self.sums[k] = self.sums.get(k, 0.0) + float(v) * batch_weight_sum / self.total

    def __getitem__(self, k: str) -> float:
        return self.sums.get(k, 0.0)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.sums)

    def evaluator(self, num_class: int = 2) -> Evaluator:
        ev = Evaluator(num_class)
        if self.confusion is not None:
            ev.add_confusion(self.confusion)
        return ev


class Progress:
    """Per-batch '\\r' progress/ETA line (format parity: Demo_USSS.py:175-176)."""

    def __init__(self, total_size: int, epochs_remaining_fn, enabled: bool = True):
        self.total = max(total_size, 1)
        self.enabled = enabled
        self.processed = 0
        self._epochs_remaining_fn = epochs_remaining_fn
        self._t0 = None

    def start_batch(self):
        self._t0 = time.time()

    def end_batch(self, batch_size: int):
        self.processed += batch_size
        if not self.enabled or self._t0 is None:
            return
        dt = time.time() - self._t0
        per_iter = dt / max(batch_size, 1) * self.total
        remaining = per_iter * (
            self._epochs_remaining_fn() + (1 - self.processed / self.total)
        )
        print(progress_line(self.processed, self.total, per_iter, remaining),
              end="", flush=True)

    def finish(self):
        if self.enabled:
            print("\r", end="", flush=True)


def metrics_line(epoch: int, total_epochs: int, av: EpochAverages, keys) -> str:
    parts = ", ".join("{}: {:.4f}".format(k, av[k]) for k in keys)
    return "Epochs: {}/{}, {}".format(epoch + 1, total_epochs, parts)


def accuracy_line(epoch: int, total_epochs: int, ev: Evaluator) -> str:
    miou, ciou = ev.Mean_Intersection_over_Union()
    return (
        "Epochs: {}/{}, Overall Accuracy: {:.4f}, Kappa: {:.4f}, "
        "Precision Rate: {:.4f}, Recall Rate: {:.4f}, F1:{:.4f}, "
        "mIOU:{:.4f}, cIoU:{:.4f}".format(
            epoch + 1, total_epochs, ev.Pixel_Accuracy(), ev.Pixel_Kappa(),
            ev.Pixel_Precision_Rate(), ev.Pixel_Recall_Rate(),
            ev.Pixel_F1_score(), miou, ciou,
        )
    )
