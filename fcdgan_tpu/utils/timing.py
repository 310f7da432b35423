"""Timing / progress utilities: human-readable ETA lines and a stopwatch.

``time_show`` keeps value parity with the reference progress formatter
(/root/reference/CommonFunc.py:226-243): seconds -> "1d 2h 3m 4.5s".
``Stopwatch`` adds the device-accurate timing the reference lacks
(SURVEY.md section 5): it blocks on JAX arrays so compile/dispatch overlap
doesn't corrupt step timings.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


def time_show(seconds: float) -> str:
    """Seconds -> '1d 2h 3m 4.5s' (parity: CommonFunc.py:226-243)."""
    t = seconds
    time_d = time_h = time_m = ""
    time_s = "{:.1f}s".format(t % 60)
    if int(t / 60) > 0:
        t = int(t / 60)
        time_m = "{}m ".format(t % 60)
        if int(t / 60) > 0:
            t = int(t / 60)
            time_h = "{}h ".format(t % 60)
            if int(t / 24) > 0:
                t = int(t / 24)
                time_d = "{}d ".format(t)
    return "{}{}{}{}".format(time_d, time_h, time_m, time_s)


class Stopwatch:
    """Wall-clock timer that optionally synchronises on device arrays."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.elapsed = 0.0

    def start(self) -> "Stopwatch":
        self._t0 = time.perf_counter()
        return self

    def stop(self, *sync_arrays) -> float:
        for a in sync_arrays:
            if hasattr(a, "block_until_ready"):
                a.block_until_ready()
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed


@contextlib.contextmanager
def maybe_profile(logdir: Optional[str]):
    """jax.profiler trace scope when a logdir is given, no-op otherwise."""
    if logdir:
        import jax

        with jax.profiler.trace(logdir):
            yield
    else:
        yield


def progress_line(processed: int, total: int, per_iter_s: float, remaining_s: float) -> str:
    """One '\\r' progress line (format parity: Demo_USSS.py:175-176)."""
    return (
        "\rProcessing batch: {}/{}; Processing speed per iter: {}; "
        "Processing time remaining: {}".format(
            processed, total, time_show(per_iter_s), time_show(remaining_s)
        )
    )
