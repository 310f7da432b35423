"""Epoch-loop plumbing shared by the three drivers.

Hosts the pieces every reference driver repeats: weighted epoch averages
(``aver += loss * bs / total``, e.g. Demo_USSS.py:161-165), the '\\r' progress
ETA line (:175-176), and device->host metric collection with a single
download per epoch (the reference's per-sample host eval loop collapsed onto
the device, SURVEY.md section 2g).

``EpochAverages`` is the hot-loop sync-point killer: per-batch metrics from
the jitted steps are accumulated ON DEVICE by one tiny jitted add (async
dispatch, donated accumulator) and downloaded once when the epoch-summary
code first reads a value. A ``float()`` per metric per batch — the obvious
implementation — is a blocking device round trip each (~tens of ms on
remote-relay links, serializing the step pipeline everywhere). A two-deep
in-flight window keeps host dispatch from running arbitrarily ahead of the
device (bounds live batch buffers) while still overlapping step N+1's
dispatch/upload with step N's compute."""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, Optional

import numpy as np

from ..eval.evaluator import Evaluator
from ..utils.timing import progress_line

_ACC = None  # lazily jitted device accumulators (shared across instances)
_INIT = None
_PACK = None
_HWRITE = None  # lazily jitted history-row write (DeferredEpochEnd)


def _acc_fns():
    global _ACC, _INIT, _PACK
    if _ACC is None:
        import jax
        import jax.numpy as jnp

        def scaled(metrics, scale):
            out = {}
            for k, v in metrics.items():
                v = jnp.asarray(v)
                if k == "confusion":
                    # counts are integral (exact in f32 per batch); int32
                    # epoch sums stay exact to 2^31 pixels where f32 would
                    # round past 2^24
                    out[k] = (v + 0.5).astype(jnp.int32)
                else:
                    out[k] = v.astype(jnp.float32) * scale
            return out

        _INIT = jax.jit(scaled)
        _ACC = jax.jit(
            lambda sums, metrics, scale: jax.tree.map(
                lambda a, b: a + b, sums, scaled(metrics, scale)
            ),
            donate_argnums=(0,),
        )

        def pack(sums):
            # one flat f32 vector so the epoch download is ONE transfer:
            # on a remote-relay link `device_get` pays ~a round trip PER
            # BUFFER (~8 leaves x 30-40 ms measured = the entire driver-vs-
            # step gap, ab_round3.jsonl headline `epoch_sync_ms` 268.8).
            # int32 counts ride exactly via bitcast, not a value cast.
            leaves = []
            for k in sorted(sums):
                v = sums[k]
                if v.dtype == jnp.int32:
                    v = jax.lax.bitcast_convert_type(v, jnp.float32)
                leaves.append(jnp.ravel(v))
            return jnp.concatenate(leaves)

        _PACK = jax.jit(pack)
    return _INIT, _ACC, _PACK


def _hist_write():
    global _HWRITE
    if _HWRITE is None:
        import jax
        from jax import lax

        # append one packed row into the shared 1-D history buffer at a
        # dynamic offset; the buffer is donated so the write is in-place
        _HWRITE = jax.jit(
            lambda buf, row, off: lax.dynamic_update_slice(buf, row, (off,)),
            donate_argnums=(0,),
        )
    return _HWRITE


class EpochAverages:
    """Weighted running averages of per-batch metrics, accumulated on device.

    ``update`` never blocks on device results (beyond the bounded in-flight
    window); reading any value (``av[k]``, ``as_dict``, ``evaluator``,
    ``.confusion``) downloads the epoch totals once."""

    #: fold device totals into float64/int64 host sums every N batches:
    #: bounds f32 scalar-accumulation drift (~sqrt(N)*eps) and keeps int32
    #: confusion totals far from 2^31 (safe up to ~8.4M counted pixels per
    #: batch = 220px tiles at batch 173), at one small download per N batches
    FOLD_EVERY = 256

    def __init__(self, total_size: int, inflight: Optional[int] = None):
        if inflight is None:
            import os

            # deeper windows hide more host latency behind device execution
            # at the cost of more live batch buffers (each ~the batch bytes)
            inflight = int(os.environ.get("FCDGAN_INFLIGHT", "2"))
        self.total = max(total_size, 1)
        self._dev = None
        self._dev_n = 0
        self._pending = None
        self._folded: Optional[Dict] = None
        self._host: Optional[Dict[str, float]] = None
        self._window: deque = deque()
        self._inflight = max(int(inflight), 0)
        #: set by DeferredEpochEnd.attach: resolving callback that downloads
        #: the shared history buffer (clears itself on distribution)
        self._resolve = None

    def update(self, metrics: Dict, batch_weight_sum: float) -> None:
        if self._resolve is not None:
            raise RuntimeError(
                "EpochAverages was handed to DeferredEpochEnd.attach/schedule;"
                " its totals live in the shared history buffer — no further"
                " update() is possible"
            )
        init, acc, _ = _acc_fns()
        scale = batch_weight_sum / self.total
        if self._dev is None:
            self._dev = init(metrics, scale)
        else:
            self._dev = acc(self._dev, metrics, scale)
        self._dev_n += 1
        self._host = None
        if self._dev_n >= self.FOLD_EVERY:
            self._fold()
        if self._inflight:
            # backpressure: wait for the step from `inflight` batches ago
            # before dispatching further (its metrics transitively depend on
            # that whole step), keeping at most inflight+1 batches live.
            # NB: hold a step OUTPUT (never donated), not the accumulator
            # (donated into the next add). block_until_ready is a no-op on
            # non-jax leaves and must propagate real device errors.
            self._window.append(next(iter(metrics.values())))
            if len(self._window) > self._inflight:
                import jax

                jax.block_until_ready(self._window.popleft())

    def _pack(self):
        """Flatten the device totals into one f32 vector (single transfer)
        plus the host-side unpack recipe; clears the device accumulator."""
        _, _, pack = _acc_fns()
        shapes = [(k, tuple(np.shape(v)), str(v.dtype))
                  for k, v in sorted(self._dev.items())]
        packed = pack(dict(self._dev))
        self._dev = None
        self._dev_n = 0
        return packed, shapes

    def start_read(self) -> None:
        """Kick off the epoch download without blocking: packs the totals
        and starts the device->host copy. A later read folds the result.
        No-op when nothing is pending."""
        if self._dev is None or self._pending is not None:
            return
        packed, shapes = self._pack()
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass
        self._pending = (packed, shapes)

    def _fold(self) -> None:
        """Download any packed pending read AND current device totals,
        folding both into the 64-bit host sums."""
        if self._pending is not None:
            packed, shapes = self._pending
            self._pending = None
            self._fold_packed(packed, shapes)
        if self._dev is not None:
            self._fold_packed(*self._pack())

    def _fold_packed(self, packed, shapes) -> None:
        flat = np.asarray(packed)
        if self._folded is None:
            self._folded = {}
        off = 0
        for k, shp, dt in shapes:
            n = int(np.prod(shp)) if shp else 1
            v = flat[off:off + n]
            off += n
            if dt == "int32":
                v = v.view(np.int32).astype(np.int64).reshape(shp)
                prev = self._folded.get(k)
                self._folded[k] = v if prev is None else prev + v
            elif n == 1:
                self._folded[k] = self._folded.get(k, 0.0) + float(v[0])
            else:
                v = v.astype(np.float64).reshape(shp)
                prev = self._folded.get(k)
                self._folded[k] = v if prev is None else prev + v

    def _finalize(self) -> Dict:
        if self._host is None:
            if self._resolve is not None:
                # totals were moved into a DeferredEpochEnd history buffer;
                # resolving downloads the whole buffer (one transfer) and
                # folds this instance's row (clearing ``_resolve``)
                self._resolve()
            self._fold()
            self._host = dict(self._folded or {})
        return self._host

    @property
    def confusion(self):
        return self._finalize().get("confusion")

    def __getitem__(self, k: str) -> float:
        return self._finalize().get(k, 0.0)

    def as_dict(self) -> Dict[str, float]:
        return {k: v for k, v in self._finalize().items() if k != "confusion"}

    def evaluator(self, num_class: int = 2) -> Evaluator:
        ev = Evaluator(num_class)
        cm = self.confusion
        if cm is not None:
            ev.add_confusion(cm)
        return ev


class DeferredEpochEnd:
    """Batch epoch-summary work (metric prints, tensorboard rows) up to
    ``depth`` epochs so their metric downloads collapse into ONE device->host
    transfer, instead of paying a fixed relay round trip (~30 ms measured on
    the axon link, size-independent for these few hundred bytes) every epoch.

    Each ``schedule``/``attach`` moves the epoch's packed totals from its
    ``EpochAverages`` into a shared 1-D device history buffer (one tiny
    donated ``dynamic_update_slice`` — async, never drains the step queue).
    ``flush`` downloads the whole buffer once, distributes the rows back to
    their ``EpochAverages``, and runs the queued summary closures in order.
    The reference prints inline each epoch (Demo_USSS.py:366-372) — content
    and ORDER are identical here, only the wall-clock moment of the print
    shifts: a window closed at epoch E resolves when the NEXT window closes,
    so a summary can lag up to ``2 * depth`` epochs (the aging is deliberate —
    resolving a just-closed window would download while its epochs' steps may
    still be queued, draining the device pipeline). An ``atexit`` hook
    flushes any queued summaries on interpreter shutdown so an interrupted
    run still prints every completed epoch.

    NB the one-epoch predecessor of this class prefetched via
    ``av.start_read()``; on the axon relay ``copy_to_host_async`` on a
    still-queued array can degrade catastrophically (measured: a later
    ``np.asarray`` blocking for minutes), and even when healthy it pays one
    round trip per epoch. The history buffer pays one round trip per
    ``depth`` epochs and never issues a host copy before the epoch summary
    actually needs values.

    Only used when live '\\r' progress lines are off (``enabled``): with
    them on, next-epoch progress output would interleave ahead of this
    epoch's summary. Closures MUST NOT capture donated device state (the
    steps donate their input states, so those buffers are deleted one step
    later on TPU) — drivers flush-and-run inline on checkpoint epochs
    instead. ``flush`` MUST be called before any other stdout or phase
    transition."""

    def __init__(self, enabled: bool = True, depth: Optional[int] = None):
        import atexit
        import os
        import weakref

        if depth is None:
            depth = int(os.environ.get("FCDGAN_DEFER_DEPTH", "16"))
        self.enabled = enabled
        self.depth = max(int(depth), 1)
        self._cap = 4096
        # FIFO of history windows; the last one is open for appends. A
        # window closed at epoch E resolves when the NEXT window closes
        # (~depth epochs later) — by then the device finished E's steps
        # long ago, so its single download costs one round trip, never a
        # pipeline drain.
        self._windows = [self._new_window()]
        # abnormal termination (crash/KeyboardInterrupt that unwinds to exit)
        # must not swallow queued epoch summaries: best-effort flush at exit
        ref = weakref.ref(self)

        def _flush_at_exit():
            inst = ref()
            if inst is None:
                return
            try:
                inst.flush()
            except Exception:
                pass  # donated buffers may be gone mid-crash; don't mask exit

        atexit.register(_flush_at_exit)

    @staticmethod
    def _new_window():
        return {"buf": None, "cap": 0, "off": 0, "rows": [], "fns": []}

    def attach(self, av: "EpochAverages") -> None:
        """Move ``av``'s device totals into the open history window (no host
        sync); reading ``av`` later resolves through one shared download."""
        if not self.enabled:
            return
        if av._pending is not None:
            # a legacy start_read is already in flight for this av; leave
            # that transfer to its own fold
            return
        w = self._windows[-1]
        if av._dev is None:
            av._resolve = self._resolve_all_rows
            w["rows"].append((av, 0, 0, None))
            return
        packed, shapes = av._pack()
        n = int(packed.size)
        self._cap = max(self._cap, n)
        if w["buf"] is not None and w["off"] + n > w["cap"]:
            self._close_window()
            w = self._windows[-1]
        import jax.numpy as jnp

        if w["buf"] is None:
            w["buf"] = jnp.zeros((self._cap,), jnp.float32)
            w["cap"] = self._cap
        w["buf"] = _hist_write()(w["buf"], packed, jnp.int32(w["off"]))
        av._resolve = self._resolve_all_rows
        w["rows"].append((av, w["off"], n, shapes))
        w["off"] += n

    def schedule(self, av: "EpochAverages", fn) -> None:
        if not self.enabled:
            fn()
            return
        self.attach(av)
        w = self._windows[-1]
        w["fns"].append(fn)
        if len(w["fns"]) >= self.depth:
            self._close_window()

    def _close_window(self) -> None:
        self._windows.append(self._new_window())
        while len(self._windows) > 2:  # run windows aged one full cycle
            self._run_window(self._windows.pop(0))

    def _resolve_rows(self, w) -> None:
        """Download one window's buffer (ONE transfer), distribute rows."""
        rows, w["rows"] = w["rows"], []
        buf, w["buf"], w["off"] = w["buf"], None, 0
        flat = np.asarray(buf) if buf is not None else None
        for av, off, n, shapes in rows:
            av._resolve = None
            if n:
                av._fold_packed(flat[off:off + n], shapes)

    def _resolve_all_rows(self) -> None:
        # early read of a deferred EpochAverages: materialize every pending
        # window's rows (summary closures stay queued, order unchanged)
        for w in self._windows:
            self._resolve_rows(w)

    def _run_window(self, w) -> None:
        self._resolve_rows(w)
        for fn in w["fns"]:
            fn()

    def flush(self) -> None:
        windows, self._windows = self._windows, [self._new_window()]
        for w in windows:
            self._run_window(w)


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
