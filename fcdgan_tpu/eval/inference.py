"""Full-scene stitched inference: device compute overlapped with host writes.

The north-star's second headline metric is full-scene change-density px/s
(BASELINE.md). The reference's inference loop alternates GPU compute with
synchronous per-sample raster writes (Demo_USSS.py:418-465); here the loader
prefetches tile batches in background threads (native C++ assembly when
available), the jitted segmentor runs ahead on device, and stitched interior
writes drain on a dedicated writer thread — the chip never waits for the disk.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Optional

import numpy as np

from ..data.pipeline import BatchLoader, prefetch


_QUANT_CACHE: "weakref.WeakKeyDictionary" = None  # set on first use
_CROP_CACHE: "weakref.WeakKeyDictionary" = None  # set on first use


def cropped_infer(infer_fn: Callable, overlap_padding, patch_size):
    """Wrap a jitted density forward with a device-side halo trim.

    Every stitched write consumes only the tile interior (the reference
    writes ``outImage[pad : pad + slice]``, data_utils.py:213), so the halo
    rows/cols never need to cross the device->host link — at the reference
    geometry (220px patch, 10px pad) that is 17% of the download bytes.
    ``data.datasets.ScenePairDataset._write_interior`` recognises the
    cropped (patch - 2*pad) shape and indexes from the crop origin.

    Cached per (infer_fn, geometry): a fresh ``jax.jit`` each call would
    recompile on every invocation (same pitfall as ``quantized_infer``)."""
    padx, pady = overlap_padding
    pw, ph = patch_size[0], patch_size[1]
    if padx == 0 and pady == 0:
        return infer_fn
    global _CROP_CACHE
    import weakref

    if _CROP_CACHE is None:
        _CROP_CACHE = weakref.WeakKeyDictionary()
    per_fn = _CROP_CACHE.setdefault(infer_fn, {})
    key = (padx, pady, pw, ph)
    if key not in per_fn:
        import jax

        def crop(*a):
            return infer_fn(*a)[:, pady : ph - pady, padx : pw - padx]

        per_fn[key] = jax.jit(crop)
    return per_fn[key]


def quantized_infer(infer_fn: Callable, density_dtype: str = "float32"):
    """Wrap a jitted density forward with a device-side download quantizer.

    Returns ``(fn, dequant)``: ``fn`` downloads uint8/bfloat16/float32 per
    ``density_dtype``; ``dequant(device_out) -> float32 ndarray`` restores
    the density host-side. See ``stitched_inference`` for the error bounds.

    Wrappers are cached per (infer_fn, dtype): repeat calls reuse the same
    jitted executable — a fresh ``jax.jit`` each call would silently pay a
    full recompile on every ``stitched_inference`` invocation."""
    from ..parallel.multihost import to_host  # multi-host-safe download

    if density_dtype == "float32":
        return infer_fn, lambda a: to_host(a).astype(np.float32, copy=False)
    global _QUANT_CACHE
    import weakref

    if _QUANT_CACHE is None:
        _QUANT_CACHE = weakref.WeakKeyDictionary()
    per_fn = _QUANT_CACHE.setdefault(infer_fn, {})
    if density_dtype in per_fn:
        return per_fn[density_dtype]
    import jax
    import jax.numpy as jnp

    if density_dtype == "uint8":
        fn = jax.jit(lambda *a: (
            jnp.clip(infer_fn(*a), 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8))
        out = fn, lambda a: to_host(a).astype(np.float32) / 255.0
    elif density_dtype == "bfloat16":
        fn = jax.jit(lambda *a: infer_fn(*a).astype(jnp.bfloat16))
        out = fn, lambda a: to_host(a).astype(np.float32)
    else:
        raise ValueError(
            f"density_dtype must be float32/uint8/bfloat16, got {density_dtype}")
    per_fn[density_dtype] = out
    return out


def run_overlapped(batches, compute: Callable, process: Callable,
                   depth: int = 4) -> None:
    """Overlap device compute with host-side per-batch processing.

    ``compute(batch)`` dispatches async device work and returns device
    arrays; ``process(out, batch)`` runs on a writer thread and is where the
    blocking device->host download (``np.asarray``/dequant) happens — so
    batch N's download + host writes overlap batch N+1's compute. Measured
    on the axon relay this form is the win (uint8 stitched inference
    0.795 -> 1.013 Mpx/s, BASELINE.md); an explicit early
    ``copy_to_host_async`` in the compute loop instead serializes against
    the relay's dispatch channel (measured 0.497).

    Exceptions in ``process`` stop the producer at the next batch (remaining
    queued jobs are drained unprocessed so nothing deadlocks) and re-raise.

    Multi-host: JAX requires every process to enqueue collectives in the
    same order, and both ``compute`` (sync-BN all-reduces in train-mode
    forwards) and ``process`` (``to_host``'s process_allgather) may contain
    them — two threads would interleave differently per process and hang the
    pod. With ``jax.process_count() > 1`` everything runs synchronously on
    the caller's thread instead.
    """
    try:
        import jax

        multiprocess = jax.process_count() > 1
    except Exception:  # pragma: no cover
        multiprocess = False
    if multiprocess:
        for batch in batches:
            process(compute(batch), batch)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err = []

    def writer():
        while True:
            job = q.get()
            if job is sentinel:
                return
            if not err:
                try:
                    process(*job)
                except BaseException as e:
                    err.append(e)

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    try:
        for batch in batches:
            if err:  # don't burn device time on batches nobody will process
                break
            q.put((compute(batch), batch))
    finally:
        q.put(sentinel)
        wt.join()
    if err:
        raise err[0]


def stitched_inference(
    dataset,
    infer_fn: Callable,
    sstate,
    batch_size: int,
    put: Optional[Callable] = None,
    prefetch_depth: int = 2,
    writer_depth: int = 4,
    use_native: bool = True,
    transfer_dtype=None,
    density_dtype: str = "float32",
    crop_halo: bool = True,
    device_feed: str = "auto",
    scene_cache=None,
) -> dict:
    """Run the segmentor over every tile and stitch the density raster.

    ``infer_fn(sstate, x, y) -> cmap`` is the jitted eval-mode forward;
    ``put`` optionally places host batches (sharding). Returns timing stats:
    {"pixels": ..., "seconds": ..., "px_per_s": ...} (density written through
    ``dataset.write_default``).

    ``density_dtype`` quantizes the device->host density download:
    'uint8' scales [0,1] by 255 on device (4x fewer bytes, max dequant error
    1/510 ~ 0.002 on a change *density*), 'bfloat16' halves bytes exactly
    preserving thresholding at 0.5; 'float32' is the exact default. On
    low-bandwidth device->host links (the axon relay here; PCIe on real pods)
    the download dominates full-scene inference — see BASELINE.md.

    ``crop_halo`` trims the overlap halo on device before the download
    (exact — stitching only ever reads the interior; see ``cropped_infer``)."""
    # device_feed 'auto': FUSE the whole pass into one device program
    # (DeviceSceneCache.stitched_density) — no per-batch dispatch/download
    # round trips at all; one download of the finished raster. 'cache' =
    # per-batch cache feed (pipelined), 'stream' = host tile assembly.
    # The fused program always crops halos on device and picks its own
    # transfer encoding, so only take the shortcut when the request's
    # semantics match; otherwise fall through to the streaming path.
    if device_feed == "auto" and crop_halo and transfer_dtype is None:
        from ..data.device_cache import DeviceSceneCache, DeviceSceneWindowCache

        cache = scene_cache
        if cache is None and DeviceSceneCache.supports(dataset):
            cache = DeviceSceneCache(dataset, dataset.enhance)
        if cache is None and DeviceSceneWindowCache.supports(dataset):
            # scene past the HBM gate: per-slab fused programs with
            # overlapped slab upload/download (rolling-window serving)
            cache = DeviceSceneWindowCache(dataset, dataset.enhance)
        if cache is not None:
            t0 = time.perf_counter()
            density = cache.stitched_density(infer_fn, sstate,
                                             batch_size=batch_size,
                                             density_dtype=density_dtype)
            dataset.write_full(density)
            seconds = time.perf_counter() - t0
            dataset.close_outputs()
            pixels = int(np.sum(np.prod(dataset.interior_sizes(), axis=1)))
            return {"pixels": pixels, "seconds": seconds,
                    "px_per_s": pixels / max(seconds, 1e-9), "fused": True}

    if crop_halo:
        infer_fn = cropped_infer(infer_fn, dataset.overlap_padding,
                                 dataset.patch_size)
    infer_fn, dequant = quantized_infer(infer_fn, density_dtype)

    # device_feed ('auto'/'stream'): 'auto' keeps the scene HBM-resident and
    # gathers tiles on device (data/device_cache.py), so the only per-batch
    # host<->device traffic is the cropped density download — the upload leg
    # of the measured transfer bottleneck disappears entirely
    cache = None
    loader = None
    if device_feed != "stream":
        from ..data.device_cache import DeviceSceneCache

        if DeviceSceneCache.supports(dataset):
            cache = DeviceSceneCache(dataset, dataset.enhance)
            loader = cache.loader(batch_size, dataset, shuffle=False)
    normalizer = None
    if loader is None and use_native:
        try:
            from ..data.pipeline import DeviceNormalizer, NativeSceneBatchLoader

            # ship RAW integral tiles + normalize on device when possible:
            # the f32-tile upload is ~14.5 bytes/interior-px at the reference
            # geometry and the host->device link is the measured streaming
            # bottleneck (BASELINE.md); raw uint16 is 2.4x fewer bytes. Same
            # path the drivers use for training (demo_usss.py device_normalize).
            want_raw = (transfer_dtype is None
                        and NativeSceneBatchLoader.supports_device_normalize(
                            dataset))
            if want_raw:
                # build the normalizer FIRST: if it fails we still keep a
                # (f32-assembling) native loader instead of silently falling
                # back to the slow Python BatchLoader (advisor finding r4)
                try:
                    normalizer = DeviceNormalizer(dataset.enhance,
                                                  dataset.raster_x.nband)
                except Exception:
                    normalizer = None
                    want_raw = False
            loader = NativeSceneBatchLoader(dataset, batch_size, shuffle=False,
                                            device_normalize=want_raw)
        except Exception:
            loader = None
            normalizer = None
    if loader is None:
        loader = BatchLoader(dataset, batch_size, fields=("x", "y", "item", "ref"),
                             shuffle=False)

    interior = dataset.interior_sizes()  # (n_tiles, 2) core (h, w)
    pixels = 0
    t0 = time.perf_counter()

    def compute(batch):
        nonlocal pixels
        if cache is not None:
            db = cache.complete(batch)
        else:
            db = put(batch) if put is not None else batch
            if normalizer is not None:
                db = normalizer(db)  # raw tiles -> normalized f32 on device
        bx, by = db["x"], db["y"]
        if cache is None and transfer_dtype is not None:
            # halve host->device bytes; on low-bandwidth links (e.g. the axon
            # relay) transfers dominate full-scene inference
            bx = np.asarray(bx).astype(transfer_dtype)
            by = np.asarray(by).astype(transfer_dtype)
        for ns in range(len(batch["item"])):
            if batch["weight"][ns] > 0:
                ch, cw = interior[int(batch["item"][ns])]
                pixels += int(ch) * int(cw)
        return infer_fn(sstate, bx, by)

    def process(cmap_dev, batch):
        cmap = dequant(cmap_dev)  # blocks on the async copy, off-loop
        for ns in range(len(batch["item"])):
            if batch["weight"][ns] == 0:
                continue
            dataset.write_default(cmap[ns], int(batch["item"][ns]))

    run_overlapped(prefetch(iter(loader), prefetch_depth), compute, process,
                   depth=writer_depth)
    seconds = time.perf_counter() - t0
    dataset.close_outputs()
    return {"pixels": pixels, "seconds": seconds,
            "px_per_s": pixels / max(seconds, 1e-9)}
