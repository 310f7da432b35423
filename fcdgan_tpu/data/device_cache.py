"""Device-resident scene cache: upload the raw scene ONCE, gather tiles on TPU.

The reference re-reads and re-normalizes every tile from disk on every epoch
(`/root/reference/data_utils.py:91-140` inside the DataLoader loop). The
round-2 `device_normalize` path already moved normalization on device but
still shipped every tile's raw bytes per step — on a link with per-transfer
latency (the measured driver bottleneck here; and non-trivial even on PCIe)
that upload serializes against the ~0.1 s step.

For USSS the scene pair is STATIC across the whole run, so the TPU-native
design is: upload the zero-padded raw scene (native dtype) to HBM once, and
make each training batch a tiny (B, 2) int32 upload of (item, weight). Tile
extraction (static-size dynamic slices at precomputed canvas origins — see
``TileGrid.canvas_origins``), per-band ``(v - mean)/std`` normalization, and
zero-pad masking all run in one jitted device pass, bit-identical to the
host/native tile paths (asserted in tests/test_device_cache.py).

Memory: the padded scene costs ``~2 * H * W * C * itemsize`` of HBM (e.g. a
10000x10000 4-band uint16 pair = 1.6 GB); ``fits()`` gates the auto path
(FCDGAN_SCENE_CACHE_MAX_MB, default 4096) with streaming fallback.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .pipeline import Batch, BatchLoader


class IndexBatchLoader(BatchLoader):
    """BatchLoader that yields only (item, weight) — same epoch RNG stream
    and wrap-padded tail as the full loaders, no host tile assembly."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, tail: str = "pad"):
        super().__init__(dataset, batch_size, fields=("item",),
                         shuffle=shuffle, seed=seed, tail=tail)

    def __iter__(self):
        for idx, weight in self._index_batches():
            yield Batch(item=np.asarray(idx, np.int64), weight=weight)


_SCENE_PREP = None  # module-level jits: normalizers are TRACED args and
_STITCH_RUN = None  # geometry is static, so same-geometry scenes (the OSCD
_WINDOW_RUN = None  # multi-scene case) share ONE compiled program instead of
_ACC_RUN = None     # re-tracing per scene, and the persistent compile cache
#                     hits across runs (constants no longer baked per scene)


_SPLIT_SLAB = None


def _split_slab(packed, cx: int, cy: int, cr: int):
    """Split a channel-packed slab upload back into (px, py, pref) on device
    (one fused dispatch; pref is None when the dataset has no reference)."""
    global _SPLIT_SLAB
    if _SPLIT_SLAB is None:
        import functools

        import jax

        @functools.partial(jax.jit, static_argnums=(1, 2, 3))
        def split(p, cx, cy, cr):
            px = p[..., :cx]
            py = p[..., cx:cx + cy]
            pref = p[..., cx + cy:cx + cy + cr] if cr else None
            return px, py, pref

        _SPLIT_SLAB = split
    return _SPLIT_SLAB(packed, cx, cy, cr)


def _scene_jits():
    global _SCENE_PREP, _STITCH_RUN, _WINDOW_RUN, _ACC_RUN
    if _SCENE_PREP is not None:
        return _SCENE_PREP, _STITCH_RUN
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(0,))
    def prep(geom, arr, px, py, pref, origins, wins, norm, row0):
        # ``row0``: traced row offset subtracted from the global canvas
        # origins — 0 for a whole-scene resident cache, the slab's first
        # padded row for the rolling-window cache (px/py/pref then hold
        # only that slab's rows)
        ph, pw = geom
        mx, sx, my, sy = norm
        idx = arr[:, 0]
        weight = arr[:, 1].astype(jnp.float32)
        org = origins[idx] - jnp.stack([row0, jnp.zeros_like(row0)])  # (B, 2)
        win = wins[idx]     # (B, 4) (x0, y0, w, h)

        def slc(plane, o):
            return jax.lax.dynamic_slice(
                plane, (o[0], o[1], 0), (ph, pw, plane.shape[2]))

        x_raw = jax.vmap(slc, in_axes=(None, 0))(px, org)
        y_raw = jax.vmap(slc, in_axes=(None, 0))(py, org)
        # same masked-normalize math as pipeline.DeviceNormalizer
        row = jax.lax.broadcasted_iota(jnp.int32, (1, ph, 1, 1), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pw, 1), 2)
        x0 = win[:, 0][:, None, None, None]
        y0 = win[:, 1][:, None, None, None]
        ww = win[:, 2][:, None, None, None]
        wh = win[:, 3][:, None, None, None]
        mask = (row >= y0) & (row < y0 + wh) & (col >= x0) & (col < x0 + ww)
        xf = (x_raw.astype(jnp.float32) - mx) / sx
        yf = (y_raw.astype(jnp.float32) - my) / sy
        zero = jnp.float32(0)
        x = jnp.where(mask, xf, zero)
        y = jnp.where(mask, yf, zero)
        if pref is None:
            ref = jnp.zeros((arr.shape[0], ph, pw, 1), jnp.float32)
        else:
            ref = jax.vmap(slc, in_axes=(None, 0))(pref, org)
            ref = ref.astype(jnp.float32)
        return x, y, ref, idx, weight

    @functools.partial(jax.jit, static_argnums=(0, 1, 2))
    def run(infer_fn, geom, density_dtype, chunks, px, py, pref, origins,
            wins, norm, st):
        ph, pw, padx, pady, sy_, sx_, hp2, wp2, hs, ws = geom

        def body(i, out):
            ids = chunks[i]
            arr = jnp.stack([ids, jnp.ones_like(ids)], axis=1)
            x, y, _, _, _ = prep((ph, pw), arr, px, py, pref, origins,
                                 wins, norm, jnp.int32(0))
            d = infer_fn(st, x, y).astype(jnp.float32)
            core = jax.lax.slice(d, (0, pady, padx, 0),
                                 (d.shape[0], pady + sy_, padx + sx_, 1))
            org = origins[ids]

            def write(j, out):
                return jax.lax.dynamic_update_slice(
                    out, core[j], (org[j, 0], org[j, 1], 0))

            return jax.lax.fori_loop(0, d.shape[0], write, out)

        out = jax.lax.fori_loop(
            0, chunks.shape[0], body,
            jnp.zeros((hp2 - 2 * pady, wp2 - 2 * padx, 1), jnp.float32))
        out = out[:hs, :ws, 0]
        if density_dtype == "uint8":
            out = (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        elif density_dtype == "bfloat16":
            out = out.astype(jnp.bfloat16)
        return out

    @functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(10,))
    def run_acc(infer_fn, geom, density_dtype, chunks, px, py, pref, origins,
                wins, norm, canvas, st, row0):
        """Per-slab fused stitcher writing into a DEVICE-RESIDENT scene
        canvas (round 5): gathers tiles from the resident slab (origins
        offset by ``row0``), runs the segmentor, and writes each tile's
        interior core at its GLOBAL output origin into ``canvas`` — the
        same disjoint-interior stitching as the whole-scene ``run``, spread
        across per-slab programs chained on the donated canvas. Quantization
        happens at write time (per-pixel values identical to quantizing the
        finished raster, writes disjoint/idempotent), so the canvas lives in
        the download dtype and the WHOLE scene downloads once at the end —
        zero per-slab device->host round trips (round-4 gap: per-slab
        downloads capped window serving at 0.80 Mpx/s, ab_round4.jsonl).

        Also returns a 1-element probe sliced from the canvas: fetching it
        is the program-completion barrier that bounds in-flight slabs
        (block_until_ready returns early on the relay — ROADMAP round 4)."""
        ph, pw, padx, pady, sy_, sx_ = geom

        def body(i, out):
            ids = chunks[i]
            arr = jnp.stack([ids, jnp.ones_like(ids)], axis=1)
            x, y, _, _, _ = prep((ph, pw), arr, px, py, pref, origins,
                                 wins, norm, row0)
            d = infer_fn(st, x, y).astype(jnp.float32)
            core = jax.lax.slice(d, (0, pady, padx, 0),
                                 (d.shape[0], pady + sy_, padx + sx_, 1))
            if density_dtype == "uint8":
                core = (jnp.clip(core, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
            elif density_dtype == "bfloat16":
                core = core.astype(jnp.bfloat16)
            org = origins[ids]

            def write(j, out):
                return jax.lax.dynamic_update_slice(
                    out, core[j], (org[j, 0], org[j, 1], 0))

            return jax.lax.fori_loop(0, d.shape[0], write, out)

        out = jax.lax.fori_loop(0, chunks.shape[0], body, canvas)
        return out, jax.lax.slice(out, (0, 0, 0), (1, 1, 1))

    @functools.partial(jax.jit, static_argnums=(0, 1, 2))
    def run_win(infer_fn, geom, density_dtype, chunks, px, py, pref, origins,
                wins, norm, st, row0):
        """Per-slab fused stitcher for the rolling-window cache: like ``run``
        but gathers from a resident SLAB (origins offset by ``row0``, which is
        both the slab's first padded row and its first output row — the two
        coordinate systems share the ``ystarts`` keys) and stitches into a
        fixed-height slab canvas; the caller crops/downloads per slab."""
        ph, pw, padx, pady, sy_, sx_, out_h, out_w = geom

        def body(i, out):
            ids = chunks[i]
            arr = jnp.stack([ids, jnp.ones_like(ids)], axis=1)
            x, y, _, _, _ = prep((ph, pw), arr, px, py, pref, origins,
                                 wins, norm, row0)
            d = infer_fn(st, x, y).astype(jnp.float32)
            core = jax.lax.slice(d, (0, pady, padx, 0),
                                 (d.shape[0], pady + sy_, padx + sx_, 1))
            org = origins[ids] - jnp.stack([row0, jnp.zeros_like(row0)])

            def write(j, out):
                return jax.lax.dynamic_update_slice(
                    out, core[j], (org[j, 0], org[j, 1], 0))

            return jax.lax.fori_loop(0, d.shape[0], write, out)

        out = jax.lax.fori_loop(
            0, chunks.shape[0], body,
            jnp.zeros((out_h, out_w, 1), jnp.float32))
        out = out[:, :, 0]
        if density_dtype == "uint8":
            out = (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        elif density_dtype == "bfloat16":
            out = out.astype(jnp.bfloat16)
        return out

    _SCENE_PREP, _STITCH_RUN, _WINDOW_RUN, _ACC_RUN = prep, run, run_win, run_acc
    return _SCENE_PREP, _STITCH_RUN


class DeviceSceneCache:
    """HBM-resident raw scene pair + jitted gather/normalize tile feed.

    ``complete(batch)`` turns an :class:`IndexBatchLoader` batch into the
    same device-side ``(x, y, ref, item, weight)`` batch the streaming
    loaders produce, with one 8-byte-per-sample host->device transfer.

    ``mesh``: with a data-parallel mesh the scenes are replicated and the
    per-batch index array is sharded on the batch axis when divisible, so
    the gather runs shard-local under GSPMD.
    """

    def __init__(self, dataset, normalize, mesh=None):
        import jax
        import jax.numpy as jnp

        if dataset.transforms is not None:
            raise ValueError("DeviceSceneCache does not support sync transforms")
        grid = dataset.grid
        ph, pw = grid.canvas_shape()
        hp, wp = grid.padded_shape()
        padx, pady = grid.overlap_padding
        nband = dataset.raster_x.nband

        def padded(raster, dtype=None):
            block = raster.read_block(0, 0, raster.xsize, raster.ysize)
            dtype = np.dtype(dtype or block.dtype)
            if dtype.itemsize > 4:
                # fits() budgets 4 bytes for wide dtypes; prep consumes f32
                # anyway, so downcast rather than doubling the HBM footprint
                dtype = np.dtype(np.float32)
            out = np.zeros((hp, wp, block.shape[-1]), dtype)
            out[pady:pady + raster.ysize, padx:padx + raster.xsize] = block
            return out

        rr = dataset.raster_ref
        ref_dtype = (rr.dtype if rr is not None
                     and np.issubdtype(rr.dtype, np.integer)
                     and rr.dtype.itemsize <= 2 else np.dtype(np.float32))

        self._mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._bshard = batch_sharding(mesh)
            rshard = replicated(mesh)
            put = lambda a: jax.device_put(a, rshard)  # noqa: E731
        else:
            self._bshard = None
            put = jax.device_put

        self._px = put(padded(dataset.raster_x))
        self._py = put(padded(dataset.raster_y))
        self._pref = put(padded(rr, ref_dtype)) if rr is not None else None
        self._origins = put(grid.canvas_origins())
        self._wins = put(grid.write_windows())
        self._grid = grid
        self._scene_hw = (dataset.raster_x.ysize, dataset.raster_x.xsize)
        self._n_tiles = len(dataset)

        if normalize is not None:
            mx = np.asarray(normalize.meansX[:nband], np.float32)
            sx = np.asarray(normalize.stdX[:nband], np.float32)
            my = np.asarray(normalize.meansY[:nband], np.float32)
            sy = np.asarray(normalize.stdY[:nband], np.float32)
        else:  # identity (dataset built without an enhance)
            mx = my = np.zeros(nband, np.float32)
            sx = sy = np.ones(nband, np.float32)
        self._norm = tuple(put(v) for v in (mx, sx, my, sy))

        prep, _ = _scene_jits()

        def bound_prep(arr, px, py, pref, origins, wins):
            return prep((ph, pw), arr, px, py, pref, origins, wins,
                        self._norm, jnp.int32(0))

        self._prep = bound_prep

    @staticmethod
    def supports(dataset) -> bool:
        """True when the dataset can feed from a device-resident scene:
        a Normalize enhance (or none), no sync transforms, and the rasters
        within the HBM budget."""
        from .normalize import Normalize

        if dataset.transforms is not None:
            return False
        if dataset.enhance is not None and not isinstance(dataset.enhance, Normalize):
            return False
        return DeviceSceneCache.fits(dataset)

    @staticmethod
    def fits(dataset) -> bool:
        limit = float(os.environ.get("FCDGAN_SCENE_CACHE_MAX_MB", "4096"))
        hp, wp = dataset.grid.padded_shape()
        bytes_ = 0
        for r in (dataset.raster_x, dataset.raster_y, dataset.raster_ref):
            if r is None:
                continue
            itemsize = (r.dtype.itemsize
                        if np.issubdtype(r.dtype, np.integer) and r.dtype.itemsize <= 2
                        else 4)
            bytes_ += hp * wp * r.nband * itemsize
        return bytes_ <= limit * 1e6

    def complete(self, batch: Dict) -> Dict:
        """(item, weight) host batch -> normalized f32 device batch."""
        import jax

        arr = np.stack([np.asarray(batch["item"], np.int32),
                        np.asarray(batch["weight"], np.int32)], axis=1)
        if self._bshard is not None and arr.shape[0] % self._mesh.devices.size == 0:
            arr = jax.device_put(arr, self._bshard)
        x, y, ref, item, weight = self._prep(
            arr, self._px, self._py, self._pref, self._origins, self._wins)
        return Batch(x=x, y=y, ref=ref, item=item, weight=weight)

    def loader(self, batch_size: int, dataset, shuffle: bool = False,
               seed: int = 0, tail: str = "pad") -> IndexBatchLoader:
        if tail == "short" and self._mesh is not None:
            tail = "pad"  # batch-axis sharding needs the fixed shape
        return IndexBatchLoader(dataset, batch_size, shuffle=shuffle,
                                seed=seed, tail=tail)

    def stitched_density(self, infer_fn, sstate, batch_size: int = 10,
                         density_dtype: str = "float32"):
        """Whole-scene stitched density (blocking): start + finish."""
        dev = self.stitched_density_start(infer_fn, sstate,
                                          batch_size=batch_size,
                                          density_dtype=density_dtype)
        return self.stitched_density_finish(dev, density_dtype)

    def stitched_density_start(self, infer_fn, sstate, batch_size: int = 10,
                               density_dtype: str = "float32"):
        """Whole-scene stitched change density in ONE device program.

        The pipelined stitcher pays per-batch dispatch + download round
        trips (the measured cap on high-latency links; still PCIe traffic
        on real hosts). Here the full pass fuses into one jit: a fori_loop
        over wrap-padded tile chunks gathers+normalizes from the resident
        scene, runs ``infer_fn(sstate, x, y)`` (traced inline), crops each
        tile's stride-sized interior and stitches it into a device canvas
        with disjoint dynamic_update_slice writes (tile cores tile the
        scene disjointly at multiples of the stride; garbage rows of
        truncated border tiles land beyond the scene bounds and are cropped
        before download). One host->device transfer total (none), one
        device->host download of the finished raster.

        Reference semantics being reproduced: per-tile interior-only writes
        of GDALwriteDefault (/root/reference/data_utils.py:178-213) under
        the Demo_USSS inference loop (:404-473).

        Returns the (ysize, xsize) device array handle (dispatch only, host
        copy enqueued); ``stitched_density_finish`` resolves it to the
        float32 host raster. ``density_dtype='uint8'`` quantizes the
        download exactly like eval.inference.quantized_infer (dequant
        error <= 1/510)."""
        import jax
        import jax.numpy as jnp

        grid = self._grid
        ph, pw = grid.canvas_shape()
        padx, pady = grid.overlap_padding
        sy, sx = ph - 2 * pady, pw - 2 * padx
        hp2, wp2 = grid.padded_shape()
        hs, ws = self._scene_hw
        n = self._n_tiles
        bs = min(batch_size, n)
        # chunking via the shared serve policy (wrap-padded: dup tiles
        # re-write identical interior values - stitching is idempotent;
        # batch floor widened to FCDGAN_SERVE_BS for MXU depth)
        idxs = DeviceSceneWindowCache._serve_chunks(
            np.arange(n, dtype=np.int32), bs)

        # module-level jit keyed on (infer_fn, geometry, dtype) + arg shapes:
        # a fresh jax.jit closure every call would re-trace and re-ship the
        # full executable to the device on every invocation (measured
        # 20s/pass on the remote relay vs ~50ms warm), and per-INSTANCE
        # memos would still re-trace per scene — same-geometry scenes (the
        # multi-scene OSCD layout) share one compiled program here.
        _, run = _scene_jits()
        geom = (ph, pw, padx, pady, sy, sx, hp2, wp2, hs, ws)
        dev = run(infer_fn, geom, density_dtype, jnp.asarray(idxs),
                  self._px, self._py, self._pref, self._origins, self._wins,
                  self._norm, sstate)
        try:
            # enqueue the host copy behind the program (non-blocking): a
            # multi-scene caller can upload + dispatch the NEXT scene while
            # this one computes and downloads (tools/infer.py run_oscd)
            dev.copy_to_host_async()
        except AttributeError:
            pass
        return dev

    @staticmethod
    def stitched_density_finish(dev, density_dtype: str = "float32"):
        """Resolve a ``stitched_density_start`` handle to the float32 host
        raster (blocks until the device program + copy complete)."""
        host = np.asarray(dev)
        if density_dtype == "uint8":
            return host.astype(np.float32) / 255.0
        return host.astype(np.float32)


class WindowIndexBatchLoader(BatchLoader):
    """Index-only loader whose batches are grouped by window slab.

    Epoch order is a TWO-LEVEL shuffle: a random slab order (rotated so the
    already-resident slab leads — one fewer slab upload per epoch) times a
    random within-slab permutation. This replaces the reference's global
    shuffle for the out-of-core regime — standard windowed-shuffle practice:
    every tile still trains exactly once per epoch, only batch composition
    differs. Tail batches wrap-pad WITHIN the slab (weight 0) so every slab
    yields fixed-shape batches from resident rows only; ``tail='short'``
    yields each slab's true-size tail instead (one extra compiled shape per
    distinct tail size)."""

    def __init__(self, dataset, batch_size: int, cache, shuffle: bool = False,
                 seed: int = 0, tail: str = "pad"):
        super().__init__(dataset, batch_size, fields=("item",),
                         shuffle=shuffle, seed=seed, tail=tail)
        self._cache = cache

    def __len__(self) -> int:
        bs = self.batch_size
        return sum((n + bs - 1) // bs for n in self._cache.slab_sizes)

    def __iter__(self):
        cache = self._cache
        order = np.arange(cache.n_slabs)
        if self.shuffle:
            self._rng.shuffle(order)
        res = cache.resident_slab
        if res is not None and len(order) > 1:
            i = int(np.where(order == res)[0][0])
            order = np.roll(order, -i)
        self._epoch += 1
        cache.begin_epoch(order)
        bs = self.batch_size
        for k in order:
            items = cache.slab_items(int(k)).copy()
            if self.shuffle:
                self._rng.shuffle(items)
            n = len(items)
            for s in range(0, n, bs):
                idx = items[s:s + bs]
                weight = np.ones(len(idx), np.float32)
                if len(idx) < bs and self.tail == "pad":
                    extra = np.resize(items, bs - len(idx))
                    idx = np.concatenate([idx, extra])
                    weight = np.concatenate(
                        [weight, np.zeros(bs - len(weight), np.float32)])
                yield Batch(item=np.asarray(idx, np.int64), weight=weight,
                            slab=int(k))


class DeviceSceneWindowCache:
    """Rolling-window HBM feed for scenes that exceed the resident-cache gate.

    The full :class:`DeviceSceneCache` uploads the padded scene pair once;
    past ``FCDGAN_SCENE_CACHE_MAX_MB`` that is impossible, and the round-3
    streaming fallback (host tile assembly + per-batch upload,
    /root/reference/data_utils.py:91-140 semantics) measured ~25% of the
    cache headline (ab_round3.jsonl ``driver_stream``). Here the scene is
    partitioned into horizontal SLABS of whole tile rows (slab height =
    ``(rows-1)*stride + patch_h``, sized so two slabs fit the window
    budget); training visits slabs in shuffled order while a background
    thread reads the NEXT slab's raw rows from the raster and uploads them —
    the slab upload amortizes over a whole slab of steps and overlaps
    compute, so per-batch host->device traffic is again only the (B, 2)
    index array, identical gather/normalize jit (``_SCENE_PREP`` with the
    slab's row offset) and bit-identical tiles to the resident cache.

    Budget: ``FCDGAN_SCENE_WINDOW_MB`` (default = the scene-cache gate);
    each in-flight slab uses at most half. Single-process; mesh-replicated
    slabs under a data-parallel mesh like the full cache."""

    def __init__(self, dataset, normalize, mesh=None):
        import jax
        import jax.numpy as jnp

        if dataset.transforms is not None:
            raise ValueError(
                "DeviceSceneWindowCache does not support sync transforms")
        grid = dataset.grid
        ph, pw = grid.canvas_shape()
        hp, wp = grid.padded_shape()
        padx, pady = grid.overlap_padding
        nband = dataset.raster_x.nband
        self._grid = grid
        self._geom = (ph, pw, padx, pady, wp)
        self._scene_hw = (dataset.raster_x.ysize, dataset.raster_x.xsize)
        self._n_tiles = len(dataset)
        self._dataset = dataset

        rr = dataset.raster_ref
        self._ref_dtype = (rr.dtype if rr is not None
                           and np.issubdtype(rr.dtype, np.integer)
                           and rr.dtype.itemsize <= 2 else np.dtype(np.float32))

        rows = self._plan_rows(dataset)
        if rows < 1:
            raise ValueError("window budget cannot hold even one tile row; "
                             "raise FCDGAN_SCENE_WINDOW_MB")
        ys = grid.ystarts
        ny = len(ys)
        self._rows_per_slab = rows
        self._slab_r0 = list(range(0, ny, rows))
        self._stride = ph - 2 * pady
        # fixed buffer height across slabs -> one compiled prep program
        self._slab_h = (rows - 1) * self._stride + ph

        self._mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._bshard = batch_sharding(mesh)
            rshard = replicated(mesh)
            self._put = lambda a: jax.device_put(a, rshard)
        else:
            self._bshard = None
            self._put = jax.device_put

        self._origins = self._put(grid.canvas_origins())
        self._wins = self._put(grid.write_windows())

        if normalize is not None:
            mx = np.asarray(normalize.meansX[:nband], np.float32)
            sx = np.asarray(normalize.stdX[:nband], np.float32)
            my = np.asarray(normalize.meansY[:nband], np.float32)
            sy = np.asarray(normalize.stdY[:nband], np.float32)
        else:
            mx = my = np.zeros(nband, np.float32)
            sx = sy = np.ones(nband, np.float32)
        self._norm = tuple(self._put(v) for v in (mx, sx, my, sy))

        prep, _ = _scene_jits()

        def bound_prep(arr, px, py, pref, row0):
            return prep((ph, pw), arr, px, py, pref, self._origins,
                        self._wins, self._norm, row0)

        self._prep = bound_prep

        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="slab-feed")
        self._lock = threading.Lock()
        self._futures: Dict[int, object] = {}
        self._resident: Dict[int, tuple] = {}
        self._current: Optional[int] = None
        self._order: list = []
        # stall evidence (VERDICT r4 task 2): every slab switch records how
        # long the training loop blocked on the background upload, with a
        # timestamp — the per-rep variance signature the round-4 window
        # numbers lacked. Read via slab_waits / drain_slab_waits().
        self._slab_waits: list = []

    # -- slab geometry -------------------------------------------------------
    @staticmethod
    def _slab_dtypes(dataset):
        """Per-raster slab buffer dtypes (wide dtypes downcast to f32; ref
        keeps small-int, else f32) — the resident-buffer dtype rules."""
        def wide(r):
            dt = np.dtype(r.dtype)
            return dt if dt.itemsize <= 4 else np.dtype(np.float32)

        dts = [wide(dataset.raster_x), wide(dataset.raster_y)]
        rr = dataset.raster_ref
        if rr is not None:
            dts.append(np.dtype(rr.dtype)
                       if np.issubdtype(rr.dtype, np.integer)
                       and rr.dtype.itemsize <= 2 else np.dtype(np.float32))
        return dts

    @classmethod
    def _pack_dtype(cls, dataset):
        """Common dtype for the one-put packed slab upload, or None when no
        single dtype holds every raster exactly (then 3 separate puts)."""
        dts = cls._slab_dtypes(dataset)
        packed = np.result_type(*dts)
        if (np.dtype(packed).itemsize <= 4
                and all(np.can_cast(dt, packed, "safe") for dt in dts)):
            return np.dtype(packed)
        return None

    @classmethod
    def _bytes_per_row(cls, dataset) -> int:
        """Host/HBM bytes per padded scene row across x, y and ref, using the
        same dtype resolution as the resident buffers (the packed common
        dtype when the one-put upload applies)."""
        _, wp = dataset.grid.padded_shape()
        pack = cls._pack_dtype(dataset)
        rasters = [r for r in (dataset.raster_x, dataset.raster_y,
                               dataset.raster_ref) if r is not None]
        dts = cls._slab_dtypes(dataset)
        total = 0
        for r, dt in zip(rasters, dts):
            itemsize = pack.itemsize if pack is not None else dt.itemsize
            total += wp * r.nband * itemsize
        return total

    @staticmethod
    def _budget_bytes() -> float:
        mb = os.environ.get("FCDGAN_SCENE_WINDOW_MB")
        if mb is None:
            mb = os.environ.get("FCDGAN_SCENE_CACHE_MAX_MB", "4096")
        return float(mb) * 1e6

    @classmethod
    def _plan_rows(cls, dataset) -> int:
        """Max tile rows per slab within the in-flight budget: two slabs
        resident, plus one transient packed upload buffer when the one-put
        path applies (freed right after the on-device channel split)."""
        grid = dataset.grid
        ph = grid.canvas_shape()[0]
        stride = ph - 2 * grid.overlap_padding[1]
        per_row = cls._bytes_per_row(dataset)
        slots = 3 if cls._pack_dtype(dataset) is not None else 2
        share = cls._budget_bytes() / slots
        ny = len(grid.ystarts)
        rows = int((share / max(per_row, 1) - ph) // stride) + 1
        return max(0, min(rows, ny))

    @staticmethod
    def supports(dataset) -> bool:
        """True when the dataset can feed from a rolling window: Normalize
        (or no) enhance, no sync transforms, and one tile-row slab within
        half the window budget. (Use the full DeviceSceneCache instead when
        the whole scene fits — this class never checks that.)"""
        from .normalize import Normalize

        if dataset.transforms is not None:
            return False
        if dataset.enhance is not None and not isinstance(dataset.enhance,
                                                          Normalize):
            return False
        return DeviceSceneWindowCache._plan_rows(dataset) >= 1

    @property
    def n_slabs(self) -> int:
        return len(self._slab_r0)

    @property
    def slab_sizes(self) -> list:
        nx = self._grid.patch_count[0]
        ny = len(self._grid.ystarts)
        return [nx * (min(r0 + self._rows_per_slab, ny) - r0)
                for r0 in self._slab_r0]

    @property
    def resident_slab(self) -> Optional[int]:
        return self._current

    def slab_items(self, k: int) -> np.ndarray:
        """Global item ids of slab k (item = item_x * ny + item_y)."""
        nx, ny = self._grid.patch_count
        r0 = self._slab_r0[k]
        r1 = min(r0 + self._rows_per_slab, ny)
        rows = np.arange(r0, r1)
        return (np.arange(nx)[:, None] * ny + rows[None, :]).reshape(-1)

    # -- slab IO (worker thread) ----------------------------------------------
    def _read_slab_host(self, k: int):
        """Host half of ``_load_slab``: disk read + zero-padded assembly of
        slab k's planes, NO device transfer. Returns an opaque host payload
        for ``_put_slab`` — split out so phased serving can overlap disk IO
        with compute while deferring the device_put to a drained queue
        (puts racing active compute stall the relay's execute stream ~0.4 s
        each regardless of size: experiments/put_during_compute.py)."""
        ph, pw, padx, pady, wp = self._geom
        hs, ws = self._scene_hw
        ys = self._grid.ystarts
        p0 = ys[self._slab_r0[k]]  # first padded row of the slab
        s0 = max(p0 - pady, 0)
        s1 = min(p0 - pady + self._slab_h, hs)
        dest = s0 - (p0 - pady)

        def fill(host, raster):
            if s1 > s0:
                block = raster.read_block(0, s0, ws, s1 - s0)
                host[dest:dest + (s1 - s0), padx:padx + ws] = block

        ds = self._dataset
        rasters = [ds.raster_x, ds.raster_y] + (
            [ds.raster_ref] if ds.raster_ref is not None else [])
        pack = self._pack_dtype(ds)
        if pack is not None:
            cs = [r.nband for r in rasters]
            host = np.zeros((self._slab_h, wp, sum(cs)), pack)
            off = 0
            for r, c in zip(rasters, cs):
                fill(host[..., off:off + c], r)
                off += c
            if (pack == np.float32
                    and os.environ.get("FCDGAN_SERVE_SLAB_DTYPE")
                    == "bfloat16"):
                # OPT-IN byte halver for float32 scenes on slow links: the
                # slab rides as bf16 (raw-value rounding <= 1 bf16 ulp,
                # ~0.4% relative, BEFORE normalization — downstream compute
                # is bf16 anyway). Out-of-core FRESH-scene serving is H2D-
                # bandwidth-bound (true-barrier measurement: ~10-17 MB/s on
                # the axon relay, experiments/true_bandwidth_probe.py), so
                # halving bytes halves the wall. NOT bit-exact vs the f32
                # resident cache — default off; integral scenes unaffected.
                import ml_dtypes

                host = host.astype(ml_dtypes.bfloat16)
            return ("packed", host, cs, np.int32(p0))
        dts = self._slab_dtypes(ds)
        hosts = []
        for raster, dtype in zip(rasters, dts):
            host = np.zeros((self._slab_h, wp, raster.nband), dtype)
            fill(host, raster)
            hosts.append(host)
        return ("planes", hosts, None, np.int32(p0))

    def _put_slab(self, payload) -> tuple:
        """Device half of ``_load_slab``: upload a ``_read_slab_host``
        payload and return (px, py, pref, row0) device buffers."""
        kind, data, cs, p0 = payload
        if kind == "packed":
            packed = self._put(data)
            px, py, pref = _split_slab(packed, cs[0], cs[1],
                                       cs[2] if len(cs) > 2 else 0)
            del packed  # transient: budget plans 3 slab slots (see _plan_rows)
            return (px, py, pref, p0)
        bufs = [self._put(h) for h in data]
        px, py = bufs[0], bufs[1]
        pref = bufs[2] if len(bufs) > 2 else None
        return (px, py, pref, p0)

    def _load_slab(self, k: int) -> tuple:
        """Read slab k's raw scene rows, zero-pad horizontally, upload.
        Returns (px, py, pref, row0) device buffers.

        When one dtype holds every raster exactly (``_pack_dtype``), the
        three planes ride ONE channel-packed host buffer and ONE device_put,
        split back on device in a single fused dispatch — on high-latency
        links (the axon relay pays a fixed ~35 ms round trip per transfer)
        this cuts the per-slab upload from 3 RPCs to 1 and narrows the
        window in which an upload can serialize against the compute stream
        (round-4 finding: driver_window_2048 rep spread 1.7-3.1 Mpx/s came
        from slab-put/compute serialization, ab_round4.jsonl)."""
        return self._put_slab(self._read_slab_host(k))

    def _ensure(self, k: int) -> None:
        with self._lock:
            if k == self._current or k in self._resident or k in self._futures:
                return
            self._futures[k] = self._pool.submit(self._load_slab, k)

    def begin_epoch(self, order) -> None:
        """Called by the loader at epoch start with the slab visit order."""
        order = [int(v) for v in order]
        with self._lock:
            self._order = order
        self._ensure(order[0])
        if len(order) > 1 and order[0] == self._current:
            # the resident slab leads: prefetch the following one now so the
            # first slab switch doesn't stall on a cold load
            self._ensure(order[1])

    @property
    def slab_waits(self) -> list:
        """[(t_start, slab, wait_s), ...] — one row per slab switch since
        construction (or the last drain): the time the consumer blocked on
        the background slab upload."""
        with self._lock:
            return list(self._slab_waits)

    def drain_slab_waits(self) -> list:
        with self._lock:
            out = self._slab_waits
            self._slab_waits = []
        return out

    def _advance_to(self, k: int) -> None:
        import time as _time

        t0 = _time.time()
        with self._lock:
            fut = self._futures.pop(k, None)
        bufs = fut.result() if fut is not None else None
        with self._lock:
            self._slab_waits.append(
                (round(t0, 3), k, round(_time.time() - t0, 4)))
        with self._lock:
            if bufs is not None:
                self._resident[k] = bufs
            if k not in self._resident:
                need_sync = True
            else:
                need_sync = False
        if need_sync:  # out-of-order access (no begin_epoch): load inline
            bufs = self._load_slab(k)
            with self._lock:
                self._resident[k] = bufs
        with self._lock:
            self._current = k
            for other in [s for s in self._resident if s != k]:
                del self._resident[other]
            order = self._order
        if k in order:
            i = order.index(k)
            if i + 1 < len(order):
                self._ensure(order[i + 1])

    # -- feed ------------------------------------------------------------------
    def complete(self, batch: Dict) -> Dict:
        """(item, weight, slab) host batch -> normalized f32 device batch."""
        import jax

        k = int(batch["slab"])
        if k != self._current:
            self._advance_to(k)
        px, py, pref, row0 = self._resident[k]
        arr = np.stack([np.asarray(batch["item"], np.int32),
                        np.asarray(batch["weight"], np.int32)], axis=1)
        if self._bshard is not None and arr.shape[0] % self._mesh.devices.size == 0:
            arr = jax.device_put(arr, self._bshard)
        x, y, ref, item, weight = self._prep(arr, px, py, pref, row0)
        return Batch(x=x, y=y, ref=ref, item=item, weight=weight)

    def loader(self, batch_size: int, dataset, shuffle: bool = False,
               seed: int = 0, tail: str = "pad") -> WindowIndexBatchLoader:
        if tail == "short" and self._mesh is not None:
            tail = "pad"  # batch-axis sharding needs the fixed shape
        return WindowIndexBatchLoader(dataset, batch_size, self,
                                      shuffle=shuffle, seed=seed, tail=tail)

    # -- fused windowed inference ---------------------------------------------
    def _canvas_bytes(self, density_dtype: str) -> int:
        hp2, wp2 = self._grid.padded_shape()
        padx, pady = self._grid.overlap_padding
        item = 1 if density_dtype == "uint8" else (
            2 if density_dtype == "bfloat16" else 4)
        return (hp2 - 2 * pady) * (wp2 - 2 * padx) * item

    def stitched_density(self, infer_fn, sstate, batch_size: int = 10,
                         density_dtype: str = "float32"):
        """Whole-scene stitched density past the HBM gate (round-5 design).

        Default path — DEVICE-RESIDENT OUTPUT CANVAS: the density canvas
        stays in HBM in the download dtype; each slab runs one fused program
        (gather + infer + interior writes at GLOBAL offsets, quantized at
        write time — bit-identical to the whole-scene fused path, asserted
        in tests/test_inference.py) chained on the donated canvas, and the
        finished raster downloads ONCE. Slab k+1's background upload
        (``_ensure``) overlaps slab k's program; a 1-element probe fetched
        per slab is the completion barrier that bounds in-flight slabs
        (lookahead 2 when the budget holds canvas + 4 slab slots, else 1 =
        the ``_plan_rows`` 3-slot packed plan; the canvas itself rides on
        top of the slab budget and is gated at ``FCDGAN_SERVE_CANVAS_MAX_MB``,
        default = the window budget). Round-4's per-slab downloads paid one
        dispatch + one download RPC per slab on a link with ~30+ ms
        per-transfer latency and run-level drift — the 0.80 Mpx/s gap of
        ab_round4.jsonl `infer_2048_window_gate80*`; this path has zero
        per-slab downloads.

        Fallback — per-slab slab-canvas downloads drained on a depth-1
        writer thread — only when the canvas exceeds its gate (huge scene +
        tiny budget). The loop enqueues slab k's download BEFORE starting
        slab k+2's upload, so live slabs stay within the 3-slot plan (the
        round-4 ordering could hold 4 — advisor finding, ADVICE.md r4).

        Chunk lists are wrap-padded to a fixed shape so every slab shares
        one compiled program (duplicate tiles re-write identical interiors).
        Reference semantics reproduced: interior-only stitched write-back of
        data_utils.py:178-213 under Demo_USSS.py:404-473."""
        import jax.numpy as jnp

        _scene_jits()
        grid = self._grid
        ph, pw, padx, pady, wp = self._geom
        sy_, sx_ = ph - 2 * pady, pw - 2 * padx
        hs, ws = self._scene_hw
        ys = grid.ystarts
        bs = min(batch_size, max(self.slab_sizes))

        canvas_mb = os.environ.get("FCDGAN_SERVE_CANVAS_MAX_MB")
        canvas_gate = (float(canvas_mb) * 1e6 if canvas_mb is not None
                       else self._budget_bytes())
        cbytes = self._canvas_bytes(density_dtype)
        if cbytes <= canvas_gate:
            return self._stitched_density_canvas(
                infer_fn, sstate, bs, density_dtype)

        run_win = _WINDOW_RUN
        out_h = (self._rows_per_slab - 1) * self._stride + sy_
        out_w = wp - 2 * padx
        geom = (ph, pw, padx, pady, sy_, sx_, out_h, out_w)
        host_dt = np.uint8 if density_dtype == "uint8" else np.float32
        out = np.zeros((hs, ws), host_dt)
        with self._lock:  # serving visits slabs in order; a stale training
            self._order = list(range(self.n_slabs))  # order must not prefetch

        import queue as _queue
        import threading

        q: "_queue.Queue" = _queue.Queue(maxsize=1)
        sentinel = object()
        err = []

        def writer():
            while True:
                job = q.get()
                if job is sentinel:
                    return
                if err:
                    continue  # drain unprocessed so the producer never blocks
                try:
                    dev, y0, rows = job
                    host = np.asarray(dev)  # blocks on compute+download here
                    out[y0:y0 + rows] = host[:rows, :ws]
                except BaseException as e:  # noqa: BLE001
                    err.append(e)

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()
        try:
            for k in range(self.n_slabs):
                if err:
                    break
                self._ensure(k)
                self._advance_to(k)
                px, py, pref, row0 = self._resident[k]
                idxs = self._serve_chunks(self.slab_items(k), bs)
                dev = run_win(infer_fn, geom, density_dtype,
                              jnp.asarray(idxs), px, py, pref, self._origins,
                              self._wins, self._norm, sstate,
                              jnp.int32(int(row0)))
                y0 = ys[self._slab_r0[k]]
                # enqueue BEFORE prefetching slab k+1: q.put blocks while the
                # writer still holds slab k-1's download, so at most
                # (computing k) + (uploading k+1) slab buffers are in flight
                # on top of the small slab canvases — within the 3-slot plan
                q.put((dev, y0, min(out_h, hs - y0)))
                if k + 1 < self.n_slabs:
                    self._ensure(k + 1)
        finally:
            q.put(sentinel)
            wt.join()
        if err:
            raise err[0]
        if density_dtype == "uint8":
            return out.astype(np.float32) / 255.0
        return out.astype(np.float32)

    @staticmethod
    def _serve_chunks(items: np.ndarray, bs: int) -> np.ndarray:
        """(nc, bs_eff) chunk list for one slab's fused serve program.

        Per-slab chunk counts (ceil(n/bs), not a global max) cut wrap-pad
        duplicate compute. The chunk BATCH stays the caller's ``batch_size``
        by default: XLA picks different (differently-rounded) conv lowerings
        per batch size on TPU bf16, so bit-equality between the window and
        whole-scene fused paths requires identical per-program batch shapes
        (measured round 5: a bs-32 fused vs bs-22 slab run broke
        array_equal). ``FCDGAN_SERVE_BS`` > 0 opts into wider batches for
        MXU depth where cross-path bit-equality is not required — slabs
        smaller than the cap then run as ONE exact-size chunk."""
        n = len(items)
        cap = int(os.environ.get("FCDGAN_SERVE_BS", "0"))
        bs_eff = min(max(bs, cap), n) if cap > 0 else min(bs, n)
        nc = -(-n // bs_eff)
        idxs = np.resize(items.astype(np.int32), nc * bs_eff)
        return idxs.reshape(nc, bs_eff)

    def _stitched_density_canvas(self, infer_fn, sstate, bs: int,
                                 density_dtype: str):
        """Resident-canvas serving loop (see ``stitched_density``).

        Two upload strategies, FCDGAN_SERVE_MODE=phased|overlap:

        * ``phased`` (default on the axon relay): slab GROUPS alternate
          [drain-queue barrier -> device_put group -> dispatch group] so no
          put ever races active compute — on the relay a put racing the
          execute stream stalls it ~0.4 s regardless of size
          (experiments/put_during_compute.py: a resident 6-program chain
          runs 0.66 s; the same chain with six 20.8 MB interleaved puts,
          main thread or background thread, runs 2.9-3.1 s). Disk reads
          still overlap compute on the worker thread; only the puts wait
          for the barrier. Group size 2 (packed) keeps peak slabs at the
          3-slot ``_plan_rows`` plan.

        * ``overlap`` (default elsewhere — a real host's PCIe DMA uploads
          do overlap compute): slab k+1's background load is GATED on slab
          k-1's program-completion probe on the worker thread, so the main
          loop never blocks while at most [k just-freed, k computing, k+1
          uploading] slab buffers coexist."""
        import jax
        import jax.numpy as jnp

        run_acc = _ACC_RUN
        grid = self._grid
        ph, pw, padx, pady, wp = self._geom
        sy_, sx_ = ph - 2 * pady, pw - 2 * padx
        hs, ws = self._scene_hw
        hp2, wp2 = grid.padded_shape()
        geom = (ph, pw, padx, pady, sy_, sx_)
        cdt = {"uint8": jnp.uint8, "bfloat16": jnp.bfloat16}.get(
            density_dtype, jnp.float32)

        mode = os.environ.get("FCDGAN_SERVE_MODE")
        if mode not in ("phased", "overlap"):
            # overlap is the default everywhere: when transfers are light
            # (integral scenes, compressible content, real-host PCIe) the
            # phased barriers serialize compute that overlap hides
            # (ab_round5 serve_ab_realistic: canvas-phased 1.9 vs
            # per-slab-overlap 2.7 Mpx/s); when transfers dominate the two
            # measure equal (serve_ab gate80). phased remains the opt-in
            # for links whose puts hard-stall active compute.
            mode = "overlap"

        with self._lock:  # serving visits slabs in order; a stale training
            self._order = []  # order must not trigger extra prefetches

        canvas = jnp.zeros((hp2 - 2 * pady, wp2 - 2 * padx, 1), cdt)

        def dispatch(k, bufs, canvas):
            px, py, pref, row0 = bufs
            idxs = self._serve_chunks(self.slab_items(k), bs)
            return run_acc(infer_fn, geom, density_dtype,
                           jnp.asarray(idxs), px, py, pref,
                           self._origins, self._wins, self._norm,
                           canvas, sstate, jnp.int32(int(row0)))

        if mode == "phased":
            import time as _time

            dbg = os.environ.get("FCDGAN_SERVE_DEBUG") == "1"
            group = 2 if self._pack_dtype(self._dataset) is not None else 1
            n = self.n_slabs
            starts = list(range(0, n, group))
            reads: Dict[int, object] = {}

            def ensure_reads(upto):
                for k in range(min(upto, n)):
                    if k not in reads:
                        reads[k] = self._pool.submit(self._read_slab_host, k)

            ensure_reads(2 * group)
            prev_probe = None
            for s in starts:
                ks = list(range(s, min(s + group, n)))
                t0 = _time.perf_counter()
                payloads = [reads.pop(k).result() for k in ks]  # disk wait
                t1 = _time.perf_counter()
                if prev_probe is not None:
                    np.asarray(prev_probe)  # barrier: queue drained, prev
                    bufs_group = None       # group's slabs freeable
                t2 = _time.perf_counter()
                bufs_group = [self._put_slab(p) for p in payloads]
                t3 = _time.perf_counter()
                for k, bufs in zip(ks, bufs_group):
                    canvas, prev_probe = dispatch(k, bufs, canvas)
                t4 = _time.perf_counter()
                ensure_reads(s + 3 * group)  # read ahead while computing
                if dbg:
                    print(f"serve_phased group {ks}: read_wait "
                          f"{(t1-t0)*1e3:.0f} barrier {(t2-t1)*1e3:.0f} "
                          f"puts {(t3-t2)*1e3:.0f} dispatch "
                          f"{(t4-t3)*1e3:.0f} ms", flush=True)
        else:
            probes: Dict[int, object] = {}

            def gated_load(k: int, barrier):
                if barrier is not None:
                    np.asarray(barrier)  # program k-2 done -> slab freed
                return self._load_slab(k)

            self._ensure(0)
            for k in range(self.n_slabs):
                self._advance_to(k)
                canvas, probe = dispatch(k, self._resident[k], canvas)
                probes[k] = probe
                if k + 1 < self.n_slabs:
                    with self._lock:
                        if (k + 1 != self._current
                                and k + 1 not in self._resident
                                and k + 1 not in self._futures):
                            self._futures[k + 1] = self._pool.submit(
                                gated_load, k + 1, probes.get(k - 1))
        host = np.asarray(canvas)[:hs, :ws, 0]  # the ONE download
        if density_dtype == "uint8":
            return host.astype(np.float32) / 255.0
        return host.astype(np.float32)


class IndexPairBatchLoader(BatchLoader):
    """Index-only loader over a WHUPairDataset: per-epoch order_reset pairing
    resolved to (c_item, nc_item) table lookups, no host slice reads.
    Requires the deterministic ``random_assign=False`` pairing (the demo
    default) — same contract as NativeWHUPairBatchLoader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, epoch_hook=None, tail: str = "pad"):
        if dataset.random_assign:
            raise ValueError("index pair loader requires random_assign=False")
        super().__init__(dataset, batch_size, fields=("item",),
                         shuffle=shuffle, seed=seed, epoch_hook=epoch_hook,
                         tail=tail)

    def __iter__(self):
        pair = self.dataset
        for idx, weight in self._index_batches():
            yield Batch(
                c_item=np.asarray([pair.c_order[int(i)] for i in idx], np.int64),
                nc_item=np.asarray([pair.nc_order[int(i)] for i in idx], np.int64),
                weight=weight)


class DeviceWHUCache:
    """HBM-resident WHU slice stacks + jitted gather/normalize feeds.

    WSSS is feeding-limited (the adversarial step is faster than host slice
    assembly, ROADMAP.md round 2); with the raw changed/unchanged slice
    stacks resident in HBM, each adversarial batch uploads one (B, 3) int32
    (c_item, nc_item, weight) array and each G-pretrain batch a (B, 2) —
    normalization and the label==1 ref binarization semantics match the
    host loaders exactly (refs are pre-binarized into a uint8 stack).

    Reference hot loop being replaced: the per-batch PIL reads inside
    /root/reference/data_utils.py:494-525 under Demo_WSSS.py:236-343.
    """

    def __init__(self, pair_ds, normalize, mesh=None):
        import jax
        import jax.numpy as jnp
        from PIL import Image

        c_ds, nc_ds = pair_ds.c_ds, pair_ds.nc_ds
        for ds in (c_ds, nc_ds):
            if ds.transforms is not None:
                raise ValueError("DeviceWHUCache does not support sync transforms")

        def read_raw(path):
            a = np.array(Image.open(path))
            return a[..., None] if a.ndim == 2 else a

        def stack(paths):
            return np.stack([read_raw(p) for p in paths])

        cx, cy = stack(c_ds.img_path_x), stack(c_ds.img_path_y)
        nx, ny = stack(nc_ds.img_path_x), stack(nc_ds.img_path_y)
        # changed refs, binarized >0 -> 1 (data_utils.py:501-508); unchanged
        # slices have all-zero refs by construction
        cref = np.stack([
            (read_raw(p)[..., :1] > 0).astype(np.uint8) for p in c_ds.ref_path])
        nband = cx.shape[-1]

        self._mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._bshard = batch_sharding(mesh)
            rshard = replicated(mesh)
            put = lambda a: jax.device_put(a, rshard)  # noqa: E731
        else:
            self._bshard = None
            put = jax.device_put

        self._cx, self._cy, self._cref = put(cx), put(cy), put(cref)
        self._nx, self._ny = put(nx), put(ny)

        if normalize is not None:
            mx = np.asarray(normalize.meansX[:nband], np.float32)
            sx = np.asarray(normalize.stdX[:nband], np.float32)
            my = np.asarray(normalize.meansY[:nband], np.float32)
            sy = np.asarray(normalize.stdY[:nband], np.float32)
        else:
            mx = my = np.zeros(nband, np.float32)
            sx = sy = np.ones(nband, np.float32)

        def pair_prep(arr, cx, cy, cref, nx, ny):
            ci, ni = arr[:, 0], arr[:, 1]
            weight = arr[:, 2].astype(jnp.float32)
            c_x = (cx[ci].astype(jnp.float32) - mx) / sx
            c_y = (cy[ci].astype(jnp.float32) - my) / sy
            nc_x = (nx[ni].astype(jnp.float32) - mx) / sx
            nc_y = (ny[ni].astype(jnp.float32) - my) / sy
            return c_x, c_y, cref[ci].astype(jnp.float32), nc_x, nc_y, weight

        def unc_prep(arr, nx, ny):
            i = arr[:, 0]
            weight = arr[:, 1].astype(jnp.float32)
            x = (nx[i].astype(jnp.float32) - mx) / sx
            y = (ny[i].astype(jnp.float32) - my) / sy
            return x, y, i, weight

        self._pair_prep = jax.jit(pair_prep)
        self._unc_prep = jax.jit(unc_prep)

    @staticmethod
    def supports(pair_ds) -> bool:
        from .normalize import Normalize

        for ds in (pair_ds.c_ds, pair_ds.nc_ds):
            if ds.transforms is not None:
                return False
            if ds.scale is not None and not isinstance(ds.scale, Normalize):
                return False
        if pair_ds.random_assign or not pair_ds.c_len or not pair_ds.nc_len:
            return False
        try:
            from PIL import Image

            probe = np.array(Image.open(pair_ds.c_ds.img_path_x[0]))
            h, w = probe.shape[:2]
            c = 1 if probe.ndim == 2 else probe.shape[-1]
            per = h * w * c * probe.dtype.itemsize
            limit = float(os.environ.get("FCDGAN_SLICE_CACHE_MAX_MB", "4096"))
            n = pair_ds.c_len + pair_ds.nc_len
            return (2 * n + pair_ds.c_len) * per <= limit * 1e6
        except Exception:
            return False

    def _put_arr(self, arr):
        import jax

        if self._bshard is not None and arr.shape[0] % self._mesh.devices.size == 0:
            return jax.device_put(arr, self._bshard)
        return arr

    def complete_pair(self, batch: Dict) -> Dict:
        arr = np.stack([np.asarray(batch["c_item"], np.int32),
                        np.asarray(batch["nc_item"], np.int32),
                        np.asarray(batch["weight"], np.int32)], axis=1)
        c_x, c_y, c_ref, nc_x, nc_y, weight = self._pair_prep(
            self._put_arr(arr), self._cx, self._cy, self._cref,
            self._nx, self._ny)
        return Batch(c_x=c_x, c_y=c_y, c_ref=c_ref, nc_x=nc_x, nc_y=nc_y,
                     weight=weight, c_item=batch["c_item"],
                     nc_item=batch["nc_item"])

    def complete_unc(self, batch: Dict) -> Dict:
        arr = np.stack([np.asarray(batch["item"], np.int32),
                        np.asarray(batch["weight"], np.int32)], axis=1)
        x, y, item, weight = self._unc_prep(self._put_arr(arr),
                                            self._nx, self._ny)
        return Batch(x=x, y=y, item=item, weight=weight)

    def complete_c(self, batch: Dict) -> Dict:
        """Changed-slice batch from the resident stacks (the WSSS final
        inference runs over the changed set, Demo_WSSS.py:387-445)."""
        arr = np.stack([np.asarray(batch["item"], np.int32),
                        np.asarray(batch["weight"], np.int32)], axis=1)
        x, y, item, weight = self._unc_prep(self._put_arr(arr),
                                            self._cx, self._cy)
        return Batch(x=x, y=y, item=item, weight=weight)

    def pair_loader(self, batch_size: int, pair_ds, shuffle: bool = False,
                    seed: int = 0, epoch_hook=None,
                    tail: str = "pad") -> IndexPairBatchLoader:
        if tail == "short" and self._mesh is not None:
            tail = "pad"  # batch-axis sharding needs the fixed shape
        return IndexPairBatchLoader(pair_ds, batch_size, shuffle=shuffle,
                                    seed=seed, epoch_hook=epoch_hook,
                                    tail=tail)

    def unc_loader(self, batch_size: int, unc_ds, shuffle: bool = False,
                   seed: int = 0, tail: str = "pad") -> IndexBatchLoader:
        if tail == "short" and self._mesh is not None:
            tail = "pad"
        return IndexBatchLoader(unc_ds, batch_size, shuffle=shuffle,
                                seed=seed, tail=tail)


class DeviceOSCDCache:
    """HBM-resident raw tile stacks for an OSCD multi-scene dataset.

    Scenes have PER-SCENE normalizers (data/datasets.py OSCDDataset parity
    with /root/reference/data_utils.py:341-362), so the cache stores raw
    fixed-shape tile canvases (assembled once host-side with the exact
    clamped-read/zero-pad semantics) plus per-item (C,) mean/std rows, and
    normalizes + pad-masks on device at gather time. Regions are
    pre-binarized (>125 -> 1, data_utils.py:273-282) into a uint8 stack.

    Per-batch upload: one (B, 2) int32 (item, weight) array — replaces the
    per-batch x/y/ref/region tile upload in both the adversarial loop and
    the per-epoch test eval (Demo_RSSS.py:244-447).
    """

    def __init__(self, dataset, mesh=None):
        import jax
        import jax.numpy as jnp

        n = len(dataset)
        if n == 0:
            raise ValueError("empty dataset")
        ph, pw = dataset.dslist[0].ds.grid.canvas_shape()
        nband = dataset.dslist[0].ds.raster_x.nband

        dts = [s.ds.raster_x.dtype for s in dataset.dslist]
        dts += [s.ds.raster_y.dtype for s in dataset.dslist]
        common = np.result_type(*dts)
        if not (np.issubdtype(common, np.integer) and common.itemsize <= 2):
            common = np.dtype(np.float32)

        xs = np.zeros((n, ph, pw, nband), common)
        ys = np.zeros((n, ph, pw, nband), common)
        refs = np.zeros((n, ph, pw, 1), np.float32)
        regions = np.zeros((n, ph, pw, 1), np.float32)
        mx = np.zeros((n, nband), np.float32)
        sx = np.ones((n, nband), np.float32)
        my = np.zeros((n, nband), np.float32)
        sy = np.ones((n, nband), np.float32)
        wins = np.zeros((n, 4), np.int32)

        for item in range(n):
            s_idx, cur = dataset._locate(item)
            scene = dataset.dslist[s_idx]
            base = scene.ds
            if base.transforms is not None:
                raise ValueError("DeviceOSCDCache does not support sync transforms")
            _, read, write = base.grid.slices(cur)
            wy, wx = write[1], write[0]
            xs[item, wy:wy + write[3], wx:wx + write[2]] = \
                base.raster_x.read_block(*read).astype(common)
            ys[item, wy:wy + write[3], wx:wx + write[2]] = \
                base.raster_y.read_block(*read).astype(common)
            if base.raster_ref is not None:
                refs[item, wy:wy + write[3], wx:wx + write[2]] = \
                    base.raster_ref.read_block(*read).astype(np.float32)
            if scene.raster_region is not None:
                # exact host semantics (data_utils.py:273-282): only values
                # >125 collapse to 1; smaller nonzero values pass through
                g = scene.raster_region.read_block(*read).astype(np.float32)
                regions[item, wy:wy + write[3], wx:wx + write[2]] = \
                    np.where(g > 125, np.float32(1), g)
            if base.enhance is not None:
                mx[item] = np.asarray(base.enhance.meansX[:nband], np.float32)
                sx[item] = np.asarray(base.enhance.stdX[:nband], np.float32)
                my[item] = np.asarray(base.enhance.meansY[:nband], np.float32)
                sy[item] = np.asarray(base.enhance.stdY[:nband], np.float32)
            wins[item] = write

        self._mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._bshard = batch_sharding(mesh)
            rshard = replicated(mesh)
            put = lambda a: jax.device_put(a, rshard)  # noqa: E731
        else:
            self._bshard = None
            put = jax.device_put

        self._stacks = tuple(put(a) for a in
                             (xs, ys, refs, regions, mx, sx, my, sy, wins))

        def prep(arr, xs, ys, refs, regions, mx, sx, my, sy, wins):
            idx = arr[:, 0]
            weight = arr[:, 1].astype(jnp.float32)
            win = wins[idx]
            row = jax.lax.broadcasted_iota(jnp.int32, (1, ph, 1, 1), 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pw, 1), 2)
            x0 = win[:, 0][:, None, None, None]
            y0 = win[:, 1][:, None, None, None]
            ww = win[:, 2][:, None, None, None]
            wh = win[:, 3][:, None, None, None]
            mask = (row >= y0) & (row < y0 + wh) & (col >= x0) & (col < x0 + ww)
            bx = (xs[idx].astype(jnp.float32) - mx[idx][:, None, None, :]) \
                / sx[idx][:, None, None, :]
            by = (ys[idx].astype(jnp.float32) - my[idx][:, None, None, :]) \
                / sy[idx][:, None, None, :]
            zero = jnp.float32(0)
            return (jnp.where(mask, bx, zero), jnp.where(mask, by, zero),
                    refs[idx], regions[idx], idx, weight)

        self._prep = jax.jit(prep)

    @staticmethod
    def supports(dataset) -> bool:
        from .normalize import Normalize

        if not len(dataset):
            return False
        for scene in dataset.dslist:
            if scene.ds.transforms is not None:
                return False
            e = scene.ds.enhance
            if e is not None and not isinstance(e, Normalize):
                return False
        ph, pw = dataset.dslist[0].ds.grid.canvas_shape()
        nband = dataset.dslist[0].ds.raster_x.nband
        # same dtype resolution as __init__: the x/y stacks are stored in the
        # scenes' common integral dtype when itemsize <= 2, else widened to
        # float32 — budget the TRUE per-item bytes, not a hardcoded 2
        dts = [s.ds.raster_x.dtype for s in dataset.dslist]
        dts += [s.ds.raster_y.dtype for s in dataset.dslist]
        common = np.result_type(*dts)
        if not (np.issubdtype(common, np.integer) and common.itemsize <= 2):
            common = np.dtype(np.float32)
        per = ph * pw * (2 * nband * common.itemsize + 4 + 4)  # + f32 ref/region
        limit = float(os.environ.get("FCDGAN_TILE_CACHE_MAX_MB", "4096"))
        return len(dataset) * per <= limit * 1e6

    def complete(self, batch: Dict) -> Dict:
        import jax

        arr = np.stack([np.asarray(batch["item"], np.int32),
                        np.asarray(batch["weight"], np.int32)], axis=1)
        if self._bshard is not None and arr.shape[0] % self._mesh.devices.size == 0:
            arr = jax.device_put(arr, self._bshard)
        x, y, ref, region, item, weight = self._prep(arr, *self._stacks)
        return Batch(x=x, y=y, ref=ref, region=region, item=item, weight=weight)

    def loader(self, batch_size: int, dataset, shuffle: bool = False,
               seed: int = 0, tail: str = "pad") -> IndexBatchLoader:
        if tail == "short" and self._mesh is not None:
            tail = "pad"  # batch-axis sharding needs the fixed shape
        return IndexBatchLoader(dataset, batch_size, shuffle=shuffle,
                                seed=seed, tail=tail)
