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
                 seed: int = 0):
        super().__init__(dataset, batch_size, fields=("item",),
                         shuffle=shuffle, seed=seed)

    def __iter__(self):
        for idx, weight in self._index_batches():
            yield Batch(item=np.asarray(idx, np.int64), weight=weight)


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
            dtype = dtype or block.dtype
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

        if normalize is not None:
            mx = np.asarray(normalize.meansX[:nband], np.float32)
            sx = np.asarray(normalize.stdX[:nband], np.float32)
            my = np.asarray(normalize.meansY[:nband], np.float32)
            sy = np.asarray(normalize.stdY[:nband], np.float32)
        else:  # identity (dataset built without an enhance)
            mx = my = np.zeros(nband, np.float32)
            sx = sy = np.ones(nband, np.float32)

        def prep(arr, px, py, pref, origins, wins):
            idx = arr[:, 0]
            weight = arr[:, 1].astype(jnp.float32)
            org = origins[idx]  # (B, 2) (row, col)
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

        self._prep = jax.jit(prep)

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
               seed: int = 0) -> IndexBatchLoader:
        return IndexBatchLoader(dataset, batch_size, shuffle=shuffle, seed=seed)
