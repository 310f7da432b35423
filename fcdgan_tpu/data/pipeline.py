"""Host -> device batch pipeline: fixed shapes, wrap padding, prefetch.

The reference feeds the GPU through a torch DataLoader whose last batch is
smaller (shape change => XLA recompile). Here every epoch yields fixed-shape
batches: the tail is wrap-padded with extra samples whose ``weight`` is 0, so
jitted steps compile once and the weighted losses/metrics reproduce true-batch
semantics exactly (see ops/losses.py).

``prefetch`` runs dataset item assembly in background threads and keeps a
bounded queue of ready batches so raster decode overlaps device compute —
the "prefetched tile pipeline feeding TPU HBM" of the north star
(SURVEY.md section 3.4). ``device_put_sharded_batch`` places a host batch
onto a data-parallel mesh in one transfer."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class Batch(dict):
    """A dict batch with attribute access (x, y, ref, item, weight, ...)."""

    __getattr__ = dict.__getitem__


def _collate(samples: Sequence[tuple], fields: Sequence[str]) -> Batch:
    out = Batch()
    for i, name in enumerate(fields):
        vals = [s[i] for s in samples]
        if np.isscalar(vals[0]) or np.asarray(vals[0]).ndim == 0:
            out[name] = np.asarray(vals)
        else:
            out[name] = np.stack(vals)
    return out


class BatchLoader:
    """Epoch iterator over a dataset producing fixed-shape weighted batches.

    ``fields`` names the dataset's tuple positions (e.g. USSS:
    ('x','y','item','ref')). The final partial batch is wrap-padded from the
    epoch's own permutation with weight 0 (``tail='pad'``, fixed shapes) or
    yielded SHORT (``tail='short'``) — the reference's torch semantics
    (``drop_last=False`` runs the true partial batch, so its train-mode BN
    statistics see only real samples) and no duplicate compute; the jitted
    steps compile a second (tail-size) executable once. Use 'pad' under a
    device mesh (batch-axis sharding needs the fixed shape)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        fields: Sequence[str],
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        epoch_hook: Optional[Callable[[int], None]] = None,
        tail: str = "pad",
    ):
        if tail not in ("pad", "short"):
            raise ValueError("tail must be 'pad' or 'short'")
        self.dataset = dataset
        self.batch_size = batch_size
        self.fields = tuple(fields)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.tail = tail
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        self._epoch_hook = epoch_hook

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def _index_batches(self):
        """Yield (idx, weight) per batch: shuffled epoch order, tail
        wrap-padded to a fixed shape with weight-0 entries."""
        if self._epoch_hook is not None:
            self._epoch_hook(self._epoch)
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        for start in range(0, stop, bs):
            idx = order[start : start + bs]
            weight = np.ones(len(idx), np.float32)
            if len(idx) < bs and self.tail == "pad":  # wrap-pad to fixed shape
                extra = order[: bs - len(idx)]
                if len(extra) < bs - len(idx):  # dataset smaller than batch
                    extra = np.resize(order, bs - len(idx))
                idx = np.concatenate([idx, extra])
                weight = np.concatenate([weight, np.zeros(bs - len(weight), np.float32)])
            yield idx, weight

    def __iter__(self) -> Iterator[Batch]:
        for idx, weight in self._index_batches():
            samples = [self.dataset[int(i)] for i in idx]
            batch = _collate(samples, self.fields)
            batch["weight"] = weight
            yield batch


class PairBatchLoader(BatchLoader):
    """BatchLoader over pair datasets (WHUPairDataset): yields (changed,
    unchanged) Batch pair with a shared weight vector."""

    def __init__(self, dataset, batch_size, c_fields, nc_fields, **kw):
        self._c_fields = tuple(c_fields)
        self._nc_fields = tuple(nc_fields)

        class _Adapter:
            def __init__(self, ds):
                self.ds = ds

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                c, nc = self.ds[i]
                return tuple(c) + tuple(nc)

        super().__init__(_Adapter(dataset), batch_size,
                         fields=tuple(f"c_{f}" for f in c_fields)
                         + tuple(f"nc_{f}" for f in nc_fields), **kw)


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded ready queue."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: List[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


class NativeSceneBatchLoader(BatchLoader):
    """BatchLoader over a ScenePairDataset whose x/y tile assembly runs in the
    native C++ thread pool (fcdgan_tpu/native). The 1-band reference tile
    still goes through the Python path (it's a fraction of the bytes).

    Falls back to the plain Python loader semantics for everything else —
    identical batches, same fields, same wrap padding.

    ``device_normalize=True`` ships RAW tiles in the rasters' native dtype
    (u8/u16/...) plus per-tile write windows, and leaves the per-band
    (v-mean)/std + zero-pad masking to :class:`DeviceNormalizer` ON DEVICE —
    2-4x fewer host->device bytes for integral rasters (the upload path is
    the measured driver bottleneck on remote-relay links, and the cut feeds
    multi-chip DP on real hardware too). Requires a Normalize enhance and a
    shared integral raster dtype; refuse otherwise (use
    ``supports_device_normalize`` to probe)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, n_threads: Optional[int] = None,
                 device_normalize: bool = False):
        from .. import native

        if not native.native_available():
            raise RuntimeError(f"native tileio unavailable: {native.build_error()}")
        if dataset.transforms is not None:
            raise ValueError("native loader does not support sync transforms")
        enhance = dataset.enhance
        kw = {}
        if enhance is not None:
            from .normalize import Normalize

            if not isinstance(enhance, Normalize):
                raise ValueError("native loader supports Normalize enhance only")
            kw = dict(mean_x=enhance.meansX, std_x=enhance.stdX,
                      mean_y=enhance.meansY, std_y=enhance.stdY)
        self._asm = native.NativePairAssembler(
            dataset.raster_x.path, dataset.raster_y.path,
            dataset.patch_size, dataset.overlap_padding,
            n_threads=n_threads, **(dict() if device_normalize else kw))
        self.device_normalize = bool(device_normalize)
        if self.device_normalize:
            # enhance None is fine: DeviceNormalizer falls back to the
            # identity affine (raw tiles still want the on-device pad mask)
            code = self._asm.rx.dtype_code
            if code != self._asm.ry.dtype_code or code not in (0, 1, 2, 3, 4, 5):
                raise ValueError(
                    "device_normalize requires a shared integral raster dtype")
            # per-item write windows (x0, y0, w, h) — pure grid arithmetic
            wins = []
            for i in range(len(dataset)):
                _, _, write = dataset.grid.slices(i)
                wins.append(write)
            self._wins = np.asarray(wins, np.int32)
            rr = dataset.raster_ref
            self._ref_dtype = (
                rr.dtype if rr is not None and np.issubdtype(rr.dtype, np.integer)
                and rr.dtype.itemsize <= 2 else np.dtype(np.float32))
        super().__init__(dataset, batch_size, fields=("x", "y", "item", "ref"),
                         shuffle=shuffle, seed=seed)

    @staticmethod
    def supports_device_normalize(dataset) -> bool:
        """True when this dataset can ship raw tiles for on-device
        normalization (native loader up, Normalize enhance or none, no
        transforms, shared integral raster dtype)."""
        from .. import native
        from .normalize import Normalize

        if not native.native_available() or dataset.transforms is not None:
            return False
        if dataset.enhance is not None and not isinstance(dataset.enhance,
                                                          Normalize):
            return False
        try:
            rx = native.NativeRaster(dataset.raster_x.path)
            ry = native.NativeRaster(dataset.raster_y.path)
            ok = (rx.dtype_code == ry.dtype_code
                  and rx.dtype_code in (0, 1, 2, 3, 4, 5))
            rx.close()
            ry.close()
            return ok
        except Exception:
            return False

    def __iter__(self) -> Iterator[Batch]:
        raw = self.device_normalize
        ph, pw = self.dataset.patch_size[1], self.dataset.patch_size[0]
        ref_dt = self._ref_dtype if raw else np.float32
        for idx, weight in self._index_batches():
            if raw:
                x, y = self._asm.assemble_raw(idx.tolist())
            else:
                x, y = self._asm.assemble(idx.tolist())
            refs = []
            for i in idx:
                ref = np.zeros((ph, pw, 1), ref_dt)
                if self.dataset.raster_ref is not None:
                    _, read, write = self.dataset.grid.slices(int(i))
                    r = self.dataset.raster_ref.read_block(*read).astype(ref_dt)
                    ref[write[1]:write[1] + write[3], write[0]:write[0] + write[2], :] = r
                refs.append(ref)
            batch = Batch(x=x, y=y, item=np.asarray(idx, np.int64),
                          ref=np.stack(refs), weight=weight)
            if raw:
                batch["win"] = self._wins[np.asarray(idx, np.int64)]
            yield batch


class NativeOSCDBatchLoader(BatchLoader):
    """BatchLoader over an OSCDDataset with per-scene native C++ assembly.

    x/y tile canvases come from one NativePairAssembler per scene (items in a
    batch are grouped by scene and assembled in the thread pool); the 1-band
    ref/region tiles stay on the Python path. Yields the same
    (x, y, item, ref, region, weight) batches as the Python loader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, n_threads: Optional[int] = None):
        from .. import native
        from .normalize import Normalize

        if not native.native_available():
            raise RuntimeError(f"native tileio unavailable: {native.build_error()}")
        self._assemblers = []
        for scene in dataset.dslist:
            base = scene.ds
            if base.transforms is not None:
                raise ValueError("native loader does not support sync transforms")
            kw = {}
            if base.enhance is not None:
                if not isinstance(base.enhance, Normalize):
                    raise ValueError("native loader supports Normalize enhance only")
                kw = dict(mean_x=base.enhance.meansX, std_x=base.enhance.stdX,
                          mean_y=base.enhance.meansY, std_y=base.enhance.stdY)
            self._assemblers.append(native.NativePairAssembler(
                base.raster_x.path, base.raster_y.path,
                base.patch_size, base.overlap_padding, n_threads=n_threads, **kw))
        self._cumlen = list(dataset.cumlen)
        super().__init__(dataset, batch_size,
                         fields=("x", "y", "item", "ref", "region"),
                         shuffle=shuffle, seed=seed)

    def _locate(self, item: int):
        ds_idx = int(np.searchsorted(np.asarray(self._cumlen), item, side="right"))
        cur = item - self._cumlen[ds_idx - 1] if ds_idx > 0 else item
        return ds_idx, cur

    def __iter__(self) -> Iterator[Batch]:
        ds = self.dataset
        bs = self.batch_size
        ph, pw = ds.patch_size[1], ds.patch_size[0]
        nb = self._assemblers[0].nband
        for idx, weight in self._index_batches():
            x = np.zeros((bs, ph, pw, nb), np.float32)
            y = np.zeros((bs, ph, pw, nb), np.float32)
            # group batch positions by scene, one assembler call per scene
            by_scene: Dict[int, list] = {}
            locals_: list = []
            for pos, gi in enumerate(idx):
                s, cur = self._locate(int(gi))
                by_scene.setdefault(s, []).append((pos, cur))
                locals_.append((s, cur))
            for s, entries in by_scene.items():
                items = [cur for _, cur in entries]
                sx, sy = self._assemblers[s].assemble(items)
                for k, (pos, _) in enumerate(entries):
                    x[pos] = sx[k]
                    y[pos] = sy[k]
            refs = np.zeros((bs, ph, pw, 1), np.float32)
            regions = np.zeros((bs, ph, pw, 1), np.float32)
            for pos, (s, cur) in enumerate(locals_):
                scene = ds.dslist[s]
                base = scene.ds
                _, read, write = base.grid.slices(cur)
                if base.raster_ref is not None:
                    r = base.raster_ref.read_block(*read).astype(np.float32)
                    refs[pos, write[1]:write[1] + write[3],
                         write[0]:write[0] + write[2], :] = r
                if scene.raster_region is not None:
                    g = scene.raster_region.read_block(*read).astype(np.float32)
                    regions[pos, write[1]:write[1] + write[3],
                            write[0]:write[0] + write[2], :] = g
            regions[regions > 125] = 1
            yield Batch(x=x, y=y, item=np.asarray(idx, np.int64), ref=refs,
                        region=regions, weight=weight)


class _WHUNativeReader:
    """Native threaded slice-file reads for a WHUDataset: whole-image x/y
    batches with fused per-band normalization, refs binarized host-side
    (they are a fraction of the bytes). Supports ``scale=None`` or a
    Normalize; sync transforms (erasers) stay on the Python path."""

    def __init__(self, ds, n_threads: Optional[int] = None):
        from .. import native
        from .normalize import Normalize

        if not native.native_available():
            raise RuntimeError(f"native tileio unavailable: {native.build_error()}")
        if ds.transforms is not None:
            raise ValueError("native loader does not support sync transforms")
        self.mean_x = self.std_x = self.mean_y = self.std_y = None
        if ds.scale is not None:
            if not isinstance(ds.scale, Normalize):
                raise ValueError("native loader supports Normalize scale only")
            self.mean_x, self.std_x = ds.scale.meansX, ds.scale.stdX
            self.mean_y, self.std_y = ds.scale.meansY, ds.scale.stdY
        self._native = native
        self.ds = ds
        probe = native.NativeRaster(ds.img_path_x[0])
        self.h, self.w, self.nband = probe.ysize, probe.xsize, probe.nband
        probe.close()
        # label columns 1..3 as ints; column 3 == 1 marks a changed slice
        self.labels = np.asarray(
            [[int(v) for v in li[1:4]] for li in ds.label_list], np.int32)
        self.n_threads = n_threads

    def batch(self, idx) -> Dict:
        ds = self.ds
        x = self._native.read_files_f32(
            [ds.img_path_x[int(i)] for i in idx], self.h, self.w, self.nband,
            mean=self.mean_x, std=self.std_x, n_threads=self.n_threads)
        y = self._native.read_files_f32(
            [ds.img_path_y[int(i)] for i in idx], self.h, self.w, self.nband,
            mean=self.mean_y, std=self.std_y, n_threads=self.n_threads)
        ref = np.zeros((len(idx), self.h, self.w, 1), np.float32)
        changed = [(pos, int(i)) for pos, i in enumerate(idx)
                   if self.labels[int(i), 2] == 1]
        if changed:
            r = self._native.read_files_f32(
                [ds.ref_path[i] for _, i in changed], self.h, self.w, 1,
                n_threads=self.n_threads)
            for k, (pos, _) in enumerate(changed):
                ref[pos] = (r[k] > 0).astype(np.float32)
        label = self.labels[np.asarray(idx, np.int64)]
        return dict(x=x, y=y, ref=ref, label=label)


class NativeWHUBatchLoader(BatchLoader):
    """BatchLoader over a WHUDataset with native threaded slice reads —
    identical (x, y, ref, item, label) batches to the Python loader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, n_threads: Optional[int] = None, **kw):
        self._reader = _WHUNativeReader(dataset, n_threads)
        super().__init__(dataset, batch_size,
                         fields=("x", "y", "ref", "item", "label"),
                         shuffle=shuffle, seed=seed, **kw)

    def __iter__(self) -> Iterator[Batch]:
        for idx, weight in self._index_batches():
            b = self._reader.batch(idx)
            yield Batch(item=np.asarray(idx, np.int64), weight=weight, **b)


class NativeWHUPairBatchLoader(BatchLoader):
    """PairBatchLoader equivalent over a WHUPairDataset (changed/unchanged
    per-epoch pairing) with native threaded slice reads. Requires the
    deterministic ``random_assign=False`` pairing (the demo default) so the
    pair indices are table lookups rather than per-access RNG draws."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, n_threads: Optional[int] = None, **kw):
        if dataset.random_assign:
            raise ValueError("native pair loader requires random_assign=False")
        self._pair = dataset
        self._c = _WHUNativeReader(dataset.c_ds, n_threads)
        self._nc = _WHUNativeReader(dataset.nc_ds, n_threads)
        super().__init__(dataset, batch_size,
                         fields=tuple(f"c_{f}" for f in ("x", "y", "ref", "item", "label"))
                         + tuple(f"nc_{f}" for f in ("x", "y", "ref", "item", "label")),
                         shuffle=shuffle, seed=seed, **kw)

    def __iter__(self) -> Iterator[Batch]:
        for idx, weight in self._index_batches():
            idx_c = [self._pair.c_order[int(i)] for i in idx]
            idx_nc = [self._pair.nc_order[int(i)] for i in idx]
            bc = self._c.batch(idx_c)
            bnc = self._nc.batch(idx_nc)
            yield Batch(weight=weight,
                        **{f"c_{k}": v for k, v in bc.items()},
                        c_item=np.asarray(idx_c, np.int64),
                        **{f"nc_{k}": v for k, v in bnc.items()},
                        nc_item=np.asarray(idx_nc, np.int64))


class DeviceNormalizer:
    """Device-side completion of a raw batch: per-band affine
    ``(v - mean) / std`` plus zero-pad masking from the per-tile write
    windows, in one tiny jitted elementwise pass (fused by XLA; the f32
    canvases never cross the host->device link).

    Numerics: the same f32 subtract/divide as the host Normalize
    (data/normalize.py) — agreement is within 1 ulp (TPU f32 division may
    differ in the last place from numpy's; asserted in
    tests/test_native.py)."""

    def __init__(self, normalize, nband: int):
        import jax
        import jax.numpy as jnp

        if normalize is None:  # identity affine (dataset has no enhance)
            mx = my = np.zeros(nband, np.float32)
            sx = sy = np.ones(nband, np.float32)
        else:
            mx = np.asarray(normalize.meansX[:nband], np.float32)
            sx = np.asarray(normalize.stdX[:nband], np.float32)
            my = np.asarray(normalize.meansY[:nband], np.float32)
            sy = np.asarray(normalize.stdY[:nband], np.float32)

        def prep(x_raw, y_raw, ref_raw, win):
            row = jax.lax.broadcasted_iota(jnp.int32, (1, x_raw.shape[1], 1, 1), 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, x_raw.shape[2], 1), 2)
            x0 = win[:, 0][:, None, None, None]
            y0 = win[:, 1][:, None, None, None]
            ww = win[:, 2][:, None, None, None]
            wh = win[:, 3][:, None, None, None]
            mask = (row >= y0) & (row < y0 + wh) & (col >= x0) & (col < x0 + ww)
            xf = (x_raw.astype(jnp.float32) - mx) / sx
            yf = (y_raw.astype(jnp.float32) - my) / sy
            zero = jnp.float32(0)
            return (jnp.where(mask, xf, zero), jnp.where(mask, yf, zero),
                    ref_raw.astype(jnp.float32))

        self._prep = jax.jit(prep, donate_argnums=(0, 1, 2))

    def __call__(self, batch: Dict) -> Dict:
        """Raw device batch (x, y, ref, win, ...) -> normalized f32 batch."""
        if "win" not in batch:
            return batch
        x, y, ref = self._prep(batch["x"], batch["y"], batch["ref"], batch["win"])
        out = Batch({k: v for k, v in batch.items() if k != "win"})
        out["x"], out["y"], out["ref"] = x, y, ref
        return out


def device_put_batch(batch: Dict, sharding=None) -> Dict:
    """Move a host batch to device(s); with a NamedSharding the batch axis is
    split across the data-parallel mesh in a single transfer."""
    import jax

    out = Batch()
    for k, v in batch.items():
        out[k] = jax.device_put(v, sharding) if sharding is not None else jax.device_put(v)
    return out
