"""ctypes bindings for the native tile-I/O library (tileio.cpp).

Builds ``libtileio.so`` with g++ on first use (cached next to the source,
ignored by git). The native path replaces the Python raster codecs on the
data hot path: threaded window reads + batch canvas assembly with per-band
normalization, no GIL. ``native_available()`` gates usage; every consumer
falls back to the pure-Python codecs when the toolchain is absent."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tileio.cpp")
_SO = os.path.join(_HERE, "_build", "libtileio.so")

_lib = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO, "-lz",
           "-pthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.tio_open.restype = ctypes.c_int64
        lib.tio_open.argtypes = [ctypes.c_char_p]
        lib.tio_info.argtypes = [ctypes.c_int64] + [ctypes.POINTER(ctypes.c_int64)] * 3
        lib.tio_read_window_f32.restype = ctypes.c_int
        lib.tio_read_window_f32.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.tio_assemble_batch.restype = ctypes.c_int
        lib.tio_assemble_batch.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.tio_read_files_f32.restype = ctypes.c_int
        lib.tio_read_files_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.tio_close.argtypes = [ctypes.c_int64]
        lib.tio_dtype.restype = ctypes.c_int
        lib.tio_dtype.argtypes = [ctypes.c_int64]
        lib.tio_assemble_batch_raw.restype = ctypes.c_int
        lib.tio_assemble_batch_raw.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


#: DType enum codes (tileio.cpp) -> numpy dtypes
DTYPE_CODES = {0: np.uint8, 1: np.int8, 2: np.uint16, 3: np.int16,
               4: np.uint32, 5: np.int32, 6: np.float32, 7: np.float64}


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeRaster:
    """Window reads through the C++ reader."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native tileio unavailable: {_build_error}")
        self._lib = lib
        self._h = lib.tio_open(path.encode())
        if self._h == 0:
            raise ValueError(f"native tileio cannot open {path}")
        xs, ys, nb = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
        lib.tio_info(self._h, ctypes.byref(xs), ctypes.byref(ys), ctypes.byref(nb))
        self.xsize, self.ysize, self.nband = xs.value, ys.value, nb.value
        self.dtype_code = int(lib.tio_dtype(self._h))
        self.dtype = np.dtype(DTYPE_CODES.get(self.dtype_code, np.float32))
        self.path = path

    def read_block(self, xoff=0, yoff=0, w=None, h=None) -> np.ndarray:
        w = self.xsize - xoff if w is None else w
        h = self.ysize - yoff if h is None else h
        out = np.empty((h, w, self.nband), np.float32)
        rc = self._lib.tio_read_window_f32(
            self._h, xoff, yoff, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise ValueError(f"native read failed rc={rc}")
        return out

    def read_band(self, band, xoff=0, yoff=0, w=None, h=None) -> np.ndarray:
        return self.read_block(xoff, yoff, w, h)[..., band]

    def close(self):
        if self._h:
            self._lib.tio_close(self._h)
            self._h = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def read_files_f32(paths: Sequence[str], height: int, width: int, nband: int,
                   mean=None, std=None,
                   n_threads: Optional[int] = None) -> np.ndarray:
    """Threaded whole-image reads of uniform slice files into one
    (n, height, width, nband) float32 batch, optionally per-band normalized
    ((v - mean) / std) — the native WHU slice-image path (reference per-file
    PIL reads, data_utils.py:449-563)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native tileio unavailable: {_build_error}")
    n = len(paths)
    out = np.zeros((n, height, width, nband), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean_c = None if mean is None else np.ascontiguousarray(
        np.asarray(mean, np.float64)[:nband])
    std_c = None if std is None else np.ascontiguousarray(
        np.asarray(std, np.float64)[:nband])
    rc = lib.tio_read_files_f32(
        arr, n, width, height, nband,
        (mean_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
         if mean_c is not None else ctypes.POINTER(ctypes.c_double)()),
        (std_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
         if std_c is not None else ctypes.POINTER(ctypes.c_double)()),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads or min(8, os.cpu_count() or 4))
    if rc != 0:
        what = {-2: "open/read failure", -3: "shape mismatch"}.get(rc, rc)
        raise ValueError(f"native file batch read failed: {what}")
    return out


class NativePairAssembler:
    """Threaded batch assembly of normalized tile canvases for a scene pair.

    The native replacement for the per-item Python path of
    ScenePairDataset.__getitem__ + collation: one C call produces the full
    (n, patch_h, patch_w, nband) float32 x/y canvases."""

    def __init__(self, path_x: str, path_y: str, patch_size, overlap_padding,
                 mean_x=None, std_x=None, mean_y=None, std_y=None,
                 n_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native tileio unavailable: {_build_error}")
        self._lib = lib
        self.rx = NativeRaster(path_x)
        self.ry = NativeRaster(path_y)
        self.patch_size = patch_size
        self.pad = overlap_padding
        self.nband = self.rx.nband

        def cvt(v):
            if v is None:
                return None
            return np.ascontiguousarray(np.asarray(v, np.float64)[: self.nband])

        self.mean_x, self.std_x = cvt(mean_x), cvt(std_x)
        self.mean_y, self.std_y = cvt(mean_y), cvt(std_y)
        self.n_threads = n_threads or min(8, os.cpu_count() or 4)

    def assemble(self, items: Sequence[int]):
        n = len(items)
        pw, ph = self.patch_size
        items_arr = np.ascontiguousarray(np.asarray(items, np.int64))
        out_x = np.zeros((n, ph, pw, self.nband), np.float32)
        out_y = np.zeros((n, ph, pw, self.nband), np.float32)

        def dptr(a):
            if a is None:
                return ctypes.POINTER(ctypes.c_double)()
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

        rc = self._lib.tio_assemble_batch(
            self.rx._h, self.ry._h,
            items_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            pw, ph, self.pad[0], self.pad[1],
            dptr(self.mean_x), dptr(self.std_x), dptr(self.mean_y), dptr(self.std_y),
            out_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads)
        if rc != 0:
            raise ValueError(f"native assemble failed rc={rc}")
        return out_x, out_y

    def assemble_raw(self, items: Sequence[int]):
        """Zero-padded tile canvases in the rasters' NATIVE dtype, with NO
        normalization — the payload for device-side normalization (the
        affine (v-mean)/std + pad masking runs on the TPU; see
        data/pipeline.py DeviceNormalizer). Integral samples round-trip
        exactly. Requires both rasters to share one non-f64 dtype."""
        code = self.rx.dtype_code
        if code != self.ry.dtype_code or code not in DTYPE_CODES or code == 7:
            raise ValueError("raw assembly needs one shared non-f64 dtype")
        dt = DTYPE_CODES[code]
        n = len(items)
        pw, ph = self.patch_size
        items_arr = np.ascontiguousarray(np.asarray(items, np.int64))
        out_x = np.zeros((n, ph, pw, self.nband), dt)
        out_y = np.zeros((n, ph, pw, self.nband), dt)
        rc = self._lib.tio_assemble_batch_raw(
            self.rx._h, self.ry._h,
            items_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            pw, ph, self.pad[0], self.pad[1],
            out_x.ctypes.data_as(ctypes.c_void_p),
            out_y.ctypes.data_as(ctypes.c_void_p),
            code, self.n_threads)
        if rc != 0:
            raise ValueError(f"native raw assemble failed rc={rc}")
        return out_x, out_y

    def close(self):
        self.rx.close()
        self.ry.close()
