"""gdal module shim backed by fcdgan_tpu.data.tiff / envi codecs.

API surface = what the reference uses (see package docstring). Write-mode
datasets buffer in memory and flush to a real TIFF on FlushCache/close/del,
because GDAL sets geotransform/projection *after* Create while TiffWriter
takes them at construction.
"""

import atexit
import os
import sys

import numpy as np

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..", ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from fcdgan_tpu.data import raster as _raster  # noqa: E402
from fcdgan_tpu.data.tiff import TiffWriter  # noqa: E402

# GDAL data-type codes (subset)
GDT_Byte = 1
GDT_UInt16 = 2
GDT_Int16 = 3
GDT_UInt32 = 4
GDT_Int32 = 5
GDT_Float32 = 6
GDT_Float64 = 7

_GDT_TO_NP = {
    GDT_Byte: np.uint8,
    GDT_UInt16: np.uint16,
    GDT_Int16: np.int16,
    GDT_UInt32: np.uint32,
    GDT_Int32: np.int32,
    GDT_Float32: np.float32,
    GDT_Float64: np.float64,
}


class _Band:
    def __init__(self, ds, index0):
        self._ds = ds
        self._i = index0

    def ReadAsArray(self, xoff=0, yoff=0, win_xsize=None, win_ysize=None):
        return self._ds._read_band(self._i, xoff, yoff, win_xsize, win_ysize)

    def WriteArray(self, array, xoff=0, yoff=0):
        self._ds._write_band(self._i, np.asarray(array), xoff, yoff)
        return 0


class Dataset:
    """Read-mode: wraps a fcdgan raster reader. Write-mode: memory buffer."""

    def __init__(self, reader=None, *, path=None, xsize=None, ysize=None,
                 nband=None, dtype=None):
        self._reader = reader
        self._path = path
        if reader is not None:
            self.RasterXSize = reader.xsize
            self.RasterYSize = reader.ysize
            self.RasterCount = reader.nband
            self._buf = None
        else:
            self.RasterXSize = xsize
            self.RasterYSize = ysize
            self.RasterCount = nband
            self._buf = np.zeros((ysize, xsize, nband), dtype)
            self._gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
            self._proj = ""
            self._flushed = False
            _OPEN_WRITERS.append(self)

    # -- read path ----------------------------------------------------------
    def _read_band(self, i, xoff, yoff, w, h):
        if self._reader is not None:
            return self._reader.read_band(i, xoff, yoff, w, h)
        w = self.RasterXSize - xoff if w is None else w
        h = self.RasterYSize - yoff if h is None else h
        return self._buf[yoff : yoff + h, xoff : xoff + w, i]

    def GetRasterBand(self, i):
        return _Band(self, i - 1)

    def GetGeoTransform(self):
        if self._reader is not None:
            gt = getattr(self._reader, "geotransform", None)
            gt = gt() if callable(gt) else gt
            return tuple(gt) if gt else (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        return self._gt

    def GetProjection(self):
        if self._reader is not None:
            pj = getattr(self._reader, "projection", None)
            pj = pj() if callable(pj) else pj
            return pj or ""
        return self._proj

    def GetDriver(self):
        return Driver("GTiff")

    # -- write path ----------------------------------------------------------
    def SetGeoTransform(self, gt):
        self._gt = tuple(gt)
        return 0

    def SetProjection(self, proj):
        self._proj = proj or ""
        return 0

    def _write_band(self, i, arr, xoff, yoff):
        if self._buf is None:
            raise RuntimeError("dataset opened read-only")
        h, w = arr.shape
        self._buf[yoff : yoff + h, xoff : xoff + w, i] = arr
        self._flushed = False

    def FlushCache(self):
        if self._buf is not None and not self._flushed:
            with TiffWriter(self._path, self.RasterXSize, self.RasterYSize,
                            self.RasterCount, self._buf.dtype,
                            self._gt, self._proj) as wtr:
                wtr.write_block(self._buf)
            self._flushed = True
        return 0

    def __del__(self):
        try:
            self.FlushCache()
        except Exception:
            pass


_OPEN_WRITERS = []


@atexit.register
def _flush_all():
    # the reference never closes its output datasets; GDAL flushes on
    # process exit — replicate that
    for ds in _OPEN_WRITERS:
        try:
            ds.FlushCache()
        except Exception:
            pass


class Driver:
    def __init__(self, name):
        self.ShortName = name

    def Create(self, path, xsize, ysize, bands=1, eType=GDT_Byte, options=None):
        return Dataset(path=path, xsize=xsize, ysize=ysize, nband=bands,
                       dtype=_GDT_TO_NP[eType])


def Open(path, *args):
    if not os.path.exists(path):
        return None  # GDAL convention: Open returns None on failure
    return Dataset(reader=_raster.open_raster(path))


def GetDriverByName(name):
    return Driver(name)


def UseExceptions():
    pass


def AllRegister():
    pass
