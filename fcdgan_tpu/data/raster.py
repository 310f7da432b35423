"""Raster abstraction — the GDAL-role layer of the framework.

``open_raster`` dispatches on content/extension to the bundled codecs
(GeoTIFF: data/tiff.py, ENVI: data/envi.py, PNG/JPG via PIL) and to an
in-memory backend for tests. ``create_raster`` creates writable rasters with
copied geo metadata — the role GDAL's ``driver.Create`` +
``SetGeoTransform/SetProjection`` plays in the reference
(/root/reference/data_utils.py:190-198).

When a native accelerator library is built (fcdgan_tpu/native), TIFF window
reads transparently go through the C++ tile reader; the Python codecs remain
the portable fallback.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np

from . import envi as envi_mod
from . import tiff as tiff_mod

GeoTransform = Tuple[float, float, float, float, float, float]


class MemoryRaster:
    """In-memory raster with reader+writer interface (tests, MEM driver role)."""

    def __init__(self, data: np.ndarray, geotransform: Optional[GeoTransform] = None,
                 projection: str = ""):
        if data.ndim == 2:
            data = data[..., None]
        self._data = data
        self.ysize, self.xsize, self.nband = data.shape
        self.dtype = data.dtype
        self.geotransform = geotransform
        self.projection = projection
        self.path = None

    def read_block(self, xoff=0, yoff=0, w=None, h=None) -> np.ndarray:
        w = self.xsize - xoff if w is None else w
        h = self.ysize - yoff if h is None else h
        return np.array(self._data[yoff : yoff + h, xoff : xoff + w, :])

    def read_band(self, band, xoff=0, yoff=0, w=None, h=None) -> np.ndarray:
        return self.read_block(xoff, yoff, w, h)[..., band]

    def write_block(self, arr: np.ndarray, xoff=0, yoff=0, band=None):
        if arr.ndim == 2:
            b = 0 if band is None else band
            self._data[yoff : yoff + arr.shape[0], xoff : xoff + arr.shape[1], b] = arr
        else:
            self._data[yoff : yoff + arr.shape[0], xoff : xoff + arr.shape[1], :] = arr

    @property
    def array(self) -> np.ndarray:
        return self._data

    def close(self):
        pass


class _PilRaster:
    """Read-only adapter for PNG/JPG slice images (WHU dataset path)."""

    def __init__(self, path: str):
        from PIL import Image

        self.path = path
        img = np.array(Image.open(path))
        if img.ndim == 2:
            img = img[..., None]
        self._data = img
        self.ysize, self.xsize, self.nband = img.shape
        self.dtype = img.dtype
        self.geotransform = None
        self.projection = ""

    def read_block(self, xoff=0, yoff=0, w=None, h=None):
        w = self.xsize - xoff if w is None else w
        h = self.ysize - yoff if h is None else h
        return np.array(self._data[yoff : yoff + h, xoff : xoff + w, :])

    def read_band(self, band, xoff=0, yoff=0, w=None, h=None):
        return self.read_block(xoff, yoff, w, h)[..., band]

    def close(self):
        pass


RasterLike = Union[MemoryRaster, tiff_mod.TiffReader, envi_mod.EnviReader, _PilRaster]


def open_raster(path_or_raster) -> RasterLike:
    """Open a raster by path (TIFF/ENVI/PNG/JPG) or pass one through."""
    if not isinstance(path_or_raster, (str, os.PathLike)):
        return path_or_raster
    path = str(path_or_raster)
    if not os.path.exists(path):
        raise FileNotFoundError(f"No such a Image file:{path}")
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] in (b"II", b"MM") and magic[2:4] in (b"*\0", b"\0*", b"*\x00", b"\x00*"):
        try:
            return tiff_mod.TiffReader(path)
        except tiff_mod.TiffError:
            pass
    ext = os.path.splitext(path)[1].lower()
    if ext in (".png", ".jpg", ".jpeg"):
        return _PilRaster(path)
    if os.path.exists(envi_mod.hdr_path_for(path)):
        return envi_mod.EnviReader(path)
    if ext in (".tif", ".tiff"):
        return tiff_mod.TiffReader(path)  # raise the codec's error
    raise ValueError(f"unrecognized raster format: {path}")


def create_raster(
    path: Optional[str],
    xsize: int,
    ysize: int,
    nband: int = 1,
    dtype=np.float32,
    like: Optional[RasterLike] = None,
    geotransform: Optional[GeoTransform] = None,
    projection: Optional[str] = None,
):
    """Create a writable raster (TIFF on disk, MemoryRaster when path is None).

    ``like`` copies geotransform/projection from a source raster — the
    GDALwriteDefault metadata-copy behaviour (data_utils.py:197-198).
    """
    if like is not None:
        geotransform = geotransform or getattr(like, "geotransform", None)
        projection = projection if projection is not None else getattr(like, "projection", "")
    if path is None:
        return MemoryRaster(
            np.zeros((ysize, xsize, nband), dtype), geotransform, projection or ""
        )
    return tiff_mod.TiffWriter(
        path, xsize, ysize, nband, dtype, geotransform, projection or ""
    )
