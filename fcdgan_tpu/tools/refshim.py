"""Shims that let the PyTorch reference run inside this GDAL-less image.

The reference (/root/reference) needs two external substrates this image
lacks: GDAL (``from osgeo import gdal``, data_utils.py:10-12) and
torchvision's pretrained VGG16 (``from torchvision.models.vgg import vgg16``,
Loss.py:8,25). :func:`install` registers minimal stand-ins in ``sys.modules``
**before** the reference modules are imported:

* ``osgeo.gdal`` — the exact API surface the reference touches
  (Open/ReadAsArray/GetDriver/Create/WriteArray/geo metadata;
  data_utils.py:33-236, CommonFunc.py:250-291), backed by this framework's
  own raster codecs, so both stacks literally read the same bytes.
* ``torchvision`` — ``vgg16(pretrained=True)`` returns a torch module whose
  ``.features`` Sequential carries the SAME weights as this framework's
  perception VGG (``fcdgan_tpu.models.vgg.load_vgg16_params``: the converted
  npz if present, else the fixed-seed random fallback). This makes the
  reference's PerceptionLoss and ours the *identical function*, so a
  head-to-head comparison isolates the frameworks rather than the weights.

Only used by the parity tooling (tools/run_reference_usss.py); never imported
by the framework itself.
"""

from __future__ import annotations

import sys
import types
from typing import Dict, Optional

import numpy as np

REFERENCE_DIR = "/root/reference"

# GDAL raster dtype codes (subset the reference uses: GDT_Float32/GDT_Int32,
# Demo_USSS.py:446, data_utils.py:192)
_GDT_TO_NP = {
    1: np.uint8, 2: np.uint16, 3: np.int16, 4: np.uint32, 5: np.int32,
    6: np.float32, 7: np.float64,
}


class _Band:
    def __init__(self, ds: "_Dataset", index: int):
        self._ds = ds
        self._index = index  # 1-based, GDAL style

    def ReadAsArray(self, xoff=0, yoff=0, win_xsize=None, win_ysize=None):
        r = self._ds._reader
        w = r.xsize - int(xoff) if win_xsize is None else int(win_xsize)
        h = r.ysize - int(yoff) if win_ysize is None else int(win_ysize)
        return r.read_band(self._index - 1, int(xoff), int(yoff), w, h)

    def WriteArray(self, arr, xoff=0, yoff=0):
        self._ds._writer_ready().write_block(
            np.asarray(arr), int(xoff), int(yoff), band=self._index - 1)
        return 0


class _Driver:
    def Create(self, path, xsize, ysize, bands=1, eType=6):
        return _Dataset.for_write(path, int(xsize), int(ysize), int(bands),
                                  _GDT_TO_NP.get(int(eType), np.float32))


class _Dataset:
    """Read mode wraps a framework raster reader; write mode creates the
    TiffWriter lazily at first WriteArray so SetGeoTransform/SetProjection
    calls (which GDAL allows post-Create, Demo_USSS.py:450-452) land first."""

    def __init__(self):
        self._reader = None
        self._writer = None
        self._write_spec = None
        self._gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)  # GDAL default
        self._proj = ""

    @classmethod
    def for_read(cls, path: str) -> Optional["_Dataset"]:
        from ..data.raster import open_raster

        ds = cls()
        try:
            ds._reader = open_raster(path)
        except Exception:
            return None
        gt = getattr(ds._reader, "geotransform", None)
        if gt is not None:
            ds._gt = tuple(gt)
        ds._proj = getattr(ds._reader, "projection", "") or ""
        return ds

    @classmethod
    def for_write(cls, path, xsize, ysize, bands, dtype):
        ds = cls()
        ds._write_spec = (path, xsize, ysize, bands, dtype)
        return ds

    def _writer_ready(self):
        if self._writer is None:
            from ..data.tiff import TiffWriter

            path, xs, ys, nb, dt = self._write_spec
            gt = None if self._gt == (0.0, 1.0, 0.0, 0.0, 0.0, 1.0) else self._gt
            self._writer = TiffWriter(path, xs, ys, nb, dt, geotransform=gt,
                                      projection=self._proj)
        return self._writer

    # -- GDAL dataset API used by the reference ----------------------------
    @property
    def RasterXSize(self):
        return self._reader.xsize if self._reader else self._write_spec[1]

    @property
    def RasterYSize(self):
        return self._reader.ysize if self._reader else self._write_spec[2]

    @property
    def RasterCount(self):
        return self._reader.nband if self._reader else self._write_spec[3]

    def GetRasterBand(self, i):
        return _Band(self, int(i))

    def GetGeoTransform(self):
        return self._gt

    def GetProjection(self):
        return self._proj

    def SetGeoTransform(self, gt):
        self._gt = tuple(float(v) for v in gt)
        return 0

    def SetProjection(self, proj):
        self._proj = proj or ""
        return 0

    def GetDriver(self):
        return _Driver()

    def FlushCache(self):
        if self._writer is not None:
            self._writer._mm.flush()


_open_writers = []


def _gdal_open(path, *a):
    ds = _Dataset.for_read(path)
    return ds


def flush_outputs():
    """Close every writer the shim created (parity harness calls this after
    the reference run so the rasters are complete on disk)."""
    for ds in _open_writers:
        if ds._writer is not None:
            ds._writer.close()
            ds._writer = None


def _build_torch_vgg16(weights: Dict[str, np.ndarray]):
    """Torch twin of fcdgan_tpu.models.vgg: the standard vgg16().features
    Sequential (31 entries, conv/ReLU pairs + 5 MaxPools) loaded with the
    given HWIO kernels (converted to OIHW)."""
    import torch
    import torch.nn as nn

    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M")
    layers = []
    in_c = 3
    li = 0
    for c in cfg:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            conv = nn.Conv2d(in_c, c, 3, padding=1)
            with torch.no_grad():
                k = np.transpose(weights[f"conv{li}_kernel"], (3, 2, 0, 1))
                conv.weight.copy_(torch.from_numpy(np.ascontiguousarray(k)))
                conv.bias.copy_(torch.from_numpy(weights[f"conv{li}_bias"]))
            layers.append(conv)
            layers.append(nn.ReLU(inplace=True))
            in_c = c
            li += 1
    features = nn.Sequential(*layers)

    class _VGG:
        def __init__(self, features):
            self.features = features

    return _VGG(features)


def install(vgg_npz: Optional[str] = None) -> None:
    """Register the osgeo + torchvision shims and put /root/reference on
    sys.path so ``import Module`` / ``import data_utils`` etc. resolve."""
    # --- osgeo ---
    osgeo = types.ModuleType("osgeo")
    gdal = types.ModuleType("osgeo.gdal")
    gdal.Open = _gdal_open
    gdal.GetDriverByName = lambda name: _Driver()
    gdal.GDT_Byte, gdal.GDT_UInt16, gdal.GDT_Int16 = 1, 2, 3
    gdal.GDT_UInt32, gdal.GDT_Int32 = 4, 5
    gdal.GDT_Float32, gdal.GDT_Float64 = 6, 7
    gdal.UseExceptions = lambda: None

    # track writers for flush_outputs()
    _orig_create = _Driver.Create

    def _tracked_create(self, path, xsize, ysize, bands=1, eType=6):
        ds = _orig_create(self, path, xsize, ysize, bands, eType)
        _open_writers.append(ds)
        return ds

    _Driver.Create = _tracked_create

    ogr = types.ModuleType("osgeo.ogr")
    osr = types.ModuleType("osgeo.osr")
    osgeo.gdal, osgeo.ogr, osgeo.osr = gdal, ogr, osr
    sys.modules.setdefault("osgeo", osgeo)
    sys.modules.setdefault("osgeo.gdal", gdal)
    sys.modules.setdefault("osgeo.ogr", ogr)
    sys.modules.setdefault("osgeo.osr", osr)

    # --- torchvision ---
    from ..models.vgg import load_vgg16_params

    weights = load_vgg16_params(vgg_npz)

    def vgg16(pretrained=False, **kw):
        return _build_torch_vgg16(weights)

    tv = types.ModuleType("torchvision")
    models_mod = types.ModuleType("torchvision.models")
    vgg_mod = types.ModuleType("torchvision.models.vgg")
    trans_mod = types.ModuleType("torchvision.transforms")
    vgg_mod.vgg16 = vgg16
    models_mod.vgg16 = vgg16
    models_mod.vgg = vgg_mod
    tv.models = models_mod
    tv.transforms = trans_mod
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", models_mod)
    sys.modules.setdefault("torchvision.models.vgg", vgg_mod)
    sys.modules.setdefault("torchvision.transforms", trans_mod)

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
