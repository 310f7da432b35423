"""Raster codec round-trips: GeoTIFF, ENVI, memory backend, PIL interop."""

import numpy as np
import pytest

from fcdgan_tpu.data.envi import EnviReader, write_envi
from fcdgan_tpu.data.raster import MemoryRaster, create_raster, open_raster
from fcdgan_tpu.data.tiff import TiffReader, TiffWriter

GT = (500000.0, 10.0, 0.0, 4649000.0, 0.0, -10.0)
PROJ = "EPSG:32631 WGS 84 / UTM zone 31N"


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32, np.float32, np.float64])
@pytest.mark.parametrize("nband", [1, 3, 4])
def test_tiff_round_trip(tmp_path, dtype, nband):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=(37, 53, nband)).astype(dtype)
    else:
        data = rng.integers(0, 100, size=(37, 53, nband)).astype(dtype)
    p = str(tmp_path / "t.tif")
    with TiffWriter(p, 53, 37, nband, dtype, GT, PROJ) as w:
        w.write_block(data)
    r = TiffReader(p)
    assert (r.xsize, r.ysize, r.nband) == (53, 37, nband)
    np.testing.assert_array_equal(r.read_block(), data)
    np.testing.assert_allclose(r.geotransform, GT)
    assert r.projection == PROJ


def test_tiff_random_access_writes_and_window_reads(tmp_path):
    p = str(tmp_path / "t.tif")
    w = TiffWriter(p, 100, 80, 1, np.float32, GT)
    w.write_block(np.full((10, 20), 3.0, np.float32), xoff=30, yoff=40)
    w.write_block(np.full((5, 5), 7.0, np.float32), xoff=0, yoff=0)
    w.close()
    r = TiffReader(p)
    np.testing.assert_array_equal(r.read_block(30, 40, 20, 10)[..., 0], np.full((10, 20), 3.0))
    np.testing.assert_array_equal(r.read_block(0, 0, 5, 5)[..., 0], np.full((5, 5), 7.0))
    assert float(r.read_block(60, 60, 10, 10).sum()) == 0.0
    with pytest.raises(Exception):
        r.read_block(95, 0, 10, 10)  # out of bounds


def test_tiff_single_row_raster(tmp_path):
    """nstrips == 1: the offsets array is stored inline in the IFD."""
    p = str(tmp_path / "row.tif")
    data = np.arange(12, dtype=np.float32).reshape(1, 12, 1)
    with TiffWriter(p, 12, 1, 1, np.float32) as w:
        w.write_block(data)
    np.testing.assert_array_equal(TiffReader(p).read_block(), data)


def test_tiff_pil_interop(tmp_path):
    """PIL must be able to open our uncompressed byte TIFFs, and we theirs."""
    from PIL import Image

    p = str(tmp_path / "rgb.tif")
    data = np.random.default_rng(1).integers(0, 255, (20, 30, 3)).astype(np.uint8)
    with TiffWriter(p, 30, 20, 3, np.uint8) as w:
        w.write_block(data)
    np.testing.assert_array_equal(np.array(Image.open(p)), data)

    # and read a PIL-written (possibly compressed) TIFF through our reader
    p2 = str(tmp_path / "pil.tif")
    Image.fromarray(data).save(p2)
    r = open_raster(p2)
    np.testing.assert_array_equal(r.read_block(), data)


def test_envi_round_trip_interleaves(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.normal(size=(17, 23, 4)).astype(np.float32)
    for il in ("bsq", "bil", "bip"):
        p = str(tmp_path / f"scene_{il}")
        write_envi(p, data, interleave=il, geotransform=GT)
        r = EnviReader(p)
        assert (r.xsize, r.ysize, r.nband) == (23, 17, 4)
        np.testing.assert_array_equal(r.read_block(), data)
        np.testing.assert_array_equal(r.read_block(5, 3, 7, 9), data[3:12, 5:12])
        np.testing.assert_allclose(r.geotransform, GT)


def test_open_raster_dispatch(tmp_path):
    # extension-less ENVI (the OSCD layout, data_utils.py:322)
    data = np.ones((8, 9, 2), np.int16)
    p = str(tmp_path / "abudhabi_20160120")
    write_envi(p, data)
    r = open_raster(p)
    assert isinstance(r, EnviReader)

    with pytest.raises(FileNotFoundError, match="No such a Image file"):
        open_raster(str(tmp_path / "missing.tif"))


def test_memory_raster_and_create_like(tmp_path):
    src = MemoryRaster(np.zeros((10, 12, 3), np.float32), GT, PROJ)
    out = create_raster(None, 12, 10, 1, np.float32, like=src)
    assert out.geotransform == GT and out.projection == PROJ
    out.write_block(np.ones((4, 4), np.float32), xoff=2, yoff=3)
    assert float(out.array[3:7, 2:6, 0].sum()) == 16.0

    p = str(tmp_path / "o.tif")
    w = create_raster(p, 12, 10, 1, np.float32, like=src)
    w.write_block(np.ones((10, 12), np.float32))
    w.close()
    r = TiffReader(p)
    np.testing.assert_allclose(r.geotransform, GT)
    assert r.projection == PROJ
