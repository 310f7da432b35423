"""Max/min stat caches and sync'd dataset transforms (CommonFunc parity)."""

import numpy as np

from fcdgan_tpu.data.datasets import ScenePairDataset
from fcdgan_tpu.data.erasers import RandomEraser
from fcdgan_tpu.data.stats import dataset_maxmin, raster_maxmin
from fcdgan_tpu.data.synthetic import make_usss_scene
from fcdgan_tpu.data.tiff import TiffWriter


def test_raster_maxmin_cache(tmp_path):
    data = np.zeros((10, 12, 2), np.float32)
    data[2:8, 3:9, 0] = np.linspace(5, 50, 36).reshape(6, 6)
    data[2:8, 3:9, 1] = np.linspace(-4, 7, 36).reshape(6, 6)
    p = str(tmp_path / "img.tif")
    with TiffWriter(p, 12, 10, 2, np.float32) as w:
        w.write_block(data)
    txt = str(tmp_path / "mm.txt")
    mm = raster_maxmin(txt, p)
    # zeros are masked out per band (CommonFunc.py:264)
    assert mm[0] == [5.0, 50.0]
    assert mm[1][1] == 7.0
    # cache-hit path parses the txt
    mm2 = raster_maxmin(txt, "/nonexistent")  # must not touch the raster
    assert mm2 == [[5.0, 50.0], mm[1]]
    assert open(txt).readline().startswith("max:")


def test_dataset_maxmin_cache(tmp_path):
    paths = make_usss_scene(str(tmp_path / "s"), 64, 64, 3)
    ds = ScenePairDataset(paths["x"], paths["y"], patch_size=(32, 32),
                          overlap_padding=(0, 0))
    t1, t2 = str(tmp_path / "m1.txt"), str(tmp_path / "m2.txt")
    mm1, mm2 = dataset_maxmin(t1, t2, ds)
    assert len(mm1) == 3 and all(lo < hi for lo, hi in mm1)
    mm1b, mm2b = dataset_maxmin(t1, t2, None)  # cache hit
    np.testing.assert_allclose(mm1, mm1b)
    np.testing.assert_allclose(mm2, mm2b)


def test_scene_dataset_syncd_transforms(tmp_path):
    """The eraser's region applies identically to both temporal tiles
    (data_utils.py:126-128 sync protocol inside the dataset)."""
    paths = make_usss_scene(str(tmp_path / "s2"), 64, 64, 3)
    eraser = RandomEraser(origin_prob=0.0, rng=np.random.default_rng(0))
    ds = ScenePairDataset(paths["x"], paths["y"], transforms=eraser,
                          patch_size=(32, 32), overlap_padding=(0, 0))
    x, y, item, ref = ds[0]
    zx = (x == 0).all(axis=-1)
    zy = (y == 0).all(axis=-1)
    assert zx.any()  # something was erased
    np.testing.assert_array_equal(zx, zy)  # same region in both images
