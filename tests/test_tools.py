"""Offline dataset-preparation tools (BuildingProcess/OSCDProcess parity)."""

import os

import numpy as np
import pytest

from fcdgan_tpu.data.tiff import TiffWriter
from fcdgan_tpu.tools.building_process import expand_regions
from fcdgan_tpu.tools.building_process import run as building_run
from fcdgan_tpu.tools.oscd_process import run as oscd_run


def test_expand_regions_bbox_growth():
    mask = np.zeros((40, 40), np.uint8)
    mask[10:14, 12:18] = 255  # one component
    mask[30:32, 30:31] = 255  # another
    out = expand_regions(mask, region_expand=3)
    # first component bbox (10..13, 12..17) grown by 3 -> rows 7..16, cols 9..20
    assert (out[7:17, 9:21] == 255).all()
    assert out[6, 12] == 0 and out[17, 12] == 0
    # second component grown and clamped at the border
    assert (out[27:35, 27:34] == 255).all()
    # elsewhere zero
    assert out[0, 0] == 0


def test_expand_regions_clamps_at_borders():
    mask = np.zeros((20, 20), np.uint8)
    mask[0:2, 0:2] = 255
    out = expand_regions(mask, region_expand=10)
    assert (out[0:12, 0:12] == 255).all()
    assert out.shape == (20, 20)


def test_building_process_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    xsize, ysize = 70, 50
    img = rng.integers(0, 255, (ysize, xsize, 3)).astype(np.uint8)
    label = np.zeros((ysize, xsize), np.uint8)
    label[5:15, 5:20] = 1  # change only in the first tile

    for name, data, nb in (("before.tif", img, 3), ("after.tif", img, 3)):
        with TiffWriter(str(tmp_path / name), xsize, ysize, nb, np.uint8) as w:
            w.write_block(data)
    with TiffWriter(str(tmp_path / "label.tif"), xsize, ysize, 1, np.uint8) as w:
        w.write_block(label)

    out = str(tmp_path / "sliced")
    label_txt = building_run(str(tmp_path / "before.tif"), str(tmp_path / "after.tif"),
                             str(tmp_path / "label.tif"), out,
                             slice_x=32, slice_y=32, region_expand=4)
    # grid: x in {0,32,64}, y in {0,32} -> 6 tiles
    lines = open(label_txt).read().strip().split("\n")
    assert len(lines) == 6
    labels = {l.split(",")[0]: l.split(",")[3] for l in lines}
    assert labels["0_0.tif"] == "1"  # the changed tile
    assert sum(v == "1" for v in labels.values()) == 1
    for d in ("before", "after", "Label", "Region Label"):
        assert len(os.listdir(os.path.join(out, d))) == 6
    # region label covers the expanded bbox of the change
    from PIL import Image

    region = np.array(Image.open(os.path.join(out, "Region Label", "0_0.tif")))
    assert (region[1:19, 1:24] == 255).all()
    assert region[30, 30] == 0


def test_oscd_process_writes_region_rasters(tmp_path):
    from PIL import Image

    scene = tmp_path / "city" / "ImagePair"
    scene.mkdir(parents=True)
    cm = np.ones((30, 30), np.uint8)  # 1 = unchanged
    cm[10:16, 10:18] = 2  # changed
    Image.fromarray(cm).save(str(scene / "city-cm.tif"))

    written = oscd_run(str(tmp_path), region_expand=5)
    assert written == [str(scene / "city-region.tif")]
    region = np.array(Image.open(written[0]))
    assert (region[5:21, 5:23] == 255).all()
    assert region[0, 0] == 0
