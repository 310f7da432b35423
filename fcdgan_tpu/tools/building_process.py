"""WHU Building CD dataset slicer (reference: /root/reference/BuildingProcess.py).

Slices the large before/after/change-label rasters into fixed tiles, binarizes
labels, derives **regional** supervision maps by expanding each connected
component's bounding box, and writes before/after/Label/"Region Label" tile
dirs plus ``label.txt`` lines ``{x}_{y}{ext},0,0,{0|1}``
(BuildingProcess.py:88-167). Connected components use cv2 with 8-connectivity
(the reference's skimage ``connectivity=2``).

Run: ``python -m fcdgan_tpu.tools.building_process --in-path before.tif
--ref-path after.tif --label-path change_label.tif --out-path OutDir``
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.raster import open_raster


def expand_regions(mask: np.ndarray, region_expand: int) -> np.ndarray:
    """0/255 region map: each connected component's bbox grown by ``expand``
    (parity: BuildingProcess.py:131-145)."""
    import cv2

    out = np.zeros_like(mask, dtype=np.uint8)
    binary = (mask > 0).astype(np.uint8)
    n, labels = cv2.connectedComponents(binary, connectivity=8)
    h, w = mask.shape
    for comp in range(1, n):
        ys, xs = np.where(labels == comp)
        min_y = max(int(ys.min()) - region_expand, 0)
        min_x = max(int(xs.min()) - region_expand, 0)
        max_y = min(int(ys.max()) + 1 + region_expand, h)
        max_x = min(int(xs.max()) + 1 + region_expand, w)
        out[min_y:max_y, min_x:max_x] = 255
    return out


def run(
    in_path: str,
    ref_path: str,
    label_path: str,
    out_path: str,
    ref_ext: str = "before",
    tar_ext: str = "after",
    ext: str = ".tif",
    slice_x: int = 200,
    slice_y: int = 200,
    region_expand: int = 10,
) -> str:
    from PIL import Image

    ds_x = open_raster(in_path)
    ds_y = open_raster(ref_path)
    ds_ref = open_raster(label_path)
    if (ds_x.xsize, ds_x.ysize, ds_x.nband) != (ds_y.xsize, ds_y.ysize, ds_y.nband):
        raise ValueError("Image sizes don't match")
    if (ds_ref.xsize, ds_ref.ysize, ds_ref.nband) != (ds_x.xsize, ds_x.ysize, 1):
        raise ValueError("Image sizes don't match")
    xsize, ysize, nband = ds_x.xsize, ds_x.ysize, ds_x.nband

    dirs = {
        "ref": os.path.join(out_path, ref_ext),
        "tar": os.path.join(out_path, tar_ext),
        "label": os.path.join(out_path, "Label"),
        "region": os.path.join(out_path, "Region Label"),
    }
    os.makedirs(out_path, exist_ok=True)
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    xstart = list(range(0, xsize, slice_x))
    ystart = list(range(0, ysize, slice_y))

    label_lines = []
    for xs in xstart:
        for ys in ystart:
            w = min(slice_x, xsize - xs)
            h = min(slice_y, ysize - ys)
            tile_x = np.zeros((slice_y, slice_x, nband), np.float64)
            tile_y = np.zeros((slice_y, slice_x, nband), np.float64)
            tile_ref = np.zeros((slice_y, slice_x), np.float64)
            tile_x[:h, :w] = ds_x.read_block(xs, ys, w, h)
            tile_y[:h, :w] = ds_y.read_block(xs, ys, w, h)
            tile_ref[:h, :w] = ds_ref.read_block(xs, ys, w, h)[..., 0]
            tile_ref[tile_ref > 0] = 255

            change_label = 1 if tile_ref.sum() > 0 else 0
            tile_region = expand_regions(tile_ref.astype(np.uint8), region_expand)

            name = "{}_{}{}".format(xs, ys, ext)
            Image.fromarray(np.uint8(tile_x)).save(os.path.join(dirs["ref"], name))
            Image.fromarray(np.uint8(tile_y)).save(os.path.join(dirs["tar"], name))
            Image.fromarray(np.uint8(tile_ref)).save(os.path.join(dirs["label"], name))
            Image.fromarray(np.uint8(tile_region)).save(os.path.join(dirs["region"], name))
            label_lines.append("{},0,0,{}".format(name, change_label))

    label_txt = os.path.join(out_path, "label.txt")
    with open(label_txt, "w") as f:
        f.write("\n".join(label_lines) + "\n")
    return label_txt


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-path", required=True)
    ap.add_argument("--ref-path", required=True)
    ap.add_argument("--label-path", required=True)
    ap.add_argument("--out-path", required=True)
    ap.add_argument("--slice-x", type=int, default=200)
    ap.add_argument("--slice-y", type=int, default=200)
    ap.add_argument("--region-expand", type=int, default=10)
    a = ap.parse_args(argv)
    run(a.in_path, a.ref_path, a.label_path, a.out_path,
        slice_x=a.slice_x, slice_y=a.slice_y, region_expand=a.region_expand)


if __name__ == "__main__":
    main()
