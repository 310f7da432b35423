"""OSCD regional-reference generator (reference: /root/reference/OSCDProcess.py).

For each scene dir ``{name}/ImagePair``: reads ``{name}-cm.tif`` (coded 1
unchanged / 2 changed, binarized at >1, OSCDProcess.py:57), expands each
connected component's bounding box by ``region_expand`` pixels and writes
``{name}-region.tif`` (OSCDProcess.py:59-78).

Run: ``python -m fcdgan_tpu.tools.oscd_process --in-path /OSCD-10m-Dataset``
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .building_process import expand_regions


def run(in_path: str, ext: str = ".tif", region_expand: int = 10) -> list:
    from PIL import Image

    written = []
    dir_names = [x for x in os.listdir(in_path)
                 if os.path.isdir(os.path.join(in_path, x))]
    for name in dir_names:
        cur = os.path.join(in_path, name, "ImagePair")
        if not os.path.isdir(cur):
            continue
        refs = [x for x in os.listdir(cur) if x.split("-")[-1] == "cm.tif"]
        if len(refs) != 1:
            raise ValueError(f"Reference {cur} cannot be found")
        ref = np.array(Image.open(os.path.join(cur, refs[0])))
        region = np.zeros_like(ref, dtype=np.uint8)
        region[ref > 1] = 255
        region = expand_regions(region, region_expand)
        out = os.path.join(cur, "{}-region{}".format(name, ext))
        Image.fromarray(np.uint8(region)).save(out)
        written.append(out)
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in-path", required=True)
    ap.add_argument("--region-expand", type=int, default=10)
    a = ap.parse_args(argv)
    run(a.in_path, region_expand=a.region_expand)


if __name__ == "__main__":
    main()
