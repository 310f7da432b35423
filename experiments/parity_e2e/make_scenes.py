"""Generate the shared synthetic USSS scenes for the head-to-head parity run.

Both the PyTorch reference and the fcdgan_tpu rebuild train on these exact
rasters (VERDICT.md round-1 task 1). Scene size 256x256 keeps the reference's
own 220px/pad-10 tiling (4 tiles) while staying CPU-trainable; three seeds
give three independent scenes with different change geometries.
"""

import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from fcdgan_tpu.data.synthetic import make_usss_scene  # noqa: E402

SCENES = {
    "scene_a": dict(seed=11, rects=((40, 48, 36, 28), (150, 160, 40, 36))),
    "scene_b": dict(seed=22, rects=((20, 20, 30, 44), (120, 60, 52, 30), (170, 180, 34, 34))),
    "scene_c": dict(seed=33, rects=((80, 100, 60, 48),)),
}


def make_all(base_dir: str) -> dict:
    out = {}
    for name, kw in SCENES.items():
        d = os.path.join(base_dir, name)
        paths = make_usss_scene(d, xsize=256, ysize=256, nband=3, **kw)
        out[name] = paths
    return out


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_scenes"
    make_all(base)
    print("scenes written to", base)
