"""Run the PyTorch reference Demo_USSS end-to-end in this image.

Execs /root/reference/Demo_USSS.py with (a) the osgeo/torchvision shims on
sys.path (GDAL replaced by fcdgan_tpu's codecs; VGG16 replaced by the exact
weights fcdgan_tpu's perception loss uses), and (b) the constants block
patched to point at the shared synthetic scene with configurable epochs
(VERDICT.md round-1 task 1 — NOT part of the framework; the reference source
itself is never copied into the repo, it is executed in place).

Usage: python run_reference.py <scene_dir> <epochs_G> <epochs_S> <epochs_joint> [out.json]
"""

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"

EPOCH_RE = re.compile(
    r"Epochs: (\d+)/(\d+), Overall Accuracy: ([\d.]+), Kappa: ([-\d.]+), "
    r"Precision Rate: ([\d.]+), Recall Rate: ([\d.]+), F1:([\d.]+), "
    r"mIOU:([\d.]+), cIoU:([\d.]+)"
)
FINAL_RE = re.compile(
    r"^Overall Accuracy: ([\d.]+), Kappa: ([-\d.]+), Precision Rate: ([\d.]+), "
    r"Recall Rate: ([\d.]+), F1:([\d.]+), mIOU:([\d.]+), cIoU:([\d.]+)",
    re.M,
)


def patch_source(src: str, scene_dir: str, eg: int, es: int, ej: int) -> str:
    subs = [
        (r"init_num_epochs_G = \d+", f"init_num_epochs_G = {eg}"),
        (r"init_num_epochs_S = \d+", f"init_num_epochs_S = {es}"),
        (r"num_epochs = \d+", f"num_epochs = {ej}"),
        (r"dir = r'/data'", "dir = r'%s'" % scene_dir),
    ]
    for pat, rep in subs:
        src, n = re.subn(pat, rep, src)
        assert n == 1, f"pattern {pat!r} matched {n} times"
    return src


def run(scene_dir: str, eg: int, es: int, ej: int, seed: int = 0) -> dict:
    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(1, REFERENCE)

    import torch

    torch.manual_seed(seed)
    import random

    random.seed(seed)
    import numpy as np

    np.random.seed(seed)

    path = os.path.join(REFERENCE, "Demo_USSS.py")
    with open(path) as f:
        src = patch_source(f.read(), scene_dir, eg, es, ej)

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    t0 = time.time()
    g = {"__name__": "__main__", "__file__": path}
    with redirect_stdout(Tee()):
        exec(compile(src, path, "exec"), g)
    wall = time.time() - t0

    # progress lines end with bare '\r'; normalize so ^-anchored patterns match
    out = buf.getvalue().replace("\r", "\n")
    traj = [
        dict(
            epoch=int(m[0]), of=int(m[1]), oa=float(m[2]), kappa=float(m[3]),
            precision=float(m[4]), recall=float(m[5]), f1=float(m[6]),
            miou=float(m[7]), ciou=float(m[8]),
        )
        for m in EPOCH_RE.findall(out)
    ]
    fm = FINAL_RE.search(out)
    final = (
        dict(
            oa=float(fm[1]), kappa=float(fm[2]), precision=float(fm[3]),
            recall=float(fm[4]), f1=float(fm[5]), miou=float(fm[6]),
            ciou=float(fm[7]),
        )
        if fm
        else None
    )
    return dict(
        scene=scene_dir, epochs=[eg, es, ej], wall_s=wall,
        trajectory=traj, final=final,
    )


if __name__ == "__main__":
    scene = sys.argv[1]
    eg, es, ej = (int(a) for a in sys.argv[2:5])
    out_json = sys.argv[5] if len(sys.argv) > 5 else None
    res = run(scene, eg, es, ej)
    print(json.dumps(res["final"]))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f, indent=1)
