"""Shared helpers for the per-mode head-to-head runners (WSSS/RSSS).

Same methodology as the USSS pair (run_reference.py / run_rebuild.py):
the UNMODIFIED reference demo script is exec'd with the osgeo/torchvision
shims on sys.path and only its constants block regex-patched (paths,
epochs, batch sizes); the rebuild runs its driver on the same data with
the same schedule and seeds. Output parsing is shared because the rebuild
reproduces the reference's progress-line formats.
"""

import io
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
REFERENCE = "/root/reference"

_METRICS = (
    r"Overall Accuracy: ([\d.]+), Kappa: ([-\d.]+), Precision Rate: ([\d.]+), "
    r"Recall Rate: ([\d.]+), F1:([\d.]+), mIOU:([\d.]+), cI[oO]U:([\d.]+)"
)
EPOCH_RE = re.compile(r"Epochs: (\d+)/(\d+), " + _METRICS)
TEST_RE = re.compile(r"Test Dataset: " + _METRICS)
# WSSS final: 'Segmentation, Overall Accuracy: ...'; USSS/RSSS final is the
# bare metrics line at line start
FINAL_RE = re.compile(r"^(?:Segmentation, )?" + _METRICS, re.M)


def _row(m, offset=0):
    keys = ("oa", "kappa", "precision", "recall", "f1", "miou", "ciou")
    return {k: float(v) for k, v in zip(keys, m[offset:])}


def parse_output(out: str) -> dict:
    out = out.replace("\r", "\n")
    traj = [dict(epoch=int(m[0]), of=int(m[1]), **_row(m, 2))
            for m in EPOCH_RE.findall(out)]
    test_traj = [_row(m) for m in TEST_RE.findall(out)]
    fm = None
    for fm in FINAL_RE.finditer(out):
        pass  # keep the LAST match (per-epoch RSSS test lines precede it)
    final = _row(fm.groups()) if fm else None
    return dict(trajectory=traj, test_trajectory=test_traj, final=final)


class Tee(io.TextIOBase):
    def __init__(self):
        self.buf = io.StringIO()

    def write(self, s):
        self.buf.write(s)
        sys.__stdout__.write(s)
        return len(s)

    def flush(self):
        sys.__stdout__.flush()


def seed_everything(seed: int):
    import random

    import numpy as np
    import torch

    torch.manual_seed(seed)
    random.seed(seed)
    np.random.seed(seed)


def patch_source(src: str, subs) -> str:
    for pat, rep in subs:
        src, n = re.subn(pat, rep, src)
        assert n == 1, f"pattern {pat!r} matched {n} times"
    return src


def exec_reference(demo: str, subs, seed: int = 0) -> dict:
    """Exec /root/reference/<demo> with shims + patched constants; parse."""
    if os.path.join(HERE, "shims") not in sys.path:
        sys.path.insert(0, os.path.join(HERE, "shims"))
    if REFERENCE not in sys.path:
        sys.path.insert(1, REFERENCE)
    seed_everything(seed)
    path = os.path.join(REFERENCE, demo)
    with open(path) as f:
        src = patch_source(f.read(), subs)
    import contextlib

    tee = Tee()
    t0 = time.time()
    g = {"__name__": "__main__", "__file__": path}
    with contextlib.redirect_stdout(tee):
        exec(compile(src, path, "exec"), g)
    res = parse_output(tee.buf.getvalue())
    res["wall_s"] = time.time() - t0
    return res


def run_rebuild_driver(run_fn, cfg) -> dict:
    """Run a rebuild driver under stdout capture; parse the same formats."""
    import contextlib

    tee = Tee()
    t0 = time.time()
    with contextlib.redirect_stdout(tee):
        out = run_fn(cfg)
    res = parse_output(tee.buf.getvalue())
    res["wall_s"] = time.time() - t0
    ev = out["evaluator"]
    miou, ciou = ev.Mean_Intersection_over_Union()
    res["final"] = dict(
        oa=float(ev.Pixel_Accuracy()), kappa=float(ev.Pixel_Kappa()),
        precision=float(ev.Pixel_Precision_Rate()),
        recall=float(ev.Pixel_Recall_Rate()), f1=float(ev.Pixel_F1_score()),
        miou=float(miou), ciou=float(ciou),
    )
    return res
