"""Capture a device trace of the USSS joint step and print the top ops.

Writes /tmp/jaxtrace_joint and prints the dominant device ops by total
duration — ground truth for the ROADMAP MFU budget.

Run: python experiments/trace_joint.py [--steps 3]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_trace(outdir, steps):
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    st, g, s, d = bench._setup_usss_step()
    g, s, m = st.joint(g, s, d["x"], d["y"], d["ref"], d["item"], d["weight"], 1e-4, 1e-4)
    jax.block_until_ready(m["NetLoss"])
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            g, s, m = st.joint(g, s, d["x"], d["y"], d["ref"], d["item"],
                               d["weight"], 1e-4, 1e-4)
        jax.block_until_ready(m["NetLoss"])


def analyze(outdir, steps, top=40):
    paths = sorted(glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pick pids whose process name mentions TPU/device
    proc = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            agg[name] += dur
            total += dur
    print(f"device pids: {sorted(dev_pids)} ({ {p: proc[p] for p in dev_pids} })")
    print(f"total device time: {total/1e3/steps:.2f} ms/step over {steps} steps")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3/steps:9.3f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/jaxtrace_joint")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        run_trace(args.outdir, args.steps)
    analyze(args.outdir, args.steps)
