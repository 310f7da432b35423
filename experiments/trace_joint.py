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


def analyze(outdir, steps, top=40, table=False):
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
    flops = defaultdict(float)
    bytes_ = defaultdict(float)
    cat = {}
    long_name = {}
    argkeys = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            a = e.get("args") or {}
            if "hlo_category" not in a:
                continue  # container/grouping lanes double-count real ops
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            agg[name] += dur
            total += dur
            cat[name] = a.get("hlo_category", "")
            long_name[name] = a.get("long_name", "")
            for k in a:
                argkeys[k] += 1
            for k in ("flops", "model_flops", "flop_count"):
                if k in a:
                    try:
                        flops[name] += float(a[k])
                    except (TypeError, ValueError):
                        pass
                    break
            for k in ("bytes accessed", "bytes_accessed", "memory_bandwidth"):
                if k in a:
                    try:
                        bytes_[name] += float(a[k])
                    except (TypeError, ValueError):
                        pass
                    break
    print(f"device pids: {sorted(dev_pids)} ({ {p: proc[p] for p in dev_pids} })")
    print(f"total device time: {total/1e3/steps:.2f} ms/step over {steps} steps")
    print(f"arg keys seen: {dict(sorted(argkeys.items(), key=lambda kv: -kv[1])[:12])}")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    # category roll-up: where the whole step goes
    by_cat = defaultdict(float)
    for name, dur in agg.items():
        by_cat[cat.get(name, "?")] += dur
    print("category roll-up (ms/step):",
          {c: round(d / 1e3 / steps, 1)
           for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1])})
    if table:
        # markdown per-op budget table (VERDICT r4 task 3): op, ms/step,
        # % of step, TF/s (from the trace's own flop counts), GB/s
        print("\n| op | cat | ms/step | % step | TF/s | GB/s | what |")
        print("|---|---|---|---|---|---|---|")
        for name, dur in rows:
            tf = flops[name] / (dur * 1e-6) / 1e12 if dur and flops[name] else 0
            gb = bytes_[name] / (dur * 1e-6) / 1e9 if dur and bytes_[name] else 0
            ln = long_name.get(name, "")[:90].replace("|", "/")
            print(f"| `{name[:40]}` | {cat.get(name, '')} | "
                  f"{dur/1e3/steps:.3f} | "
                  f"{100*dur/max(total,1e-9):.1f}% | "
                  f"{tf:.1f} | {gb:.0f} | `{ln}` |")
    else:
        for name, dur in rows:
            extra = ""
            if flops[name]:
                extra += f"  {flops[name]/(dur*1e-6)/1e12:6.1f} TF/s"
            if bytes_[name]:
                extra += f"  {bytes_[name]/(dur*1e-6)/1e9:5.0f} GB/s"
            print(f"{dur/1e3/steps:9.3f} ms  {100*dur/max(total,1e-9):5.1f}%"
                  f"{extra}  {name[:60]}  {long_name.get(name, '')[:70]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/jaxtrace_joint")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.analyze_only:
        run_trace(args.outdir, args.steps)
    analyze(args.outdir, args.steps, top=args.top, table=args.table)
