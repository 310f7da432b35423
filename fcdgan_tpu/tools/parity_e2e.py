"""Head-to-head accuracy parity: torch reference vs this framework (task 1).

Generates N synthetic bi-temporal scenes at the reference's production USSS
configuration (220x220 patches, pad 10, batch 10 — Demo_USSS.py:33-76),
trains BOTH stacks on the same scenes with the same epoch schedule and the
same VGG16 perception weights (via tools/refshim), and compares final
F1/kappa/OA/AUC plus per-step wall-clock. Writes PARITY_E2E.md.

The reference runs through its own modules (tools/run_reference_usss) on
torch CPU; this framework runs through demos/demo_usss on the requested
platform (TPU by default, CPU for the same-host step-time anchor).

Usage:
  python -m fcdgan_tpu.tools.parity_e2e --out /tmp/parity --scenes 3 \
      --epochs 5,5,10 --platform tpu
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

SCENE_RECTS = [
    # per-scene change layouts: count/size/position diversity
    ((60, 80, 60, 50), (260, 280, 70, 60), (150, 330, 40, 40)),
    ((40, 40, 90, 70), (300, 120, 50, 90)),
    ((100, 100, 30, 30), (200, 60, 40, 60), (320, 300, 80, 40), (60, 320, 50, 50)),
]


def rank_auc(score: np.ndarray, label: np.ndarray) -> float:
    """Exact AUC via the rank statistic (ties handled by average ranks)."""
    score = score.ravel()
    label = label.ravel().astype(bool)
    n_pos = int(label.sum())
    n_neg = label.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(score, kind="mergesort")
    ranks = np.empty(score.size, np.float64)
    sorted_scores = score[order]
    i = 0
    while i < score.size:
        j = i
        while j + 1 < score.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return float((ranks[label].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def make_scenes(out_dir: str, n: int):
    from ..data.synthetic import make_usss_scene

    scenes = []
    for s in range(n):
        d = os.path.join(out_dir, f"scene{s}")
        rects = SCENE_RECTS[s % len(SCENE_RECTS)]
        paths = make_usss_scene(d, 440, 440, 3, rects=rects, seed=s)
        scenes.append({"dir": d, "mask": paths["mask"]})
    return scenes


def run_reference(scene_dir: str, epochs, seed: int) -> dict:
    """Reference in a subprocess: the shims must install before any
    reference import, and torch must not share this process with jax."""
    cmd = [sys.executable, "-m", "fcdgan_tpu.tools.run_reference_usss",
           "--dir", scene_dir, "--epochs-g", str(epochs[0]),
           "--epochs-s", str(epochs[1]), "--epochs-joint", str(epochs[2]),
           "--seed", str(seed)]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    if out.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{out.stderr[-4000:]}")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["wall_seconds"] = time.time() - t0
    return res


def run_ours(scene_dir: str, epochs, seed: int, platform=None) -> dict:
    """This framework, in a subprocess for a fair fresh-process wall-clock
    (and so repeated runs don't share jit caches)."""
    cmd = [sys.executable, "-m", "fcdgan_tpu.tools._parity_child",
           scene_dir, str(epochs[0]), str(epochs[1]), str(epochs[2]),
           str(seed), platform or ""]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    if out.returncode != 0:
        raise RuntimeError(f"framework run failed:\n{out.stderr[-4000:]}")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["wall_seconds"] = time.time() - t0
    return res


def density_auc(density_path: str, mask: np.ndarray) -> float:
    from ..data.tiff import TiffReader

    r = TiffReader(density_path)
    dens = r.read_block()[..., 0]
    r.close()
    return rank_auc(dens, mask)


def write_report(path: str, rows, epochs, notes):
    lines = [
        "# PARITY_E2E — reference (PyTorch) vs fcdgan-tpu, same scenes, same weights",
        "",
        "Head-to-head USSS training at the reference's production configuration",
        "(patch 220x220, overlap 10, batch 10, Adam 2e-4, l1 0.65 / perception 0.4",
        f"/ ssim 0; Demo_USSS.py:33-76) with a reduced epoch schedule {epochs}",
        "(G-pretrain / S-init / joint) on synthetic 440x440 bi-temporal scenes.",
        "Both stacks read the same rasters and use the SAME fixed-seed VGG16",
        "perception weights (tools/refshim.py hands our weights to the reference's",
        "PerceptionLoss), so the optimized objective is identical.",
        "",
        "| scene | framework | F1 | kappa | OA | precision | recall | AUC | joint step (s) | total wall (s) |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            "| {scene} | {fw} | {f1:.4f} | {kappa:.4f} | {oa:.4f} | {prec:.4f} "
            "| {rec:.4f} | {auc:.4f} | {step} | {wall:.0f} |".format(**r))
    lines += [""] + list(notes)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--epochs", default="5,5,10")
    ap.add_argument("--platform", default=None, help="ours: tpu (default) or cpu")
    ap.add_argument("--report", default="/root/repo/PARITY_E2E.md")
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args(argv)
    epochs = tuple(int(v) for v in args.epochs.split(","))
    os.makedirs(args.out, exist_ok=True)

    scenes = make_scenes(args.out, args.scenes)
    rows = []
    results = {"epochs": epochs, "scenes": []}
    for s, sc in enumerate(scenes):
        entry = {"dir": sc["dir"]}
        ours = run_ours(sc["dir"], epochs, seed=s, platform=args.platform)
        ours["auc"] = density_auc(ours["density_path"], sc["mask"])
        entry["ours"] = ours
        rows.append(dict(scene=f"scene{s}", fw="fcdgan-tpu", f1=ours["f1"],
                         kappa=ours["kappa"], oa=ours["oa"], prec=ours["precision"],
                         rec=ours["recall"], auc=ours["auc"],
                         step="{:.2f}".format(ours["joint_step_seconds"])
                         if ours.get("joint_step_seconds") else "-",
                         wall=ours["wall_seconds"]))
        print(json.dumps({"scene": s, "ours": {k: ours[k] for k in
                                               ("f1", "kappa", "auc")}}), flush=True)
        if not args.skip_reference:
            ref = run_reference(sc["dir"], epochs, seed=s)
            ref["auc"] = density_auc(ref["density_path"], sc["mask"])
            entry["reference"] = ref
            rows.append(dict(scene=f"scene{s}", fw="reference", f1=ref["f1"],
                             kappa=ref["kappa"], oa=ref["oa"], prec=ref["precision"],
                             rec=ref["recall"], auc=ref["auc"],
                             step="{:.2f}".format(ref["step_seconds"]["joint"])
                             if ref["step_seconds"].get("joint") else "-",
                             wall=ref["wall_seconds"]))
            print(json.dumps({"scene": s, "reference": {k: ref[k] for k in
                                                        ("f1", "kappa", "auc")}}),
                  flush=True)
        results["scenes"].append(entry)
        with open(os.path.join(args.out, "parity_results.json"), "w") as f:
            json.dump(results, f, indent=1, default=str)

    notes = [
        "Notes:",
        "- Same scenes, same epoch schedule, same loss weights, same VGG16",
        "  perception weights; seeds differ only in data order and init draws.",
        "- The reference runs on torch CPU (this container has no GPU); ours on",
        "  the platform shown. Accuracy metrics are platform-independent;",
        "  step/wall times are not directly comparable across platforms and are",
        "  reported as measured context.",
        "- AUC is threshold-free (rank statistic of the stitched density raster",
        "  against the planted change mask) - the most seed-robust of the",
        "  metrics at these short schedules.",
    ]
    write_report(args.report, rows, epochs, notes)
    print("report:", args.report)


if __name__ == "__main__":
    main()
