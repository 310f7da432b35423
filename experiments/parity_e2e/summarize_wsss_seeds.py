"""Summarize the WSSS multi-seed study (VERDICT r4 task 5).

Reads results/wsss_reference{,_s1,_s2}.json and
results/wsss_rebuild_parity{,_s1,_s2}.json (run_wsss_seeds.sh) and prints
markdown tables: per-epoch adversarial-phase train-set F1 mean [min, max]
per side, final changed-set inference metrics mean [min, max], and whether
each side's final F1 mean lands inside the other's seed range — the same
treatment RSSS got in round 4 (summarize_rsss_seeds.py). WSSS has no
per-epoch test pass (the reference Demo_WSSS.py evaluates the train
changed-pairs during training and the changed set once at the end), so the
trajectory table uses the train-set F1.

Usage: python summarize_wsss_seeds.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
R = os.path.join(HERE, "results")


def load(side):
    base = {"reference": "wsss_reference", "rebuild": "wsss_rebuild_parity"}[side]
    out = []
    for suffix, seed in (("", 0), ("_s1", 1), ("_s2", 2)):
        p = os.path.join(R, base + suffix + ".json")
        if os.path.exists(p):
            d = json.load(open(p))
            d["seed"] = seed
            out.append(d)
    return out


def spread(vals):
    lo, hi = min(vals), max(vals)
    mean = sum(vals) / len(vals)
    return mean, lo, hi


def main():
    ref, reb = load("reference"), load("rebuild")
    print(f"reference seeds: {[d['seed'] for d in ref]}, "
          f"rebuild-parity seeds: {[d['seed'] for d in reb]}\n")

    print("### Per-epoch adversarial-phase TRAIN F1, mean [min, max] over seeds\n")
    print("| epoch | reference | rebuild-parity |")
    print("|---|---|---|")
    n_ep = min(min(len(d["trajectory"]) for d in ref),
               min(len(d["trajectory"]) for d in reb))
    for ep in range(1, n_ep + 1, 2):
        cells = []
        for side in (ref, reb):
            m, lo, hi = spread([d["trajectory"][ep - 1]["f1"] for d in side])
            cells.append(f"{m:.4f} [{lo:.4f}, {hi:.4f}]")
        print(f"| {ep} | {cells[0]} | {cells[1]} |")

    print("\n### Final changed-set inference metrics, mean [min, max]\n")
    keys = ("oa", "kappa", "precision", "recall", "f1", "miou", "ciou")
    print("| metric | reference | rebuild-parity |")
    print("|---|---|---|")
    for k in keys:
        cells = []
        for side in (ref, reb):
            m, lo, hi = spread([d["final"][k] for d in side])
            cells.append(f"{m:.4f} [{lo:.4f}, {hi:.4f}]")
        print(f"| {k} | {cells[0]} | {cells[1]} |")

    rf = [d["final"]["f1"] for d in ref]
    bf = [d["final"]["f1"] for d in reb]
    print("\nper-seed final F1:")
    for side, vals, ds in (("reference", rf, ref), ("rebuild", bf, reb)):
        print(f"  {side}: " + ", ".join(
            f"s{d['seed']}={v:.4f}" for d, v in zip(ds, vals)))
    ref_mean = sum(rf) / len(rf)
    reb_mean = sum(bf) / len(bf)
    inside_ref = min(rf) <= reb_mean <= max(rf)
    inside_reb = min(bf) <= ref_mean <= max(bf)
    print(f"\nrebuild mean F1 {reb_mean:.4f} inside reference seed range "
          f"[{min(rf):.4f}, {max(rf):.4f}]: {inside_ref}")
    print(f"reference mean F1 {ref_mean:.4f} inside rebuild seed range "
          f"[{min(bf):.4f}, {max(bf):.4f}]: {inside_reb}")
    print("\nwall minutes per run:")
    for side, ds in (("reference", ref), ("rebuild", reb)):
        print(f"  {side}: " + ", ".join(
            f"s{d['seed']}={d['wall_s']/60:.1f}" for d in ds))


if __name__ == "__main__":
    main()
