"""Assemble PARITY_E2E.md from the reference/rebuild result JSONs.

Usage: python compare.py <results_dir> <out_md>
Expects reference_{a,b,c}.json and rebuild_{a,b,c}.json in results_dir.
"""

import json
import os
import sys

KEYS = ["oa", "kappa", "precision", "recall", "f1", "miou", "ciou"]


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def fmt(v):
    return "—" if v is None else f"{v:.4f}"


def main(results_dir, out_md):
    scenes = ["a", "b", "c"]
    lines = [
        "# PARITY_E2E — head-to-head: PyTorch reference vs fcdgan_tpu rebuild",
        "",
        "Both frameworks trained end-to-end on the SAME synthetic scenes",
        "(experiments/parity_e2e/make_scenes.py; 256x256x3, reference tiling",
        "220px/pad 10) with the SAME schedule and the SAME perception-VGG",
        "weights (the reference runs through shims that provide GDAL via",
        "fcdgan_tpu's codecs and VGG16 with fcdgan_tpu's exact weights —",
        "experiments/parity_e2e/shims/). Reference: torch CPU, unmodified",
        "training code (/root/reference/Demo_USSS.py, constants patched for",
        "paths/epochs only). Rebuild: this repo's demo_usss.",
        "",
    ]
    rows = []
    for s in scenes:
        ref = load(os.path.join(results_dir, f"reference_{s}.json"))
        reb = load(os.path.join(results_dir, f"rebuild_{s}.json"))
        rows.append((s, ref, reb))

    lines.append("## Final stitched-inference metrics (full scene, interior-only)")
    lines.append("")
    header = "| scene | framework | " + " | ".join(k.upper() for k in KEYS) + " |"
    lines.append(header)
    lines.append("|" + "---|" * (len(KEYS) + 2))
    for s, ref, reb in rows:
        for name, r in (("reference", ref), ("rebuild", reb)):
            f = (r or {}).get("final") or {}
            lines.append(
                f"| {s} | {name} | " + " | ".join(fmt(f.get(k)) for k in KEYS) + " |"
            )
    lines.append("")

    lines.append("## Per-epoch F1 trajectory (joint phase)")
    lines.append("")
    for s, ref, reb in rows:
        if not ref or not reb:
            continue
        tr = [t for t in ref["trajectory"]]
        tb = [t for t in reb["trajectory"]]
        # joint phase = last `ej` epochs of each trajectory stream
        ej = ref["epochs"][2]
        tr, tb = tr[-ej:], tb[-ej:]
        lines.append(f"### scene_{s}")
        lines.append("")
        lines.append("| epoch | reference F1 | rebuild F1 | reference kappa | rebuild kappa |")
        lines.append("|---|---|---|---|---|")
        for i in range(0, len(tr), max(1, len(tr) // 10)):
            e = tr[i]["epoch"]
            b = next((t for t in tb if t["epoch"] == e), None)
            lines.append(
                f"| {e} | {fmt(tr[i]['f1'])} | {fmt(b['f1'] if b else None)} | "
                f"{fmt(tr[i]['kappa'])} | {fmt(b['kappa'] if b else None)} |"
            )
        lines.append("")

    walls = [(s, r and r.get("wall_s"), b and b.get("wall_s")) for s, r, b in rows]
    lines.append("## Wall clock")
    lines.append("")
    lines.append("| scene | reference (torch CPU) | rebuild |")
    lines.append("|---|---|---|")
    for s, wr, wb in walls:
        lines.append(f"| {s} | {fmt(wr and wr / 60)} min | {fmt(wb and wb / 60)} min |")
    lines.append("")

    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out_md)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
