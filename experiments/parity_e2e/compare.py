"""Assemble PARITY_E2E.md from the reference/rebuild result JSONs.

Usage: python compare.py <results_dir> <out_md>
Expects reference_{a,b,c}.json plus rebuild_{a,b,c}.json (production TPU
config) and/or rebuild_parity_{a,b,c}.json (f32 + per-branch BN numerics
mode) in results_dir; missing files render as em-dashes.
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
        "220px/pad 10) with the SAME schedule per scene and the SAME",
        "perception-VGG weights (the reference runs through shims that provide",
        "GDAL via fcdgan_tpu's codecs and VGG16 with fcdgan_tpu's exact",
        "weights — experiments/parity_e2e/shims/). Reference: torch CPU,",
        "UNMODIFIED training code (/root/reference/Demo_USSS.py, constants",
        "patched for paths/epochs only). Rebuild rows:",
        "",
        "- `rebuild` — production TPU config (bfloat16 mixed precision,",
        "  joint-stats siamese BN), on the v5e chip.",
        "- `rebuild-parity` — numerics-parity config (float32, per-branch BN",
        "  statistics), the closest configuration to the torch reference.",
        "",
    ]
    rows = []
    for s in scenes:
        ref = load(os.path.join(results_dir, f"reference_{s}.json"))
        reb = load(os.path.join(results_dir, f"rebuild_{s}.json"))
        par = load(os.path.join(results_dir, f"rebuild_parity_{s}.json"))
        rows.append((s, ref, reb, par))

    lines.append("## Final stitched-inference metrics (full scene, interior-only)")
    lines.append("")
    header = "| scene | framework | " + " | ".join(k.upper() for k in KEYS) + " |"
    lines.append(header)
    lines.append("|" + "---|" * (len(KEYS) + 2))
    for s, ref, reb, par in rows:
        for name, r in (("reference", ref), ("rebuild", reb), ("rebuild-parity", par)):
            if r is None and name != "reference":
                continue
            f = (r or {}).get("final") or {}
            lines.append(
                f"| {s} | {name} | " + " | ".join(fmt(f.get(k)) for k in KEYS) + " |"
            )
    lines.append("")

    lines.append("## Per-epoch F1 trajectory (joint phase)")
    lines.append("")
    for s, ref, reb, par in rows:
        if not ref:
            continue
        streams = [("reference", ref)] + [
            (n, r) for n, r in (("rebuild", reb), ("rebuild-parity", par)) if r
        ]
        ej = ref["epochs"][2]
        cols = {n: [t for t in r["trajectory"]][-ej:] for n, r in streams}
        lines.append(f"### scene_{s}")
        lines.append("")
        lines.append(
            "| epoch | "
            + " | ".join(f"{n} F1 | {n} kappa" for n, _ in streams)
            + " |"
        )
        lines.append("|" + "---|" * (1 + 2 * len(streams)))
        tr = cols["reference"]
        for i in range(0, len(tr), max(1, len(tr) // 10)):
            e = tr[i]["epoch"]
            cells = []
            for n, _ in streams:
                b = next((t for t in cols[n] if t["epoch"] == e), None)
                cells.append(fmt(b and b["f1"]))
                cells.append(fmt(b and b["kappa"]))
            lines.append(f"| {e} | " + " | ".join(cells) + " |")
        lines.append("")

    lines.append("## Wall clock (same schedule per scene; hardware differs by design)")
    lines.append("")
    lines.append("| scene | reference (torch, 1 CPU core) | rebuild (TPU v5e-1) | rebuild-parity |")
    lines.append("|---|---|---|---|")
    for s, ref, reb, par in rows:
        cells = [
            fmt(r and r.get("wall_s") and r["wall_s"] / 60) + (" min" if r else "")
            for r in (ref, reb, par)
        ]
        lines.append(f"| {s} | " + " | ".join(cells) + " |")
    lines.append("")

    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out_md)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
