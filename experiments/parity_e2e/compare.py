"""Assemble PARITY_E2E.md from the reference/rebuild result JSONs.

Usage: python compare.py <results_dir> <out_md>
USSS: expects reference_{a,b,c}.json plus rebuild_{a,b,c}.json (production
TPU config) and/or rebuild_parity_{a,b,c}.json (f32 + per-branch BN
numerics mode) in results_dir; missing files render as em-dashes.
WSSS/RSSS: expects {mode}_reference.json / {mode}_rebuild_parity.json /
{mode}_rebuild.json; sections are omitted while absent.
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

    lines += [
        "## Reading the results",
        "",
        "- **At convergence the stacks agree.** Scene A ran the full reference",
        "  schedule (15/15/40). Final F1: reference 0.8954, rebuild-parity",
        "  0.8995, rebuild 0.8847 — the reference lands *between* the two",
        "  rebuild configurations (ΔF1 < 0.011), and the joint-phase",
        "  trajectories overlap throughout.",
        "- **Training dynamics are at parity on every scene.** Scenes B/C ran a",
        "  deliberately short schedule (10/10/25), leaving all stacks",
        "  mid-convergence; their *in-training* (train-mode BN, tile-interior)",
        "  metrics track closely — last joint epoch F1: B 0.29/0.40/0.33,",
        "  C 0.24/0.21/0.22 (reference/rebuild/rebuild-parity).",
        "- **The large scene-B/C gaps in the final table are an eval-mode-BN",
        "  effect, not a training gap.** Final stitched inference runs",
        "  eval-mode (BN running stats). With one 4-tile batch per epoch the",
        "  running stats are high-variance on under-converged models: the",
        "  reference's final drops below its own train-mode metric (B",
        "  0.29→0.17, C 0.24→0.11) while the rebuild's rises (B 0.40→0.83,",
        "  C 0.21→0.49). In no case does the reference beat the rebuild.",
        "",
        "## Same-host CPU step-time anchor (cpu_anchor.py)",
        "",
        "Torch has no TPU backend, so the only same-hardware throughput",
        "comparison is CPU-vs-CPU on this host's single core, f32, identical",
        "configuration (4-tile 220px joint step): reference 97 s/epoch (its",
        "own uncontended progress lines), rebuild jitted joint step 70.5",
        "s/epoch -> **1.38x** (results/cpu_anchor.json). The TPU production",
        "numbers are in BENCH_r0*.json / BASELINE.md.",
        "",
    ]
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

    lines += render_xload_section(results_dir)
    lines += render_mode_sections(results_dir)

    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out_md)


def render_xload_section(results_dir):
    """Cross-load rows: the reference's trained SModel.pkl served by OUR
    stitched inference (xload.py via io/torch_interop) vs the reference's
    own final inference on the same scene."""
    rows = [(f"usss/{s}", load(os.path.join(results_dir, f"xload_{s}.json")))
            for s in ("a", "b", "c")]
    rows += [(m, load(os.path.join(results_dir, f"{m}_xload.json")))
             for m in ("wsss", "rsss")]
    rows = [(s, r) for s, r in rows if r]
    if not rows:
        return []
    lines = [
        "## Cross-load: reference-trained torch weights served by this framework",
        "",
        "The reference's own trained ``SModel.pkl`` pickles, converted on load",
        "(io/torch_interop) and run through ``tools/infer.py`` stitched/slice",
        "inference (f32) on the same data — model-level parity independent of",
        "training dynamics. usss/* rows: scene-mode stitched rasters; wsss:",
        "``--mode whu`` with the reference's train-mode-BN final-inference",
        "quirk (``--bn-mode train``, prob 0.6); rsss: ``--mode oscd``",
        "per-scene stitched rasters over test.txt. Reference row = its own",
        "final inference (rounded to 4 decimals in the stored results).",
        "",
        "| run | framework | " + " | ".join(k.upper() for k in KEYS) + " |",
        "|" + "---|" * (len(KEYS) + 2),
    ]
    for s, r in rows:
        for name, f in (("reference", r["reference_final"]),
                        ("xload (ours)", r["xload_final"])):
            lines.append(f"| {s} | {name} | "
                         + " | ".join(fmt(f.get(k)) for k in KEYS) + " |")
    deltas = [abs(v) for _, r in rows for v in r["delta"].values()]
    if deltas:
        lines += ["", f"Max |delta| across all runs/metrics: **{max(deltas):.2e}**"
                  " (usss/wsss within the 4-decimal rounding of the stored"
                  " reference metrics; rsss ~3e-4 = a handful of"
                  " threshold-boundary pixels from f32 conv accumulation-order"
                  " differences on the 4-band scenes)."]
    lines.append("")
    return lines


MODE_BLURB = {
    "wsss": (
        "## WSSS head-to-head (Demo_WSSS: weakly-supervised, full GAN)",
        "Synthetic WHU-style slice dataset (data.synthetic.make_whu_dataset,",
        "12x 200px slices, 6 changed / 6 unchanged), same schedule both",
        "sides (G-pretrain / adversarial epochs below), reference exec'd",
        "unmodified through the shims. Final = the reference's",
        "train-mode-BN inference over the changed set (Demo_WSSS.py:389-442",
        "semantics on both sides).",
    ),
    "rsss": (
        "## RSSS head-to-head (Demo_RSSS: regional-supervised, OSCD-style)",
        "Synthetic OSCD-style ENVI scenes (data.synthetic.make_oscd_dataset,",
        "256x256x4, train scene 'alpha', test scene 'gamma'), shared",
        "per-scene statsMS caches, same schedule both sides. Final = the",
        "stitched test-scene inference metrics. Both sides run the",
        "reference's per-epoch test eval in train-mode BN (Demo_RSSS.py",
        "never calls netS.eval() in the adversarial loop, so its :415 test",
        "forward uses batch statistics and the running stats absorb the",
        "test batches; rebuild flag --test-eval-bn train). The FINAL",
        "inference on both sides is eval-mode BN — which is why each",
        "side's final F1 sits below its last train-mode test-eval point.",
        "GAN trajectories are seed-noisy (the reference's own train F1",
        "moves 0.06->0.34 between epochs 7 and 9); the shapes and final",
        "deltas below are within that between-seed spread.",
    ),
}


def render_mode_sections(results_dir):
    """WSSS/RSSS sections: final + trajectory + wall clock per mode."""
    lines = []
    for mode in ("wsss", "rsss"):
        streams = [
            (n, load(os.path.join(results_dir, f"{mode}_{f}.json")))
            for n, f in (("reference", "reference"),
                         ("rebuild", "rebuild"),
                         ("rebuild-parity", "rebuild_parity"))
        ]
        streams = [(n, r) for n, r in streams if r]
        if not any(n == "reference" for n, _ in streams):
            continue
        ref = dict(streams)["reference"]
        lines += list(MODE_BLURB[mode]) + [""]
        eg, eadv = ref["epochs"][0], ref["epochs"][1]
        lines.append(f"Schedule: {eg} G-pretrain + {eadv} adversarial epochs.")
        lines.append("")
        lines.append("### Final metrics")
        lines.append("")
        lines.append("| framework | " + " | ".join(k.upper() for k in KEYS) + " |")
        lines.append("|" + "---|" * (len(KEYS) + 1))
        for n, r in streams:
            f = r.get("final") or {}
            lines.append(f"| {n} | " + " | ".join(fmt(f.get(k)) for k in KEYS) + " |")
        lines.append("")
        lines.append("### Per-epoch F1 trajectory (adversarial phase)")
        lines.append("")
        lines.append("| epoch | " + " | ".join(f"{n} F1 | {n} kappa" for n, _ in streams) + " |")
        lines.append("|" + "---|" * (1 + 2 * len(streams)))
        tr = [t for t in ref["trajectory"] if t["of"] == eadv]
        cols = {n: [t for t in r["trajectory"] if t["of"] == eadv] for n, r in streams}
        for i in range(0, len(tr), max(1, len(tr) // 10)):
            e = tr[i]["epoch"]
            cells = []
            for n, _ in streams:
                b = next((t for t in cols[n] if t["epoch"] == e), None)
                cells.append(fmt(b and b["f1"]))
                cells.append(fmt(b and b["kappa"]))
            lines.append(f"| {e} | " + " | ".join(cells) + " |")
        lines.append("")
        if mode == "rsss" and any(r.get("test_trajectory") for _, r in streams):
            lines.append("### Per-epoch TEST-scene F1 (RSSS evaluates test each epoch)")
            lines.append("")
            lines.append("| epoch | " + " | ".join(f"{n} test F1" for n, _ in streams) + " |")
            lines.append("|" + "---|" * (1 + len(streams)))
            ntest = len(ref.get("test_trajectory") or [])
            for i in range(0, ntest, max(1, ntest // 10)):
                cells = []
                for n, r in streams:
                    tt = r.get("test_trajectory") or []
                    cells.append(fmt(tt[i]["f1"] if i < len(tt) else None))
                lines.append(f"| {i + 1} | " + " | ".join(cells) + " |")
            lines.append("")
        lines.append("### Wall clock")
        lines.append("")
        lines.append("| framework | minutes |")
        lines.append("|---|---|")
        for n, r in streams:
            w = r.get("wall_s")
            lines.append(f"| {n} | " + (f"{w / 60:.1f}" if w else "—") + " |")
        lines.append("")
    return lines


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
