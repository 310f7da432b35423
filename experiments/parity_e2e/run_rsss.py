"""RSSS head-to-head: reference Demo_RSSS.py vs fcdgan_tpu demo_rsss.

Usage:
  python run_rsss.py data <dir> [xsize ysize seed]
  python run_rsss.py reference <dir> <epochs_G> <epochs_adv> <init_bs> <bs> [out.json]
  python run_rsss.py rebuild   <dir> <epochs_G> <epochs_adv> <init_bs> <bs> [out.json]
      [--mode parity|production] [--platform cpu]

Keeps the reference's production patch size (200,200)/pad (10,10) — the
MS-SSIM 161-px floor rules out smaller tiles — so scenes default to
256x256x4 (2x2 tiles per scene, Sentinel-2-like 4 bands). Both sides share
the per-scene statsMS txt caches (identical normalization by construction).
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import modes  # noqa: E402


def make_data(d, xsize=256, ysize=256, seed=0):
    from fcdgan_tpu.data.synthetic import make_oscd_dataset

    os.makedirs(d, exist_ok=True)
    return make_oscd_dataset(d, train_scenes=("alpha",), test_scenes=("gamma",),
                             xsize=xsize, ysize=ysize, nband=4,
                             region_expand=10, seed=seed)


def run_reference(d, eg, eadv, ibs, bs, seed=0):
    gdir = os.path.join(d, "GModel_ref" if seed == 0 else f"GModel_ref_s{seed}")
    os.makedirs(gdir, exist_ok=True)
    subs = [
        # anchor to the comment; modelG_reuse re-assigns `= 0` (Demo_RSSS.py:170)
        (r"init_num_epochs_G = \d+  #", f"init_num_epochs_G = {eg}  #"),
        (r"num_epochs = \d+", f"num_epochs = {eadv}"),
        (r"init_batch_size = \d+", f"init_batch_size = {ibs}"),
        (r"(?<!init_)batch_size = \d+", f"batch_size = {bs}"),
        (r"imgDir = r'[^']*'", "imgDir = r'%s'" % d),
        (r"OutGModelDir = r'[^']*'", "OutGModelDir = r'%s'" % gdir),
    ]
    res = modes.exec_reference("Demo_RSSS.py", subs, seed=seed)
    res.update(data=d, epochs=[eg, eadv], framework="reference")
    return res


def run_rebuild(d, eg, eadv, ibs, bs, mode="parity", platform=None, seed=0):
    from fcdgan_tpu.config import RSSSConfig
    from fcdgan_tpu.demos import demo_rsss

    parity = mode == "parity" or platform == "cpu"
    tag = mode if seed == 0 else f"{mode}_s{seed}"
    cfg = RSSSConfig(
        img_dir=d, out_g_model_dir=os.path.join(d, f"GModel_rebuild_{tag}"),
        ext=f"_{tag}",
        init_num_epochs_g=eg, num_epochs=eadv,
        init_batch_size=ibs, batch_size=bs,
        platform=platform, seed=seed, log_tensorboard=False, progress=False,
        compute_dtype="float32" if parity else "bfloat16",
        siamese_stats="split" if parity else "joint",
    )
    res = modes.run_rebuild_driver(demo_rsss.run, cfg)
    res.update(data=d, epochs=[eg, eadv], framework=f"rebuild-{mode}")
    return res


if __name__ == "__main__":
    cmd, d = sys.argv[1], sys.argv[2]
    if cmd == "data":
        extra = [int(a) for a in sys.argv[3:6]]
        make_data(d, *extra)
        print("data ok")
        sys.exit(0)
    eg, eadv, ibs, bs = (int(a) for a in sys.argv[3:7])
    out_json = sys.argv[7] if len(sys.argv) > 7 and not sys.argv[7].startswith("--") else None
    seed = int(sys.argv[sys.argv.index("--seed") + 1]) if "--seed" in sys.argv else 0
    if cmd == "reference":
        res = run_reference(d, eg, eadv, ibs, bs, seed=seed)
    else:
        mode = sys.argv[sys.argv.index("--mode") + 1] if "--mode" in sys.argv else "parity"
        platform = sys.argv[sys.argv.index("--platform") + 1] if "--platform" in sys.argv else None
        res = run_rebuild(d, eg, eadv, ibs, bs, mode=mode, platform=platform, seed=seed)
    print(json.dumps(res["final"]))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f, indent=1)
