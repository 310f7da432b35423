"""WSSS head-to-head: reference Demo_WSSS.py vs fcdgan_tpu demo_wsss.

Usage:
  python run_wsss.py data <dir> [n_changed n_unchanged size seed]
  python run_wsss.py reference <dir> <epochs_G> <epochs_adv> <bs> <unc_bs> [out.json]
  python run_wsss.py rebuild   <dir> <epochs_G> <epochs_adv> <bs> <unc_bs> [out.json]
      [--mode parity|production] [--platform cpu]

Slices must be >160 px (the reference's 5-scale MS-SSIM floor,
/root/reference/ssim.py:194-197), so `data` defaults to 200x200 — the real
WHU slice size (BuildingProcess.py:38).
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


def make_data(d, n_changed=6, n_unchanged=6, size=200, seed=0):
    from fcdgan_tpu.data.synthetic import make_whu_dataset

    os.makedirs(d, exist_ok=True)
    return make_whu_dataset(d, n_changed=n_changed, n_unchanged=n_unchanged,
                            size=size, seed=seed)


def run_reference(d, eg, eadv, bs, ubs, seed=0):
    gdir = os.path.join(d, "GModel_ref" if seed == 0 else f"GModel_ref_s{seed}")
    os.makedirs(gdir, exist_ok=True)
    subs = [
        # anchor to the commented constants line; modelG_reuse re-assigns
        # `init_num_epochs_G = 0` twice further down (Demo_WSSS.py:134,138)
        (r"init_num_epochs_G = \d+  #", f"init_num_epochs_G = {eg}  #"),
        (r"num_epochs = \d+", f"num_epochs = {eadv}"),
        (r"unc_batch_size = \d+", f"unc_batch_size = {ubs}"),
        (r"(?<!unc_)batch_size = \d+", f"batch_size = {bs}"),
        (r"ImgDirX = r'[^']*'", "ImgDirX = r'%s'" % os.path.join(d, "before")),
        (r"ImgDirY = r'[^']*'", "ImgDirY = r'%s'" % os.path.join(d, "after")),
        (r"RefDir = r'[^']*'", "RefDir = r'%s'" % os.path.join(d, "Label")),
        (r"LabelDir = r'[^']*'", "LabelDir = r'%s'" % d),
        (r"OutGModelDir = r'[^']*'", "OutGModelDir = r'%s'" % gdir),
        # OutDir is an independent absolute path (Demo_WSSS.py:66); the
        # trailing .format(extName) is a no-op on a brace-free replacement
        (r"OutDir = r'[^']*'", "OutDir = r'%s'" % os.path.join(d, "Detection_ref")),
    ]
    res = modes.exec_reference("Demo_WSSS.py", subs, seed=seed)
    res.update(data=d, epochs=[eg, eadv], framework="reference")
    return res


def run_rebuild(d, eg, eadv, bs, ubs, mode="parity", platform=None, seed=0):
    from fcdgan_tpu.config import WSSSConfig
    from fcdgan_tpu.demos import demo_wsss

    parity = mode == "parity" or platform == "cpu"
    tag = mode if seed == 0 else f"{mode}_s{seed}"
    cfg = WSSSConfig(
        img_dir_x=os.path.join(d, "before"), img_dir_y=os.path.join(d, "after"),
        ref_dir=os.path.join(d, "Label"), label_dir=d,
        out_g_model_dir=os.path.join(d, f"GModel_rebuild_{tag}"),
        out_dir=os.path.join(d, f"rebuild_out_{tag}"), ext=f"_{tag}",
        init_num_epochs_g=eg, num_epochs=eadv,
        batch_size=bs, unc_batch_size=ubs,
        platform=platform, seed=seed, log_tensorboard=False, progress=False,
        compute_dtype="float32" if parity else "bfloat16",
        siamese_stats="split" if parity else "joint",
    )
    res = modes.run_rebuild_driver(demo_wsss.run, cfg)
    res.update(data=d, epochs=[eg, eadv], framework=f"rebuild-{mode}")
    return res


if __name__ == "__main__":
    cmd, d = sys.argv[1], sys.argv[2]
    if cmd == "data":
        extra = [int(a) for a in sys.argv[3:7]]
        make_data(d, *extra)
        print("data ok")
        sys.exit(0)
    eg, eadv, bs, ubs = (int(a) for a in sys.argv[3:7])
    out_json = sys.argv[7] if len(sys.argv) > 7 and not sys.argv[7].startswith("--") else None
    seed = int(sys.argv[sys.argv.index("--seed") + 1]) if "--seed" in sys.argv else 0
    if cmd == "reference":
        res = run_reference(d, eg, eadv, bs, ubs, seed=seed)
    else:
        mode = sys.argv[sys.argv.index("--mode") + 1] if "--mode" in sys.argv else "parity"
        platform = sys.argv[sys.argv.index("--platform") + 1] if "--platform" in sys.argv else None
        res = run_rebuild(d, eg, eadv, bs, ubs, mode=mode, platform=platform, seed=seed)
    print(json.dumps(res["final"]))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f, indent=1)
