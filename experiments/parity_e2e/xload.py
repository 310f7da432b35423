"""Cross-load parity: serve the torch reference's trained SModel.pkl with
fcdgan_tpu's stitched inference and compare against the reference's own
final metrics.

The reference's final inference (Demo_USSS.py:404-473) produced
``reference_{s}.json['final']``; this runs tools/infer.py in scene mode on
the same scene with the reference's pickle loaded through
io/torch_interop — model-level parity evidence independent of training
dynamics. Writes results/xload_{s}.json with both metric sets and deltas.

Usage: python xload.py <scene_dir> <smodel.pkl> <reference_result.json>
       <out.json> [--platform cpu]
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

KEYS = ("oa", "kappa", "precision", "recall", "f1", "miou", "ciou")


def main(scene_dir, smodel, ref_json, out_json, platform=None):
    from fcdgan_tpu.tools.infer import InferConfig, run as run_infer

    cfg = InferConfig(
        dir=scene_dir, smodel=smodel, image_x_name="T1.tif",
        image_y_name="T2.tif", ref_name="ref.tif", ext="_xload",
        compute_dtype="float32", siamese_stats="split",
        platform=platform, progress=False)
    res = run_infer(cfg)
    import math

    ours = {k: (None if not math.isfinite(res[k]) else res[k]) for k in KEYS}
    with open(ref_json) as f:
        theirs = json.load(f)["final"]
    out = {
        "scene": scene_dir, "smodel": smodel,
        "reference_final": {k: theirs.get(k) for k in KEYS},
        "xload_final": ours,
        "delta": {k: round(ours[k] - theirs[k], 6) for k in KEYS
                  if theirs.get(k) is not None and ours[k] is not None},
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["delta"]))
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    plat = None
    if "--platform" in args:
        i = args.index("--platform")
        plat = args[i + 1]
        args = args[:i] + args[i + 2:]
    main(*args[:4], platform=plat)
