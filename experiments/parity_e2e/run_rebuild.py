"""Run fcdgan_tpu's USSS driver on a shared parity scene, mirroring
run_reference.py's schedule, and dump the same JSON result shape.

Usage: python run_rebuild.py <scene_dir> <eg> <es> <ej> [out.json] [--platform cpu]
"""

import json
import os
import re
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)


def run(scene_dir: str, eg: int, es: int, ej: int, platform=None, seed: int = 0,
        mode: str = "production", batch_size: int = 10,
        lr_scale: float = 1.0) -> dict:
    """mode='production': bf16 mixed precision + joint-stats siamese BN (the
    TPU-default configuration). mode='parity': f32 + per-branch BN statistics
    — numerics closest to the torch reference. batch_size/lr_scale: the
    large-batch DP recipe A/B (VERDICT r2 task 5)."""
    import contextlib
    import io

    from fcdgan_tpu.config import USSSConfig
    from fcdgan_tpu.demos import demo_usss

    tag = mode if batch_size == 10 else f"{mode}_bs{batch_size}_lrx{lr_scale:g}"
    outdir = os.path.join(scene_dir, f"rebuild_out_{tag}")
    parity = mode == "parity" or platform == "cpu"
    cfg = USSSConfig(
        dir=scene_dir, outdir=outdir, ext="_parity",
        init_num_epochs_g=eg, init_num_epochs_s=es, num_epochs=ej,
        platform=platform, seed=seed, log_tensorboard=False,
        batch_size=batch_size, lr_scale=lr_scale,
        compute_dtype="float32" if parity else "bfloat16",
        siamese_stats="split" if parity else "joint",
    )
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    t0 = time.time()
    with contextlib.redirect_stdout(Tee()):
        res = demo_usss.run(cfg)
    wall = time.time() - t0

    out = buf.getvalue().replace("\r", "\n")
    epoch_re = re.compile(
        r"Epochs: (\d+)/(\d+), Overall Accuracy: ([\d.]+), Kappa: ([-\d.]+), "
        r"Precision Rate: ([\d.]+), Recall Rate: ([\d.]+), F1:([\d.]+), "
        r"mIOU:([\d.]+), cIoU:([\d.]+)"
    )
    traj = [
        dict(epoch=int(m[0]), of=int(m[1]), oa=float(m[2]), kappa=float(m[3]),
             precision=float(m[4]), recall=float(m[5]), f1=float(m[6]),
             miou=float(m[7]), ciou=float(m[8]))
        for m in epoch_re.findall(out)
    ]
    ev = res["evaluator"]
    miou, ciou = ev.Mean_Intersection_over_Union()
    final = dict(
        oa=float(ev.Pixel_Accuracy()), kappa=float(ev.Pixel_Kappa()),
        precision=float(ev.Pixel_Precision_Rate()),
        recall=float(ev.Pixel_Recall_Rate()), f1=float(ev.Pixel_F1_score()),
        miou=float(miou), ciou=float(ciou), auc=float(res["auc"]),
    )
    return dict(scene=scene_dir, epochs=[eg, es, ej], wall_s=wall,
                trajectory=traj, final=final,
                density_path=res["density_path"])


if __name__ == "__main__":
    scene = sys.argv[1]
    eg, es, ej = (int(a) for a in sys.argv[2:5])
    out_json = sys.argv[5] if len(sys.argv) > 5 else None
    platform = None
    if "--platform" in sys.argv:
        platform = sys.argv[sys.argv.index("--platform") + 1]
    mode = "production"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    bs, lrx = 10, 1.0
    if "--batch-size" in sys.argv:
        bs = int(sys.argv[sys.argv.index("--batch-size") + 1])
    if "--lr-scale" in sys.argv:
        lrx = float(sys.argv[sys.argv.index("--lr-scale") + 1])
    r = run(scene, eg, es, ej, platform, mode=mode, batch_size=bs, lr_scale=lrx)
    print(json.dumps(r["final"]))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(r, f, indent=1)
