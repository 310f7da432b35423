"""Large-batch DP recipe A/B (VERDICT r2 task 5): bs10 vs bs40 accuracy.

BASELINE.md's single-chip sweep shows bs40 trains +27% faster per pixel than
the reference's bs10 (deeper MXU batching); on a v5e-8 the DP layout wants a
global batch >= 80. This runner shows the ACCURACY side of that recipe on a
single chip: the same 1024px synthetic scene trained at

    bs10, lr_scale 1   (the reference schedule, Demo_USSS.py:100)
    bs40, lr_scale 1   (naive: 4x fewer updates/epoch)
    bs40, lr_scale 4   (linear LR rule: --lr-scale 4)

with a reduced but representative schedule, comparing final stitched F1.

Usage: python experiments/batch_scale_ab.py [out.json] [--platform cpu]
                                            [--epochs eg es ej]
                                            [--configs bs:lrx,bs:lrx,...]

VERDICT r3 task 5 (full reference schedule, naive bs40 point skipped —
already shown to collapse at the short schedule):
    python experiments/batch_scale_ab.py \
        experiments/results/batch_scale_full.json \
        --epochs 50 50 100 --configs 10:1,40:4
"""

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def run_one(scene_dir, outdir, bs, lr_scale, epochs, platform, seed=0,
            lr_epoch_scale=1.0):
    from fcdgan_tpu.config import USSSConfig
    from fcdgan_tpu.demos import demo_usss

    eg, es, ej = epochs
    cfg = USSSConfig(
        dir=scene_dir, outdir=outdir,
        ext=f"_bs{bs}_lrx{lr_scale:g}_es{lr_epoch_scale:g}_s{seed}",
        init_num_epochs_g=eg, init_num_epochs_s=es, num_epochs=ej,
        batch_size=bs, lr_scale=lr_scale, platform=platform, seed=seed,
        lr_epoch_scale=lr_epoch_scale,
        compute_dtype="bfloat16", log_tensorboard=False, progress=False,
    )
    t0 = time.time()
    res = demo_usss.run(cfg)
    ev = res["evaluator"]
    miou, ciou = ev.Mean_Intersection_over_Union()
    return dict(bs=bs, lr_scale=lr_scale, lr_epoch_scale=lr_epoch_scale,
                seed=seed, wall_s=round(time.time() - t0, 1),
                f1=float(ev.Pixel_F1_score()), kappa=float(ev.Pixel_Kappa()),
                oa=float(ev.Pixel_Accuracy()), ciou=float(ciou),
                auc=float(res["auc"]))


def main():
    out_json = None
    args = sys.argv[1:]
    platform = None
    epochs = (15, 15, 40)
    if "--platform" in args:
        i = args.index("--platform")
        platform = args[i + 1]
        del args[i:i + 2]
    if "--epochs" in args:
        i = args.index("--epochs")
        epochs = tuple(int(v) for v in args[i + 1:i + 4])
        del args[i:i + 4]
    configs = ((10, 1.0, 1.0), (40, 1.0, 1.0), (40, 4.0, 1.0))
    if "--configs" in args:
        i = args.index("--configs")
        # bs:lr_scale[:lr_epoch_scale]
        configs = tuple(
            tuple(float(v) for v in (c.split(":") + ["1"])[:3])
            for c in args[i + 1].split(","))
        configs = tuple((int(b), x, e) for b, x, e in configs)
        del args[i:i + 2]
    seed = 0
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
    if args:
        out_json = args[0]

    from fcdgan_tpu.data.synthetic import make_usss_scene

    scene = "/tmp/batch_scale_scene"
    make_usss_scene(scene, 1024, 1024, 3, dtype="uint16", seed=17)

    results = []
    for bs, lrx, esc in configs:
        r = run_one(scene,
                    os.path.join(scene, f"out_bs{bs}_lrx{lrx:g}_es{esc:g}_s{seed}"),
                    bs, lrx, epochs, platform, seed=seed, lr_epoch_scale=esc)
        print(json.dumps(r))
        results.append(r)

    out = dict(scene_px=1024, epochs=list(epochs), runs=results)
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
