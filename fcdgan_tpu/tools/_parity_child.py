"""Child process for parity_e2e: run our USSS driver on one scene, print JSON.

argv: scene_dir epochs_g epochs_s epochs_joint seed [platform]
"""

import json
import sys


def main():
    scene_dir, eg, es, ej, seed = sys.argv[1:6]
    platform = sys.argv[6] if len(sys.argv) > 6 and sys.argv[6] else None

    from ..config import USSSConfig
    from ..demos import demo_usss

    cfg = USSSConfig(dir=scene_dir, init_num_epochs_g=int(eg),
                     init_num_epochs_s=int(es), num_epochs=int(ej),
                     batch_size=10, patch_size=(220, 220),
                     overlap_padding=(10, 10), seed=int(seed),
                     platform=platform, log_tensorboard=False, progress=False,
                     ext="_tpu")
    res = demo_usss.run(cfg)
    acc = res["evaluator"]
    miou, ciou = acc.Mean_Intersection_over_Union()
    print(json.dumps({
        "framework": "fcdgan-tpu",
        "scene": scene_dir,
        "f1": acc.Pixel_F1_score(),
        "kappa": acc.Pixel_Kappa(),
        "oa": acc.Pixel_Accuracy(),
        "precision": acc.Pixel_Precision_Rate(),
        "recall": acc.Pixel_Recall_Rate(),
        "miou": miou,
        "ciou": ciou,
        "joint_step_seconds": res.get("joint_step_seconds"),
        "density_path": res["density_path"],
    }))


if __name__ == "__main__":
    main()
