"""Run the PyTorch reference's USSS trajectory head-to-head against this repo.

This is NOT a port: it imports the reference's own modules from
/root/reference (Module.py, Loss.py, data_utils.py, CommonFunc.py,
metrics.py) through :mod:`fcdgan_tpu.tools.refshim`, and drives them through
the exact Demo_USSS trajectory (/root/reference/Demo_USSS.py:124-473) with
configurable epoch counts so the comparison fits a CPU budget:

  phase 1  G pretrain,  cmap=0, Loss = g + pw*perc + sw*ssim   (:124-189)
  phase 2  S training,  NetLoss = g + l1w*l1 + pw*perc + sw*ssim, per-epoch
           interior-window Evaluator                            (:192-286)
  phase 3  joint:       G grads accumulate dLossG/dG + dNetLoss/dG via the
           two-backwards-then-two-steps pattern                 (:289-341)
  final    eval-mode inference, stitched density + color rasters,
           interior Evaluator                                   (:404-473)

The torchvision shim hands the reference the SAME VGG16 feature weights this
framework's perception loss uses, so the two runs optimize the identical
objective. Outputs one JSON line with the final metrics + timings.

Usage:
  python -m fcdgan_tpu.tools.run_reference_usss --dir SCENE_DIR \
      --epochs-g 6 --epochs-s 6 --epochs-joint 12 --batch-size 10 --seed 0
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
import time


def run(scene_dir: str, epochs_g: int, epochs_s: int, epochs_joint: int,
        batch_size: int = 10, seed: int = 0, patch=(220, 220), pad=(10, 10),
        vgg_npz=None, ext: str = "_ref") -> dict:
    from . import refshim

    refshim.install(vgg_npz)

    import numpy as np
    import torch
    from torch.utils.data import DataLoader

    torch.manual_seed(seed)
    random.seed(seed)
    np.random.seed(seed)

    # reference modules (now importable thanks to the shim)
    from Module import Segmentor, Generator  # noqa: E402
    from Loss import CNetLoss  # noqa: E402
    from data_utils import GDALDataset  # noqa: E402
    from CommonFunc import NORMALIZE, Dataset_meanstd, adjust_learning_rate, write_changemap_gdal  # noqa: E402
    from metrics import Evaluator  # noqa: E402
    from osgeo import gdal  # noqa: E402  (the shim)

    # constants block parity: Demo_USSS.py:33-76
    learning_rate = 2e-4
    perception_weight, l1_weight, ssim_weight = 0.4, 0.65, 0.0
    perception_per_band, perception_layer = True, 1
    gt_map, pre_map = [1, 2], [0, 1]
    prob_thresh = 0.5

    img_x = os.path.join(scene_dir, "T1.tif")
    img_y = os.path.join(scene_dir, "T2.tif")
    ref_path = os.path.join(scene_dir, "ref.tif")
    out_path = os.path.join(scene_dir, f"ChangeDensity{ext}.tif")
    out_color = os.path.join(scene_dir, f"ChangeDensity{ext}_acc_color.tif")

    # stats pass + normalizer (Demo_USSS.py:88-95)
    stats_ds = GDALDataset(img_x, img_y, outPath=out_path, patch_size=patch,
                           overlap_padding=(0, 0))
    sp1 = os.path.join(scene_dir, f"T1_stats{ext}.txt")
    sp2 = os.path.join(scene_dir, f"T2_stats{ext}.txt")
    mean_x, std_x, mean_y, std_y = Dataset_meanstd(sp1, sp2, stats_ds)
    scaler = NORMALIZE(mean_x, std_x, mean_y, std_y)

    dataset = GDALDataset(img_x, img_y, refPath=ref_path, outPath=out_path,
                          enhance=scaler, patch_size=patch, overlap_padding=pad)
    total = len(dataset)
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True)
    _, yitems = dataset.patch_count()
    nband = dataset.size()[2]

    acc = Evaluator(num_class=len(gt_map))
    net_s = Segmentor(n_channels=nband, bilinear=True)
    net_g = Generator(n_channels=nband)
    net_s.train()
    net_g.train()
    criterion = CNetLoss(channel=nband, perception_layer=perception_layer,
                         perception_perBand=perception_per_band)
    opt_s = torch.optim.Adam(net_s.parameters(), lr=learning_rate, betas=(0.9, 0.99))
    opt_g = torch.optim.Adam(net_g.parameters(), lr=learning_rate, betas=(0.9, 0.99))

    def interior_eval(acc, cmask_t, ref_t, items_t):
        # per-sample interior-window accumulation (Demo_USSS.py:236-248)
        for ns in range(cmask_t.size(0)):
            item = int(items_t[ns])
            ix, iy = item // yitems, item % yitems
            sl, _, _ = dataset.slice_assign(ix, iy)
            cm = cmask_t[ns][0].detach().numpy()
            rm = ref_t[ns][0].numpy()
            acc.add_batch_map(
                rm[pad[1] : pad[1] + sl[3], pad[0] : pad[0] + sl[2]].astype(np.int16),
                cm[pad[1] : pad[1] + sl[3], pad[0] : pad[0] + sl[2]].astype(np.int16),
                gt_map, pre_map)

    trajectory = []  # (phase, epoch, f1, kappa)
    step_times = {"g": [], "s": [], "joint": []}

    # -- phase 1: generator pretrain (Demo_USSS.py:124-189) -----------------
    for i in range(epochs_g):
        adjust_learning_rate(opt_g, i, lr_start=1e-5, lr_max=3e-4,
                             lr_warm_up_epoch=10, lr_sustain_epochs=10)
        for batch in loader:
            t0 = time.perf_counter()
            x, y = batch[0], batch[1]
            opt_g.zero_grad()
            y_fake = net_g(x)
            cmap = torch.zeros((x.size(0), 1, x.size(2), x.size(3)))
            g_loss, l1, perc, ssim = criterion(y, y_fake, cmap)
            loss = g_loss + perception_weight * perc + ssim_weight * ssim
            loss.backward()
            opt_g.step()
            step_times["g"].append(time.perf_counter() - t0)

    # -- phase 2: segmentor training (Demo_USSS.py:192-286) -----------------
    for i in range(epochs_s):
        adjust_learning_rate(opt_s, i, lr_start=1e-5, lr_max=3e-4,
                             lr_warm_up_epoch=10, lr_sustain_epochs=10)
        acc.reset()
        for batch in loader:
            t0 = time.perf_counter()
            x, y, items, ref = batch[0], batch[1], batch[2], batch[3]
            y_fake = net_g(x)
            cmap = net_s(x, y)
            g_loss, l1, perc, ssim = criterion(y, y_fake, cmap)
            net_loss = (g_loss + l1_weight * l1 + perception_weight * perc
                        + ssim_weight * ssim)
            opt_s.zero_grad()
            net_loss.backward()
            opt_s.step()
            step_times["s"].append(time.perf_counter() - t0)
            cmask = (cmap > prob_thresh).float()
            interior_eval(acc, cmask, ref, items)
        trajectory.append(("S", i, acc.Pixel_F1_score(), acc.Pixel_Kappa()))

    # -- phase 3: joint alternating with G-gradient accumulation
    #    (Demo_USSS.py:289-341: G zero_grad at loop top, LossG backward with
    #    retain_graph, S zero_grad + NetLoss backward, then BOTH step — G's
    #    grads are the sum of both objectives' gradients) -------------------
    for i in range(epochs_joint):
        adjust_learning_rate(opt_s, i, lr_start=1e-5, lr_max=1e-4)
        adjust_learning_rate(opt_g, i, lr_start=1e-5, lr_max=1e-4)
        acc.reset()
        for batch in loader:
            t0 = time.perf_counter()
            x, y, items, ref = batch[0], batch[1], batch[2], batch[3]
            opt_g.zero_grad()
            y_fake = net_g(x)
            cmap = net_s(x, y)
            g_loss, l1, perc, ssim = criterion(y, y_fake, cmap)
            loss_g = g_loss + perception_weight * perc + ssim_weight * ssim
            loss_g.backward(retain_graph=True)
            net_loss = (g_loss + l1_weight * l1 + perception_weight * perc
                        + ssim_weight * ssim)
            opt_s.zero_grad()
            net_loss.backward()
            opt_g.step()
            opt_s.step()
            step_times["joint"].append(time.perf_counter() - t0)
            cmask = (cmap > prob_thresh).float()
            interior_eval(acc, cmask, ref, items)
        trajectory.append(("joint", i, acc.Pixel_F1_score(), acc.Pixel_Kappa()))

    # -- final inference + stitched writeback (Demo_USSS.py:404-473) --------
    net_s.eval()
    net_g.eval()
    test_loader = DataLoader(dataset, batch_size=batch_size, shuffle=False)
    out_ds = None
    acc.reset()
    densities = []
    with torch.no_grad():
        for batch in test_loader:
            x, y, items, ref = batch[0], batch[1], batch[2], batch[3]
            cmap = net_s(x, y)
            cmask = (cmap > prob_thresh).float()
            for ns in range(x.size(0)):
                dataset.GDALwriteDefault(cmap[ns].numpy(), int(items[ns]))
                if out_ds is None:
                    xs, ys, _ = dataset.size()
                    out_ds = dataset.imgDS_x.GetDriver().Create(
                        out_color, xs, ys, 1, gdal.GDT_Int32)
                    out_ds.SetGeoTransform(dataset.imgDS_x.GetGeoTransform())
                    out_ds.SetProjection(dataset.imgDS_x.GetProjection())
                cm = cmask[ns].numpy()
                rm = ref[ns].numpy()
                wc = write_changemap_gdal(cm, rm, write_color=True,
                                          ref_map=gt_map, dt_map=pre_map)
                dataset.GDALwrite(wc.astype(np.int32), int(items[ns]), out_ds)
            interior_eval(acc, cmask, ref, items)
            densities.append(cmap.numpy())

    refshim.flush_outputs()
    if dataset.outDS is not None and hasattr(dataset.outDS, "FlushCache"):
        dataset.outDS.FlushCache()
        if dataset.outDS._writer is not None:
            dataset.outDS._writer.close()

    miou, ciou = acc.Mean_Intersection_over_Union()
    return {
        "framework": "reference-pytorch",
        "scene": scene_dir,
        "epochs": [epochs_g, epochs_s, epochs_joint],
        "f1": acc.Pixel_F1_score(),
        "kappa": acc.Pixel_Kappa(),
        "oa": acc.Pixel_Accuracy(),
        "precision": acc.Pixel_Precision_Rate(),
        "recall": acc.Pixel_Recall_Rate(),
        "miou": miou,
        "ciou": ciou,
        "trajectory": trajectory,
        "step_seconds": {k: (sum(v) / len(v) if v else None)
                         for k, v in step_times.items()},
        "density_path": out_path,
        "color_path": out_color,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", required=True)
    ap.add_argument("--epochs-g", type=int, default=6)
    ap.add_argument("--epochs-s", type=int, default=6)
    ap.add_argument("--epochs-joint", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--ext", default="_ref")
    args = ap.parse_args(argv)
    if args.threads:
        import torch

        torch.set_num_threads(args.threads)
    res = run(args.dir, args.epochs_g, args.epochs_s, args.epochs_joint,
              batch_size=args.batch_size, seed=args.seed, ext=args.ext)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
