"""End-to-end driver runs on miniature synthetic datasets.

Golden-behavior tests (SURVEY.md section 4): each demo-equivalent entry point
runs all phases and must publish every reference artifact — density raster with
correct geo metadata, color eval map, checkpoints, Para txt — with metrics
that beat chance on the planted-change synthetic scenes."""

import os
import random

import numpy as np
import pytest

from fcdgan_tpu.config import RSSSConfig, USSSConfig, WSSSConfig
from fcdgan_tpu.data.synthetic import make_oscd_dataset, make_usss_scene, make_whu_dataset
from fcdgan_tpu.data.tiff import TiffReader

MSW = (0.5, 0.5)


@pytest.mark.slow
def test_usss_end_to_end(tmp_path):
    from fcdgan_tpu.demos import demo_usss

    d = str(tmp_path / "usss")
    paths = make_usss_scene(d, 96, 80, 3)
    cfg = USSSConfig(dir=d, init_num_epochs_g=1, init_num_epochs_s=1, num_epochs=1,
                     batch_size=4, patch_size=(48, 48), overlap_padding=(4, 4),
                     msssim_weights=MSW, log_tensorboard=False, progress=False,
                     ext="_t")
    res = demo_usss.run(cfg)

    # artifacts
    assert os.path.exists(res["density_path"])
    assert os.path.exists(res["color_path"])
    assert os.path.exists(res["para_path"])
    assert os.path.exists(res["smodel_path"])
    assert os.path.exists(res["gmodel_path"])

    # density raster: full scene, float32, geo metadata copied from input
    r = TiffReader(res["density_path"])
    src = TiffReader(paths["x"])
    assert (r.xsize, r.ysize, r.nband) == (src.xsize, src.ysize, 1)
    assert r.dtype.type == np.float32
    np.testing.assert_allclose(r.geotransform, src.geotransform)
    dens = r.read_block()[..., 0]
    assert 0.0 <= dens.min() and dens.max() <= 1.0

    # color map: int32 codes in {0,1,2,3}
    c = TiffReader(res["color_path"])
    codes = np.unique(c.read_block())
    assert set(codes.tolist()).issubset({0, 1, 2, 3})

    # Para txt format
    txt = open(res["para_path"]).read()
    assert "perception_weight:0.4" in txt and "Segmentation," in txt
    assert txt.strip().endswith("tips:eval_patch")

    # detection beats chance on the planted squares
    assert res["evaluator"].Pixel_F1_score() > 0.1

    # stats cache resumability: files exist in the reference txt format
    stats = open(os.path.join(d, "T1_stats.txt")).read()
    assert stats.startswith("mean:")


@pytest.mark.slow
def test_wsss_end_to_end(tmp_path):
    from fcdgan_tpu.demos import demo_wsss

    d = str(tmp_path / "whu")
    paths = make_whu_dataset(d, n_changed=4, n_unchanged=6, size=48)
    cfg = WSSSConfig(img_dir_x=paths["before"], img_dir_y=paths["after"],
                     ref_dir=paths["Label"], label_dir=paths["root"],
                     out_g_model_dir=os.path.join(d, "GModel"),
                     init_num_epochs_g=1, num_epochs=1, batch_size=3,
                     unc_batch_size=4, msssim_weights=MSW,
                     log_tensorboard=False, progress=False)
    res = demo_wsss.run(cfg)

    # per-image PNG eval maps for every CHANGED sample + density maps
    pngs = [f for f in os.listdir(res["out_dir"]) if f.endswith(".tif")]
    assert len(pngs) == 4
    assert len(os.listdir(res["density_dir"])) == 4
    assert os.path.exists(res["para_path"])
    for p in ("smodel_path", "gmodel_path", "dmodel_path"):
        assert os.path.exists(res[p])
    assert np.isfinite(res["evaluator"].Pixel_F1_score())

    # modelG_reuse: a second run must skip G pretraining (GModel.ckpt cached)
    from fcdgan_tpu.io.checkpoint import model_g_reuse
    from fcdgan_tpu.models import Generator
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    import jax
    import jax.numpy as jnp

    g = Generator(3)
    tpl = create_net_state(g, jax.random.PRNGKey(0), (jnp.zeros((1, 48, 48, 3)),), adam())
    restored, epochs = model_g_reuse(cfg.out_g_model_dir, tpl, 50, enabled=True)
    assert epochs == 0
    # restored params differ from the fresh template (they were trained)
    diff = any(bool((np.asarray(a) != np.asarray(b)).any())
               for a, b in zip(jax.tree.leaves(tpl.params), jax.tree.leaves(restored.params)))
    assert diff


@pytest.mark.slow
def test_rsss_end_to_end(tmp_path):
    from fcdgan_tpu.demos import demo_rsss

    d = str(tmp_path / "oscd")
    make_oscd_dataset(d, train_scenes=("alpha", "beta"), test_scenes=("gamma",),
                      xsize=64, ysize=64)
    cfg = RSSSConfig(img_dir=d, out_g_model_dir=os.path.join(d, "GModel"),
                     init_num_epochs_g=1, num_epochs=1, init_batch_size=4,
                     batch_size=3, patch_size=(40, 40), overlap_padding=(4, 4),
                     msssim_weights=MSW, log_tensorboard=False, progress=False,
                     ext="_t")
    res = demo_rsss.run(cfg)

    # per-scene density + color rasters in each test scene's ImagePair dir
    ip = os.path.join(d, "gamma", "ImagePair")
    assert os.path.exists(os.path.join(ip, "density_t"))
    assert os.path.exists(os.path.join(ip, "color_t"))
    r = TiffReader(os.path.join(ip, "density_t"))
    assert (r.xsize, r.ysize) == (64, 64)
    assert os.path.exists(res["para_path"])
    txt = open(res["para_path"]).read()
    assert "r_weight:2.0" in txt
    for p in ("smodel_path", "gmodel_path", "dmodel_path"):
        assert os.path.exists(res[p])
    assert np.isfinite(res["evaluator"].Pixel_F1_score())
    # per-scene stats caches written next to each image (statsMS parity)
    assert os.path.exists(os.path.join(d, "alpha", "ImagePair", "alpha_20160120_statsMS.txt"))


@pytest.mark.slow
def test_rsss_end_to_end_with_eraser(tmp_path):
    # config-driven random-erase augmentation (VERDICT round-1 task 7):
    # --random-eraser routes an eraser into every train scene's sync'd
    # transform slot; the native loader refuses transforms so the Python
    # loader path must engage, and the run still publishes all artifacts.
    from fcdgan_tpu.demos import demo_rsss

    d = str(tmp_path / "oscd_aug")
    make_oscd_dataset(d, train_scenes=("alpha",), test_scenes=("gamma",),
                      xsize=48, ysize=48)
    cfg = RSSSConfig(img_dir=d, out_g_model_dir=os.path.join(d, "GModel"),
                     init_num_epochs_g=1, num_epochs=1, init_batch_size=2,
                     batch_size=2, patch_size=(40, 40), overlap_padding=(4, 4),
                     msssim_weights=MSW, log_tensorboard=False, progress=False,
                     random_eraser=True, eraser_regions=2, ext="_a")
    res = demo_rsss.run(cfg)
    assert os.path.exists(res["para_path"])
    assert np.isfinite(res["evaluator"].Pixel_F1_score())
    ip = os.path.join(d, "gamma", "ImagePair")
    assert os.path.exists(os.path.join(ip, "density_a"))
