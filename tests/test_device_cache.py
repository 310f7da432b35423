"""DeviceSceneCache parity: on-device gathered tiles == host/native tiles.

The cache's padded-scene slice must reproduce the reference's clamped
read-window + canvas-offset semantics (/root/reference/data_utils.py:154-176)
for every tile, including all border cases, and its normalize math must match
the host Normalize within 1 ulp (same contract as DeviceNormalizer)."""

import numpy as np
import pytest

from fcdgan_tpu.data.datasets import ScenePairDataset
from fcdgan_tpu.data.device_cache import DeviceSceneCache, IndexBatchLoader
from fcdgan_tpu.data.normalize import Normalize
from fcdgan_tpu.data.pipeline import BatchLoader
from fcdgan_tpu.data.stats import dataset_meanstd
from fcdgan_tpu.data.synthetic import make_usss_scene


def _build(tmp_path, dtype, xsize=96, ysize=80, patch=(48, 40), pad=(6, 4)):
    paths = make_usss_scene(str(tmp_path / "scene"), xsize=xsize, ysize=ysize,
                            nband=3, dtype=dtype, seed=5)
    stats_ds = ScenePairDataset(paths["x"], paths["y"], patch_size=patch,
                                overlap_padding=(0, 0))
    sp1 = str(tmp_path / "s1.txt")
    sp2 = str(tmp_path / "s2.txt")
    scaler = Normalize(*dataset_meanstd(sp1, sp2, stats_ds))
    ds = ScenePairDataset(paths["x"], paths["y"], ref_path=paths["ref"],
                          enhance=scaler, patch_size=patch,
                          overlap_padding=pad)
    return ds, scaler


@pytest.mark.parametrize("dtype", [np.uint16, np.float32])
def test_cache_matches_host_loader(tmp_path, dtype):
    ds, scaler = _build(tmp_path, dtype)
    cache = DeviceSceneCache(ds, scaler)
    host = BatchLoader(ds, 4, fields=("x", "y", "item", "ref"),
                       shuffle=True, seed=3)
    idx_loader = IndexBatchLoader(ds, 4, shuffle=True, seed=3)
    for hb, ib in zip(iter(host), iter(idx_loader)):
        assert np.array_equal(hb["item"], ib["item"])  # same RNG stream
        assert np.array_equal(hb["weight"], ib["weight"])
        db = cache.complete(ib)
        # <=1-ulp agreement with the host normalize (TPU/np division)
        for k in ("x", "y"):
            got = np.asarray(db[k])
            want = np.asarray(hb[k])
            tol = np.maximum(np.spacing(np.abs(want).astype(np.float32)), 0)
            assert np.all(np.abs(got - want) <= tol), k
        assert np.array_equal(np.asarray(db["ref"]), hb["ref"])
        assert np.array_equal(np.asarray(db["item"]), hb["item"])
        assert np.array_equal(np.asarray(db["weight"]), hb["weight"])


def test_cache_matches_on_mesh(tmp_path):
    import jax

    from fcdgan_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    ds, scaler = _build(tmp_path, np.uint16)
    mesh = make_mesh(4)
    cache = DeviceSceneCache(ds, scaler, mesh)
    single = DeviceSceneCache(ds, scaler)
    loader = IndexBatchLoader(ds, 4, shuffle=False)
    for ib in iter(loader):
        a = cache.complete(ib)
        b = single.complete(ib)
        for k in ("x", "y", "ref", "weight"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


def test_supports_gates(tmp_path):
    ds, scaler = _build(tmp_path, np.uint16)
    assert DeviceSceneCache.supports(ds)
    import os

    os.environ["FCDGAN_SCENE_CACHE_MAX_MB"] = "0.0001"
    try:
        assert not DeviceSceneCache.fits(ds)
        assert not DeviceSceneCache.supports(ds)
    finally:
        del os.environ["FCDGAN_SCENE_CACHE_MAX_MB"]
    ds.transforms = lambda x: x
    assert not DeviceSceneCache.supports(ds)


@pytest.mark.slow
def test_driver_cache_matches_streaming(tmp_path):
    """demo_usss with scene_cache on vs off: same RNG stream and step
    sequence; training is fed identical tiles, so the density rasters agree
    to float noise (the OFF run's final inference normalizes tiles on the
    HOST, 1 ulp from the cache's device normalize — bit-exactness across
    that boundary is not expected) and the confusion matrices match."""
    from fcdgan_tpu.config import USSSConfig
    from fcdgan_tpu.data.tiff import TiffReader
    from fcdgan_tpu.demos import demo_usss

    d = str(tmp_path / "scene")
    make_usss_scene(d, 96, 80, 3, dtype=np.uint16, seed=7)
    outs, cms = {}, {}
    for mode in ("on", "off"):
        cfg = USSSConfig(dir=d, outdir=str(tmp_path / ("out_" + mode)),
                         init_num_epochs_g=1, init_num_epochs_s=1, num_epochs=1,
                         batch_size=4, patch_size=(48, 48), overlap_padding=(4, 4),
                         msssim_weights=(0.5, 0.5), log_tensorboard=False,
                         progress=False, scene_cache=mode, ext="_t")
        res = demo_usss.run(cfg)
        outs[mode] = TiffReader(res["density_path"]).read_block()
        cms[mode] = res["evaluator"].confusion_matrix.copy()
    np.testing.assert_allclose(outs["on"], outs["off"], atol=1e-4)
    assert np.array_equal(cms["on"], cms["off"])
