"""DeviceSceneCache parity: on-device gathered tiles == host/native tiles.

The cache's padded-scene slice must reproduce the reference's clamped
read-window + canvas-offset semantics (/root/reference/data_utils.py:154-176)
for every tile, including all border cases, and its normalize math must match
the host Normalize within 1 ulp (same contract as DeviceNormalizer)."""

import os

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
                         progress=False, scene_cache=mode, ext="_t",
                         tail="pad")  # pin: feeds must run identical batches
        res = demo_usss.run(cfg)
        outs[mode] = TiffReader(res["density_path"]).read_block()
        cms[mode] = res["evaluator"].confusion_matrix.copy()
    np.testing.assert_allclose(outs["on"], outs["off"], atol=1e-4)
    assert np.array_equal(cms["on"], cms["off"])


def test_window_cache_matches_full_cache(tmp_path):
    """Rolling-window slab feed: every epoch covers each tile exactly once,
    and completed batches are BIT-IDENTICAL to the whole-scene resident
    cache (same _SCENE_PREP jit, slab-local row offset)."""
    from fcdgan_tpu.data.device_cache import DeviceSceneWindowCache
    from fcdgan_tpu.data.pipeline import Batch

    ds, scaler = _build(tmp_path, np.uint16, xsize=100, ysize=90,
                        patch=(48, 40), pad=(6, 4))
    full = DeviceSceneCache(ds, scaler)
    os.environ["FCDGAN_SCENE_WINDOW_MB"] = "0.30"  # ~2 tile rows / slab
    try:
        assert DeviceSceneWindowCache.supports(ds)
        win = DeviceSceneWindowCache(ds, scaler)
        assert win.n_slabs > 1
        assert sum(win.slab_sizes) == len(ds)
        loader = win.loader(4, ds, shuffle=True, seed=3)
        for _ in range(2):  # 2 epochs: exercises resident-slab rotation
            seen = []
            for b in iter(loader):
                db = win.complete(b)
                real = np.asarray(b["weight"]) > 0
                seen.extend(np.asarray(b["item"])[real].tolist())
                fb = full.complete(Batch(item=b["item"], weight=b["weight"]))
                for k in ("x", "y", "ref", "item", "weight"):
                    assert np.array_equal(np.asarray(db[k]),
                                          np.asarray(fb[k])), k
            assert sorted(seen) == list(range(len(ds)))
    finally:
        del os.environ["FCDGAN_SCENE_WINDOW_MB"]


def test_window_cache_budget_gate(tmp_path):
    from fcdgan_tpu.data.device_cache import DeviceSceneWindowCache

    ds, scaler = _build(tmp_path, np.uint16)
    os.environ["FCDGAN_SCENE_WINDOW_MB"] = "0.0001"
    try:
        assert not DeviceSceneWindowCache.supports(ds)
    finally:
        del os.environ["FCDGAN_SCENE_WINDOW_MB"]
    assert DeviceSceneWindowCache.supports(ds)  # default budget
    ds.transforms = lambda x: x
    assert not DeviceSceneWindowCache.supports(ds)


def test_window_stitched_density_matches_full(tmp_path):
    """Per-slab fused stitcher == whole-scene fused stitcher, bit-exact
    (disjoint interior writes; wrap-padded chunks are idempotent)."""
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.data.device_cache import DeviceSceneWindowCache
    from fcdgan_tpu.models import Segmentor
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state

    ds, scaler = _build(tmp_path, np.uint16, xsize=100, ysize=90,
                        patch=(48, 40), pad=(6, 4))
    model = Segmentor(3, bilinear=True)
    zx = jnp.zeros((1, 40, 48, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    full = DeviceSceneCache(ds, scaler)
    want = full.stitched_density(infer, sstate, batch_size=3)
    # round 5: the default serving path is the device-resident output canvas
    # (one download); forcing FCDGAN_SERVE_CANVAS_MAX_MB=0 exercises the
    # per-slab-download fallback. Both must be BIT-exact vs the fused cache.
    os.environ["FCDGAN_SCENE_WINDOW_MB"] = "0.30"
    try:
        # (canvas_gate, serve_mode): default canvas+overlap, canvas+phased
        # (the relay upload strategy), and the per-slab-download fallback
        for canvas_gate, serve_mode in ((None, "overlap"), (None, "phased"),
                                        ("0.000001", None)):
            if canvas_gate is None:
                os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)
            else:
                os.environ["FCDGAN_SERVE_CANVAS_MAX_MB"] = canvas_gate
            if serve_mode is None:
                os.environ.pop("FCDGAN_SERVE_MODE", None)
            else:
                os.environ["FCDGAN_SERVE_MODE"] = serve_mode
            win = DeviceSceneWindowCache(ds, scaler)
            assert win.n_slabs > 1
            got = win.stitched_density(infer, sstate, batch_size=3)
            assert got.shape == want.shape == (90, 100)
            assert np.array_equal(got, want), (canvas_gate, serve_mode)
    finally:
        del os.environ["FCDGAN_SCENE_WINDOW_MB"]
        os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)
        os.environ.pop("FCDGAN_SERVE_MODE", None)
    # uint8 path quantizes identically too (canvas path quantizes per slab
    # write; values are per-pixel identical so the bytes must match)
    want8 = full.stitched_density(infer, sstate, batch_size=3,
                                  density_dtype="uint8")
    os.environ["FCDGAN_SCENE_WINDOW_MB"] = "0.30"
    try:
        for canvas_gate in (None, "0.000001"):
            if canvas_gate is None:
                os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)
            else:
                os.environ["FCDGAN_SERVE_CANVAS_MAX_MB"] = canvas_gate
            win2 = DeviceSceneWindowCache(ds, scaler)
            got8 = win2.stitched_density(infer, sstate, batch_size=3,
                                         density_dtype="uint8")
            assert np.array_equal(got8, want8), f"canvas_gate={canvas_gate}"
    finally:
        del os.environ["FCDGAN_SCENE_WINDOW_MB"]
        os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)


@pytest.mark.slow
def test_driver_window_cache_e2e(tmp_path):
    """demo_usss --scene-cache window end to end on a multi-slab scene:
    artifacts written, density in range, confusion totals the scene."""
    from fcdgan_tpu.config import USSSConfig
    from fcdgan_tpu.data.tiff import TiffReader
    from fcdgan_tpu.demos import demo_usss

    d = str(tmp_path / "scene")
    make_usss_scene(d, 96, 80, 3, dtype=np.uint16, seed=7)
    os.environ["FCDGAN_SCENE_WINDOW_MB"] = "0.30"
    try:
        cfg = USSSConfig(dir=d, outdir=str(tmp_path / "out_w"),
                         init_num_epochs_g=1, init_num_epochs_s=1, num_epochs=1,
                         batch_size=4, patch_size=(48, 48), overlap_padding=(4, 4),
                         msssim_weights=(0.5, 0.5), log_tensorboard=False,
                         progress=False, scene_cache="window", ext="_w")
        res = demo_usss.run(cfg)
    finally:
        del os.environ["FCDGAN_SCENE_WINDOW_MB"]
    dens = TiffReader(res["density_path"]).read_block()[..., 0]
    assert dens.shape == (80, 96)
    assert float(dens.min()) >= 0.0 and float(dens.max()) <= 1.0
    assert res["evaluator"].confusion_matrix.sum() == 80 * 96


def _whu(tmp_path, n_changed=3, n_unchanged=4):
    from fcdgan_tpu.data.datasets import WHUPairDataset
    from fcdgan_tpu.data.synthetic import make_whu_dataset

    d = str(tmp_path / "whu")
    make_whu_dataset(d, n_changed=n_changed, n_unchanged=n_unchanged, size=48)
    import random as _random

    from fcdgan_tpu.data.stats import dataset_meanstd
    from fcdgan_tpu.data.datasets import WHUDataset

    dirs = dict(img_dir_x=os.path.join(d, "before"),
                img_dir_y=os.path.join(d, "after"),
                ref_dir=os.path.join(d, "Label"), label_dir=d)
    stats_ds = WHUDataset(dirs["img_dir_x"], dirs["img_dir_y"],
                          dirs["ref_dir"], dirs["label_dir"], "-1")
    sp1 = str(tmp_path / "w1.txt")
    sp2 = str(tmp_path / "w2.txt")
    scaler = Normalize(*dataset_meanstd(sp1, sp2, stats_ds))
    pair = WHUPairDataset(dirs["img_dir_x"], dirs["img_dir_y"], dirs["ref_dir"],
                          dirs["label_dir"], scale=scaler, random_assign=False,
                          rng=_random.Random(0))
    return pair, scaler


def test_whu_cache_matches_pair_loader(tmp_path):
    import os as _os
    import random as _random

    from fcdgan_tpu.data.device_cache import DeviceWHUCache
    from fcdgan_tpu.data.pipeline import PairBatchLoader

    pair, scaler = _whu(tmp_path)
    assert DeviceWHUCache.supports(pair)
    cache = DeviceWHUCache(pair, scaler)
    fields = ("x", "y", "ref", "item", "label")
    host = PairBatchLoader(pair, 2, c_fields=fields, nc_fields=fields,
                           shuffle=True, seed=9,
                           epoch_hook=lambda e: pair.order_reset())
    # fresh pair dataset with the SAME rng stream for the cache loader
    pair2, _ = _whu(tmp_path)
    cache_loader = cache.pair_loader(2, pair2, shuffle=True, seed=9,
                                     epoch_hook=lambda e: pair2.order_reset())
    for _ in range(2):  # two epochs: order_reset re-pairs between them
        for hb, ib in zip(iter(host), iter(cache_loader)):
            assert np.array_equal(hb["c_item"], ib["c_item"])
            assert np.array_equal(hb["nc_item"], ib["nc_item"])
            db = cache.complete_pair(ib)
            for k in ("c_x", "c_y", "nc_x", "nc_y"):
                got, want = np.asarray(db[k]), np.asarray(hb[k])
                tol = np.spacing(np.abs(want).astype(np.float32))
                assert np.all(np.abs(got - want) <= tol), k
            assert np.array_equal(np.asarray(db["c_ref"]), hb["c_ref"])
            assert np.array_equal(np.asarray(db["weight"]), hb["weight"])


def test_whu_cache_unc_matches(tmp_path):
    from fcdgan_tpu.data.datasets import WHUDataset
    from fcdgan_tpu.data.device_cache import DeviceWHUCache
    from fcdgan_tpu.data.pipeline import BatchLoader

    pair, scaler = _whu(tmp_path)
    cache = DeviceWHUCache(pair, scaler)
    unc = WHUDataset(pair.nc_ds.img_path_x[0].rsplit("/", 1)[0],
                     pair.nc_ds.img_path_y[0].rsplit("/", 1)[0],
                     pair.nc_ds.ref_path[0].rsplit("/", 1)[0],
                     os.path.dirname(pair.nc_ds.ref_path[0].rsplit("/", 1)[0]) or ".",
                     scale=scaler, label_selected="0")
    host = BatchLoader(unc, 3, fields=("x", "y", "ref", "item", "label"),
                       shuffle=True, seed=4)
    idx = cache.unc_loader(3, unc, shuffle=True, seed=4)
    for hb, ib in zip(iter(host), iter(idx)):
        assert np.array_equal(hb["item"], ib["item"])
        db = cache.complete_unc(ib)
        for k in ("x", "y"):
            got, want = np.asarray(db[k]), np.asarray(hb[k])
            tol = np.spacing(np.abs(want).astype(np.float32))
            assert np.all(np.abs(got - want) <= tol), k
        assert np.array_equal(np.asarray(db["weight"]), hb["weight"])


def test_oscd_cache_matches_host_loader(tmp_path):
    from fcdgan_tpu.data.datasets import OSCDDataset
    from fcdgan_tpu.data.device_cache import DeviceOSCDCache
    from fcdgan_tpu.data.synthetic import make_oscd_dataset
    from fcdgan_tpu.demos.demo_rsss import _scene_scalers

    d = str(tmp_path / "oscd")
    make_oscd_dataset(d, train_scenes=("sa", "sb"), test_scenes=("sc",),
                      xsize=72, ysize=72)
    scalers = _scene_scalers(d, "train.txt", (40, 40), "statsMS")
    ds = OSCDDataset(d, "train.txt", scaler=scalers,
                     patch_size=(40, 40), overlap_padding=(4, 4))
    assert DeviceOSCDCache.supports(ds)
    cache = DeviceOSCDCache(ds)
    host = BatchLoader(ds, 3, fields=("x", "y", "item", "ref", "region"),
                       shuffle=True, seed=2)
    idx = cache.loader(3, ds, shuffle=True, seed=2)
    n = 0
    for hb, ib in zip(iter(host), iter(idx)):
        assert np.array_equal(hb["item"], ib["item"])
        db = cache.complete(ib)
        for k in ("x", "y"):
            got, want = np.asarray(db[k]), np.asarray(hb[k])
            tol = np.spacing(np.abs(want).astype(np.float32))
            assert np.all(np.abs(got - want) <= tol), k
        assert np.array_equal(np.asarray(db["ref"]), hb["ref"])
        assert np.array_equal(np.asarray(db["region"]), hb["region"])
        assert np.array_equal(np.asarray(db["weight"]), hb["weight"])
        n += 1
    assert n > 1


@pytest.mark.slow
def test_rsss_driver_tile_cache_matches_streaming(tmp_path):
    """demo_rsss with tile_cache on vs off: same RNG stream, near-identical
    confusion matrices. Unlike USSS (where both feeds share the device
    normalize bit-for-bit), the OFF path normalizes in the native C++
    loader — 1 ulp from the device affine — so trained trajectories can
    diverge by a few boundary pixels (measured 1-2 px / 5184); assert the
    matrices agree within 0.5% of the pixel count."""
    from fcdgan_tpu.config import RSSSConfig
    from fcdgan_tpu.data.synthetic import make_oscd_dataset
    from fcdgan_tpu.demos import demo_rsss

    d = str(tmp_path / "oscd")
    make_oscd_dataset(d, train_scenes=("sa",), test_scenes=("sb",),
                      xsize=72, ysize=72)
    cms = {}
    for mode in ("on", "off"):
        cfg = RSSSConfig(img_dir=d, out_g_model_dir=str(tmp_path / ("g_" + mode)),
                         init_num_epochs_g=1, num_epochs=1, init_batch_size=4,
                         batch_size=4, patch_size=(40, 40), overlap_padding=(4, 4),
                         msssim_weights=(0.5, 0.5), log_tensorboard=False,
                         progress=False, tile_cache=mode, ext="_" + mode,
                         tail="pad")  # pin: feeds must run identical batches
        res = demo_rsss.run(cfg)
        cms[mode] = (res["evaluator"].confusion_matrix.copy(),
                     res["test_evaluator"].confusion_matrix.copy())
    for k in (0, 1):
        a, b = cms["on"][k], cms["off"][k]
        assert np.abs(a - b).sum() <= 0.005 * a.sum(), (k, a.tolist(), b.tolist())


def test_fused_stitched_density_matches_pipelined(tmp_path):
    """DeviceSceneCache.stitched_density == the per-batch pipelined stitcher
    (identical forward; interior-only disjoint writes)."""
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.data.tiff import TiffReader
    from fcdgan_tpu.eval.inference import stitched_inference
    from fcdgan_tpu.models import Segmentor
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state

    ds, scaler = _build(tmp_path, np.uint16, xsize=100, ysize=90,
                        patch=(48, 40), pad=(6, 4))
    model = Segmentor(3, bilinear=True)
    zx = jnp.zeros((1, 40, 48, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    outs = {}
    for feed in ("auto", "cache"):
        out = str(tmp_path / f"dens_{feed}.tif")
        ds2 = ScenePairDataset(ds.img_path_x, ds.raster_y, ref_path=None,
                               out_path=out, enhance=scaler,
                               patch_size=(48, 40), overlap_padding=(6, 4))
        stats = stitched_inference(ds2, infer, sstate, batch_size=3,
                                   device_feed=feed)
        outs[feed] = TiffReader(out).read_block()[..., 0]
        assert stats["pixels"] == 100 * 90
    assert np.array_equal(outs["auto"], outs["cache"])


def test_whu_cache_changed_matches(tmp_path):
    from fcdgan_tpu.data.device_cache import DeviceWHUCache

    pair, scaler = _whu(tmp_path)
    cache = DeviceWHUCache(pair, scaler)
    host = BatchLoader(pair.c_ds, 2, fields=("x", "y", "ref", "item", "label"),
                       shuffle=False)
    idx = IndexBatchLoader(pair.c_ds, 2, shuffle=False)
    for hb, ib in zip(iter(host), iter(idx)):
        db = cache.complete_c(ib)
        for k in ("x", "y"):
            got, want = np.asarray(db[k]), np.asarray(hb[k])
            tol = np.spacing(np.abs(want).astype(np.float32))
            assert np.all(np.abs(got - want) <= tol), k
        assert np.array_equal(np.asarray(db["weight"]), hb["weight"])


def test_short_tail_loader_and_cache_feed(tmp_path):
    """tail='short' yields the true partial batch (reference torch
    drop_last=False semantics): same real samples/order as the padded
    loader, no weight-0 duplicates; the scene cache serves the short
    shape with identical values."""
    ds, scaler = _build(tmp_path, np.uint16)
    from fcdgan_tpu.data.device_cache import DeviceSceneCache, IndexBatchLoader

    bs = max(2, len(ds) // 2 + 1)  # force a partial tail
    pad = list(iter(IndexBatchLoader(ds, bs, shuffle=True, seed=3)))
    short = list(iter(IndexBatchLoader(ds, bs, shuffle=True, seed=3,
                                       tail="short")))
    assert len(pad) == len(short)
    for pb, sb in zip(pad, short):
        nreal = int(pb["weight"].sum())
        assert len(sb["item"]) == nreal
        assert np.array_equal(sb["item"], pb["item"][:nreal])
        assert np.all(sb["weight"] == 1.0)

    cache = DeviceSceneCache(ds, scaler)
    host = BatchLoader(ds, bs, fields=("x", "y", "item", "ref"),
                       shuffle=True, seed=3, tail="short")
    for hb, ib in zip(iter(host), iter(IndexBatchLoader(ds, bs, shuffle=True,
                                                        seed=3, tail="short"))):
        db = cache.complete(ib)
        for k in ("x", "y"):
            got, want = np.asarray(db[k]), np.asarray(hb[k])
            assert got.shape == want.shape
            tol = np.spacing(np.abs(want).astype(np.float32))
            assert np.all(np.abs(got - want) <= tol), k


def test_whu_pair_loader_short_tail(tmp_path):
    """WSSS pair feed with tail='short': the tail batch carries only the
    real samples (reference torch drop_last=False, Demo_WSSS.py:208-233),
    same order as the padded loader's real prefix; the WHU cache completes
    the short shape bit-identically to the host pair loader."""
    from fcdgan_tpu.data.device_cache import DeviceWHUCache
    from fcdgan_tpu.data.pipeline import PairBatchLoader

    # pair epoch length = max(c_len, nc_len) = 5 -> bs 2 leaves a 1-sample tail
    pair, scaler = _whu(tmp_path, n_changed=5, n_unchanged=4)
    cache = DeviceWHUCache(pair, scaler)
    fields = ("x", "y", "ref", "item", "label")
    host = PairBatchLoader(pair, 2, c_fields=fields, nc_fields=fields,
                           shuffle=True, seed=5, tail="short",
                           epoch_hook=lambda e: pair.order_reset())
    pair2, _ = _whu(tmp_path, n_changed=5, n_unchanged=4)
    idx = cache.pair_loader(2, pair2, shuffle=True, seed=5, tail="short",
                            epoch_hook=lambda e: pair2.order_reset())
    pair3, _ = _whu(tmp_path, n_changed=5, n_unchanged=4)
    padded = cache.pair_loader(2, pair3, shuffle=True, seed=5, tail="pad",
                               epoch_hook=lambda e: pair3.order_reset())
    n_short = 0
    for hb, ib, pb in zip(iter(host), iter(idx), iter(padded)):
        nreal = int(pb["weight"].sum())
        assert len(ib["c_item"]) == nreal
        n_short += int(nreal < len(pb["c_item"]))
        assert np.array_equal(ib["c_item"], pb["c_item"][:nreal])
        assert np.array_equal(hb["c_item"], ib["c_item"])
        db = cache.complete_pair(ib)
        for k in ("c_x", "c_y", "nc_x", "nc_y"):
            got, want = np.asarray(db[k]), np.asarray(hb[k])
            assert got.shape == want.shape
            tol = np.spacing(np.abs(want).astype(np.float32))
            assert np.all(np.abs(got - want) <= tol), k
        assert np.all(np.asarray(db["weight"]) == 1.0)
    assert n_short == 1  # the length-5/bs-2 epoch has exactly one short tail


def test_serve_chunks_widths(monkeypatch):
    """Serving chunker semantics (device_cache._serve_chunks): default keeps
    the caller's batch with per-slab ceil chunk counts and wrap-pad indices
    drawn from the slab's own items; FCDGAN_SERVE_BS>0 widens for MXU depth,
    and a slab smaller than the cap runs as ONE exact-size chunk."""
    from fcdgan_tpu.data.device_cache import DeviceSceneWindowCache

    chunks = DeviceSceneWindowCache._serve_chunks
    items = np.arange(100, 122)  # 22 tiles, like a 2-row 2048px slab

    monkeypatch.delenv("FCDGAN_SERVE_BS", raising=False)
    got = chunks(items, 10)
    assert got.shape == (3, 10)  # ceil(22/10), not a global max
    assert np.array_equal(got.ravel()[:22], items)
    assert set(got.ravel().tolist()) <= set(items.tolist())  # wrap, no pad

    monkeypatch.setenv("FCDGAN_SERVE_BS", "32")
    got = chunks(items, 10)
    assert got.shape == (1, 22)  # smaller than cap -> one exact-size chunk
    assert np.array_equal(got[0], items)

    big = np.arange(70)
    got = chunks(big, 10)
    assert got.shape == (3, 32)  # ceil(70/32) chunks at the cap width
    assert np.array_equal(got.ravel()[:70], big)
    assert set(got.ravel().tolist()) <= set(big.tolist())

    monkeypatch.setenv("FCDGAN_SERVE_BS", "0")
    assert chunks(big, 10).shape == (7, 10)  # 0 = disabled, batch-exact
