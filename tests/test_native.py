"""Native C++ tile reader vs the Python codecs — bit-for-bit agreement."""

import numpy as np
import pytest

from fcdgan_tpu.data.datasets import ScenePairDataset
from fcdgan_tpu.data.envi import write_envi
from fcdgan_tpu.data.normalize import Normalize
from fcdgan_tpu.data.synthetic import make_usss_scene
from fcdgan_tpu.data.tiff import TiffReader, TiffWriter

native = pytest.importorskip("fcdgan_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason=f"native toolchain unavailable: {native.build_error()}",
)


def test_native_tiff_window_reads(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(57, 43, 3)).astype(np.float32)
    p = str(tmp_path / "t.tif")
    with TiffWriter(p, 43, 57, 3, np.float32) as w:
        w.write_block(data)
    r = native.NativeRaster(p)
    assert (r.xsize, r.ysize, r.nband) == (43, 57, 3)
    np.testing.assert_array_equal(r.read_block(), data)
    np.testing.assert_array_equal(r.read_block(5, 7, 11, 13), data[7:20, 5:16])
    r.close()


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32, np.float64])
def test_native_tiff_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(1)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=(20, 20, 1)).astype(dtype)
    else:
        data = rng.integers(0, 100, (20, 20, 1)).astype(dtype)
    p = str(tmp_path / "d.tif")
    with TiffWriter(p, 20, 20, 1, dtype) as w:
        w.write_block(data)
    r = native.NativeRaster(p)
    np.testing.assert_allclose(r.read_block()[..., 0], data[..., 0].astype(np.float32))


def test_native_tiff_deflate_via_pil(tmp_path):
    """PIL writes deflate-compressed TIFFs; the native reader must decode."""
    from PIL import Image

    rng = np.random.default_rng(2)
    data = rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
    p = str(tmp_path / "z.tif")
    Image.fromarray(data).save(p, compression="tiff_adobe_deflate")
    r = native.NativeRaster(p)
    np.testing.assert_array_equal(r.read_block().astype(np.uint8), data)


def test_native_envi_interleaves(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(17, 23, 4)).astype(np.float32)
    for il in ("bsq", "bil", "bip"):
        p = str(tmp_path / f"e_{il}")
        write_envi(p, data, interleave=il)
        r = native.NativeRaster(p)
        np.testing.assert_allclose(r.read_block(), data, rtol=1e-6)
        np.testing.assert_allclose(r.read_block(3, 2, 9, 7), data[2:9, 3:12], rtol=1e-6)


def test_native_batch_assembly_matches_python_dataset(tmp_path):
    paths = make_usss_scene(str(tmp_path / "s"), 96, 80, 3)
    mean_x, std_x = [100.0, 101.0, 99.0], [30.0, 31.0, 29.0]
    mean_y, std_y = [105.0, 106.0, 104.0], [32.0, 33.0, 31.0]
    scaler = Normalize(mean_x, std_x, mean_y, std_y)
    ds = ScenePairDataset(paths["x"], paths["y"], enhance=scaler,
                          patch_size=(48, 48), overlap_padding=(4, 4))
    asm = native.NativePairAssembler(
        paths["x"], paths["y"], (48, 48), (4, 4),
        mean_x, std_x, mean_y, std_y)
    items = list(range(len(ds)))
    nx, ny = asm.assemble(items)
    for i in items:
        px, py, _, _ = ds[i]
        np.testing.assert_allclose(nx[i], px, atol=1e-5)
        np.testing.assert_allclose(ny[i], py, atol=1e-5)
    asm.close()


def test_native_assembly_without_normalization(tmp_path):
    paths = make_usss_scene(str(tmp_path / "s2"), 64, 64, 3)
    ds = ScenePairDataset(paths["x"], paths["y"], patch_size=(40, 40),
                          overlap_padding=(4, 4))
    asm = native.NativePairAssembler(paths["x"], paths["y"], (40, 40), (4, 4))
    nx, ny = asm.assemble(list(range(len(ds))))
    for i in range(len(ds)):
        px, py, _, _ = ds[i]
        np.testing.assert_allclose(nx[i], px, atol=1e-5)
        np.testing.assert_allclose(ny[i], py, atol=1e-5)


@pytest.mark.parametrize("compression", [1, 8, 5, 32773])
@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("big", [False, True])
def test_native_codec_matrix(tmp_path, compression, tiled, big):
    # C++ reader covers the same {codec} x {layout} x {format} matrix as the
    # Python substrate (VERDICT round-1 task 4)
    from test_tiff_codecs import _sample, write_fixture

    arr = _sample()
    p = str(tmp_path / f"n_{compression}_{tiled}_{big}.tif")
    write_fixture(p, arr, compression=compression, tiled=tiled, big=big)
    r = native.NativeRaster(p)
    assert (r.xsize, r.ysize, r.nband) == (29, 37, 3)
    np.testing.assert_array_equal(r.read_block(), arr.astype(np.float32))
    np.testing.assert_array_equal(r.read_block(10, 3, 15, 30),
                                  arr[3:33, 10:25].astype(np.float32))
    r.close()


@pytest.mark.parametrize("compression", [5, 8, 32773])
def test_native_predictor_16bit(tmp_path, compression):
    from test_tiff_codecs import _sample, write_fixture

    arr = (_sample(np.uint16, h=23, w=31, nb=1) * 101).astype(np.uint16)
    p = str(tmp_path / "np.tif")
    write_fixture(p, arr, compression=compression, predictor=2)
    r = native.NativeRaster(p)
    np.testing.assert_array_equal(r.read_block(), arr.astype(np.float32))
    r.close()


def _whu(tmp_path, with_scale=True):
    import random

    from fcdgan_tpu.data.datasets import WHUDataset, WHUPairDataset
    from fcdgan_tpu.data.synthetic import make_whu_dataset

    d = str(tmp_path / "whu")
    make_whu_dataset(d, n_changed=5, n_unchanged=7, size=48)
    import os

    dirs = dict(x=os.path.join(d, "before"), y=os.path.join(d, "after"),
                ref=os.path.join(d, "Label"), lbl=d)
    scale = Normalize([10.0, 20.0, 30.0], [2.0, 3.0, 4.0],
                      [11.0, 21.0, 31.0], [2.5, 3.5, 4.5]) if with_scale else None
    ds = WHUDataset(dirs["x"], dirs["y"], dirs["ref"], dirs["lbl"], "-1", scale=scale)
    pair = WHUPairDataset(dirs["x"], dirs["y"], dirs["ref"], dirs["lbl"],
                          scale=scale, random_assign=False, rng=random.Random(3))
    return ds, lambda: WHUPairDataset(dirs["x"], dirs["y"], dirs["ref"], dirs["lbl"],
                                      scale=scale, random_assign=False,
                                      rng=random.Random(3)), pair


def test_native_whu_loader_matches_python(tmp_path):
    from fcdgan_tpu.data.pipeline import BatchLoader, NativeWHUBatchLoader

    ds, _, _ = _whu(tmp_path)
    py = list(BatchLoader(ds, 4, fields=("x", "y", "ref", "item", "label"),
                          shuffle=True, seed=7))
    nat = list(NativeWHUBatchLoader(ds, 4, shuffle=True, seed=7))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        for k in ("x", "y", "ref", "item", "label", "weight"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-4, err_msg=k)


def test_native_whu_pair_loader_matches_python(tmp_path):
    from fcdgan_tpu.data.pipeline import NativeWHUPairBatchLoader, PairBatchLoader

    _, mk_pair, _ = _whu(tmp_path)
    fields = ("x", "y", "ref", "item", "label")
    py = list(PairBatchLoader(mk_pair(), 3, c_fields=fields, nc_fields=fields,
                              shuffle=True, seed=5))
    nat = list(NativeWHUPairBatchLoader(mk_pair(), 3, shuffle=True, seed=5))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        for k in a.keys():
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-4, err_msg=k)


def test_raw_assembly_and_device_normalize_parity(tmp_path):
    """device_normalize path == python path: raw uint16 canvases + on-device
    (v-mean)/std + pad masking reproduce the host-normalized f32 canvases
    (<=1 ulp from TPU/XLA f32 division), padding exactly zero."""
    import jax

    from fcdgan_tpu.data.datasets import ScenePairDataset
    from fcdgan_tpu.data.normalize import Normalize
    from fcdgan_tpu.data.pipeline import (
        BatchLoader, DeviceNormalizer, NativeSceneBatchLoader)
    from fcdgan_tpu.data.synthetic import make_usss_scene

    paths = make_usss_scene(str(tmp_path), 96, 80, 3, dtype=np.uint16)
    norm = Normalize([100.0, 101.0, 99.0], [30.0, 29.0, 31.0],
                     [105.0, 104.0, 106.0], [31.0, 30.0, 32.0])
    ds = ScenePairDataset(paths["x"], paths["y"], ref_path=paths["ref"],
                          enhance=norm, patch_size=(48, 48),
                          overlap_padding=(4, 4))
    assert NativeSceneBatchLoader.supports_device_normalize(ds)
    raw_loader = NativeSceneBatchLoader(ds, 4, shuffle=False,
                                        device_normalize=True)
    py_loader = BatchLoader(ds, 4, fields=("x", "y", "item", "ref"),
                            shuffle=False)
    placer = DeviceNormalizer(norm, 3)
    for raw_b, py_b in zip(iter(raw_loader), iter(py_loader)):
        assert raw_b["x"].dtype == np.uint16 and raw_b["win"].shape[1] == 4
        dev = {k: jax.device_put(v) for k, v in raw_b.items()}
        out = placer(dev)
        assert "win" not in out
        got_x = np.asarray(out["x"])
        got_y = np.asarray(out["y"])
        got_ref = np.asarray(out["ref"])
        np.testing.assert_allclose(got_x, py_b["x"], rtol=3e-7, atol=3e-7)
        np.testing.assert_allclose(got_y, py_b["y"], rtol=3e-7, atol=3e-7)
        np.testing.assert_array_equal(got_ref, py_b["ref"])
        # padding exactly zero where the python canvas is zero-padded
        assert np.all(got_x[py_b["x"] == 0] == 0)
        np.testing.assert_array_equal(raw_b["item"], py_b["item"])


def test_raw_assembly_refuses_float_rasters(tmp_path):
    from fcdgan_tpu.data.datasets import ScenePairDataset
    from fcdgan_tpu.data.normalize import Normalize
    from fcdgan_tpu.data.pipeline import NativeSceneBatchLoader
    from fcdgan_tpu.data.synthetic import make_usss_scene

    paths = make_usss_scene(str(tmp_path), 64, 64, 3)  # float32 rasters
    norm = Normalize([0.0] * 3, [1.0] * 3, [0.0] * 3, [1.0] * 3)
    ds = ScenePairDataset(paths["x"], paths["y"], enhance=norm,
                          patch_size=(48, 48), overlap_padding=(4, 4))
    assert not NativeSceneBatchLoader.supports_device_normalize(ds)
    with pytest.raises(ValueError, match="integral"):
        NativeSceneBatchLoader(ds, 4, device_normalize=True)
