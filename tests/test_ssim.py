"""SSIM/MS-SSIM vs an independent numpy golden implementation."""

import numpy as np
import pytest

from fcdgan_tpu.ops.ssim import (
    MS_SSIM,
    SSIM,
    gaussian_window,
    ms_ssim,
    ssim,
)


def np_gauss(win, sigma):
    c = np.arange(win, dtype=np.float64) - win // 2
    g = np.exp(-(c**2) / (2 * sigma**2))
    return g / g.sum()


def np_blur_valid(img, g):
    """Separable VALID blur of (H, W) image with 1-D window g, skipping
    axes shorter than the window."""
    out = img.astype(np.float64)
    k = len(g)
    if out.shape[0] >= k:
        out = np.apply_along_axis(lambda r: np.convolve(r, g, mode="valid"), 0, out)
    if out.shape[1] >= k:
        out = np.apply_along_axis(lambda r: np.convolve(r, g, mode="valid"), 1, out)
    return out


def np_ssim_cs(x, y, data_range, win_size=11, sigma=1.5, K=(0.01, 0.03)):
    """(ssim_mean, cs_mean) for a single-channel (H, W) pair."""
    g = np_gauss(win_size, sigma)[::-1]  # convolve flips; gaussian symmetric anyway
    c1 = (K[0] * data_range) ** 2
    c2 = (K[1] * data_range) ** 2
    mu1 = np_blur_valid(x, g)
    mu2 = np_blur_valid(y, g)
    s1 = np_blur_valid(x * x, g) - mu1**2
    s2 = np_blur_valid(y * y, g) - mu2**2
    s12 = np_blur_valid(x * y, g) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
    return sm.mean(), cs.mean()


def test_gaussian_window_normalised():
    g = gaussian_window(11, 1.5)
    assert g.shape == (11,)
    assert g.sum() == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(g, g[::-1], atol=1e-7)  # symmetric


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    assert float(ssim(x, x, data_range=1.0)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_numpy_golden():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 48, 40, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    got = float(ssim(x, y, data_range=1.0))
    want, _ = np_ssim_cs(x[0, :, :, 0].astype(np.float64), y[0, :, :, 0].astype(np.float64), 1.0)
    assert got == pytest.approx(want, abs=2e-5)


def test_ssim_multichannel_averages_channels():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 40, 40, 2)).astype(np.float32)
    y = rng.uniform(size=(1, 40, 40, 2)).astype(np.float32)
    per_c = []
    for c in range(2):
        s, _ = np_ssim_cs(x[0, :, :, c].astype(np.float64), y[0, :, :, c].astype(np.float64), 1.0)
        per_c.append(s)
    got = float(ssim(x, y, data_range=1.0))
    assert got == pytest.approx(np.mean(per_c), abs=2e-5)


def test_ms_ssim_identity_is_one():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 200, 200, 3)).astype(np.float32)
    assert float(ms_ssim(x, x, data_range=1.0)) == pytest.approx(1.0, abs=1e-4)


def test_ms_ssim_matches_numpy_golden():
    rng = np.random.default_rng(4)
    x = rng.uniform(size=(1, 180, 170, 1)).astype(np.float64)
    y = np.clip(x + rng.normal(scale=0.05, size=x.shape), 0, 1)

    # golden: 5 levels, relu'd cs, avg-pool-2 with count-include-pad
    weights = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    xs, ys = x[0, :, :, 0], y[0, :, :, 0]
    mcs = []
    sm = None
    for i in range(5):
        sm, cs = np_ssim_cs(xs, ys, 1.0)
        if i < 4:
            mcs.append(max(cs, 0.0))
            ph, pw = xs.shape[0] % 2, xs.shape[1] % 2
            xs = np.pad(xs, ((ph, ph), (pw, pw)))
            ys = np.pad(ys, ((ph, ph), (pw, pw)))
            # floor semantics: drop trailing row/col that doesn't fill a window
            he, we = xs.shape[0] // 2 * 2, xs.shape[1] // 2 * 2
            xs, ys = xs[:he, :we], ys[:he, :we]
            xs = xs.reshape(xs.shape[0] // 2, 2, xs.shape[1] // 2, 2).mean(axis=(1, 3))
            ys = ys.reshape(ys.shape[0] // 2, 2, ys.shape[1] // 2, 2).mean(axis=(1, 3))
    vals = np.array(mcs + [max(sm, 0.0)])
    want = float(np.prod(vals**weights))

    got = float(ms_ssim(x.astype(np.float32), y.astype(np.float32), data_range=1.0))
    assert got == pytest.approx(want, abs=5e-4)


def test_ms_ssim_min_size_guard():
    x = np.zeros((1, 128, 128, 1), np.float32)
    with pytest.raises(ValueError, match="larger than 160"):
        ms_ssim(x, x, data_range=1.0)
    # reduced level count admits small tiles
    assert float(ms_ssim(x, x, data_range=1.0, weights=[0.5, 0.5])) == pytest.approx(1.0, abs=1e-4)


def test_wrappers():
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(1, 200, 200, 4)).astype(np.float32)
    y = rng.uniform(size=(1, 200, 200, 4)).astype(np.float32)
    np.testing.assert_allclose(
        float(MS_SSIM(data_range=1.0)(x, y)), float(ms_ssim(x, y, data_range=1.0)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(SSIM(data_range=1.0)(x, y)), float(ssim(x, y, data_range=1.0)), rtol=1e-6
    )


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(6)
    x = rng.uniform(size=(1, 64, 64, 1)).astype(np.float32)
    small = np.clip(x + rng.normal(scale=0.02, size=x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(scale=0.3, size=x.shape), 0, 1).astype(np.float32)
    assert float(ssim(x, small, data_range=1.0)) > float(ssim(x, big, data_range=1.0))
