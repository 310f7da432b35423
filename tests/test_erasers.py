"""Random-eraser sync protocol (CommonFunc.py:78-141 parity)."""

import numpy as np

from fcdgan_tpu.data.erasers import RandomEraser, RandomEraserMultiRegion


def test_single_eraser_sync_protocol():
    rng = np.random.default_rng(0)
    er = RandomEraser(origin_prob=0.0, rng=rng)  # always erase
    x = np.ones((32, 32, 3), np.float32)
    y = np.ones((32, 32, 3), np.float32)
    x2, region = er(x)
    assert region != (0, 0, 0, 0)
    y2, region2 = er(y, region)  # re-apply the SAME region to image 2
    assert region2 == region
    np.testing.assert_array_equal(x2 == 0, y2 == 0)
    rx, ry, rw, rh = region
    assert (x2[ry : ry + rh, rx : rx + rw] == 0).all()
    # original arrays untouched (no in-place mutation)
    assert x.min() == 1.0


def test_single_eraser_origin_prob_keeps_image():
    er = RandomEraser(origin_prob=1.0, rng=np.random.default_rng(1))
    x = np.ones((16, 16, 1), np.float32)
    x2, region = er(x)
    assert region == (0, 0, 0, 0)
    np.testing.assert_array_equal(x2, x)


def test_eraser_respects_threshold():
    rng = np.random.default_rng(2)
    er = RandomEraser(erase_thresh=0.1, origin_prob=0.0, rng=rng)
    for _ in range(20):
        x = np.ones((40, 40, 1), np.float32)
        x2, _ = er(x)
        erased = float((x2 == 0).sum()) / x2.size
        # the reference clamps h after the fact, so slight overshoot from the
        # floor is possible but the fraction stays near the threshold
        assert erased <= 0.15


def test_multi_region_eraser_sync():
    rng = np.random.default_rng(3)
    er = RandomEraserMultiRegion(origin_prob=0.0, multi_region=3, rng=rng)
    x = np.ones((32, 32, 2), np.float32)
    x2, regions = er(x)
    assert 1 <= len(regions) <= 3
    y2, regions2 = er(np.ones_like(x), regions)
    np.testing.assert_array_equal(x2 == 0, y2 == 0)


def test_build_eraser_factory():
    from fcdgan_tpu.data.erasers import build_eraser

    assert build_eraser(False) is None
    er = build_eraser(True, regions=1, erase_thresh=0.2, seed=3)
    assert isinstance(er, RandomEraser) and er.erase_thresh == 0.2
    multi = build_eraser(True, regions=4, seed=3)
    assert isinstance(multi, RandomEraserMultiRegion) and multi.multi_region == 4
    # seeded: two factories with the same seed produce the same erase pattern
    a, _ = build_eraser(True, seed=7)(np.ones((32, 32, 1), np.float32))
    b, _ = build_eraser(True, seed=7)(np.ones((32, 32, 1), np.float32))
    np.testing.assert_array_equal(a, b)
