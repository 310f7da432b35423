"""LR schedule values at phase boundaries (CommonFunc.py:23-37 parity)."""

import pytest

from fcdgan_tpu.train.schedules import (
    G_PRETRAIN,
    JOINT_USSS,
    WarmupSustainDecay,
)


def test_warmup_values():
    s = WarmupSustainDecay(lr_start=1e-4, lr_max=1e-3, warmup_epochs=20)
    assert s(0) == pytest.approx(1e-4)
    assert s(10) == pytest.approx(1e-4 + (1e-3 - 1e-4) / 20 * 10)
    # epoch == warmup: decay branch epoch 0 -> (max-min)*0.8^0 + min
    assert s(20) == pytest.approx((1e-3 - 1e-6) + 1e-6)


def test_sustain_plateau():
    s = WarmupSustainDecay(lr_start=1e-5, lr_max=3e-4, warmup_epochs=10, sustain_epochs=10)
    assert s(10) == pytest.approx(3e-4)
    assert s(19) == pytest.approx(3e-4)
    assert s(20) == pytest.approx((3e-4 - 1e-6) * 0.8**0 + 1e-6)
    assert s(25) == pytest.approx((3e-4 - 1e-6) * 0.8**5 + 1e-6)


def test_decay_floor():
    s = WarmupSustainDecay(lr_start=1e-5, lr_max=1e-4, warmup_epochs=20)
    assert s(1000) == pytest.approx(1e-6, rel=1e-3)


def test_presets_match_reference_constants():
    assert G_PRETRAIN(0) == pytest.approx(1e-5)
    assert G_PRETRAIN(10) == pytest.approx(3e-4)
    assert JOINT_USSS(0) == pytest.approx(1e-5)
    assert JOINT_USSS(19) == pytest.approx(1e-5 + (1e-4 - 1e-5) / 20 * 19)


def test_fractional_epoch_clock():
    """lr_epoch_scale feeds fractional epochs: the curve must interpolate
    smoothly (demos call schedule(i / cfg.lr_epoch_scale))."""
    s = WarmupSustainDecay(lr_start=1e-5, lr_max=3e-4, warmup_epochs=10,
                           sustain_epochs=10)
    # scale 1.0 is exact reference parity (i / 1.0 == i)
    for i in range(40):
        assert s(i / 1.0) == s(i)
    # stretched clock: epoch 40 at scale 4 sits where epoch 10 did
    assert s(40 / 4.0) == pytest.approx(s(10))
    # warm-up midpoint interpolates linearly
    assert s(2.5) == pytest.approx(1e-5 + (3e-4 - 1e-5) / 10 * 2.5)
