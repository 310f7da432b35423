"""Exactness of the space-to-depth conv rewrites (ops/s2d_conv.py).

Both transforms must be bit-for-bit rewrites of lax.conv SAME stride-1 convs
in f32 on CPU (summation-order differences only, <=1e-5 relative)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fcdgan_tpu.ops.s2d_conv import conv_s2d, conv_s2d_w, s2d_mode


def _ref_conv(x, w):
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,cin,cout,h,w", [
    (3, 64, 64, 20, 22),   # generator trunk shape class (H even)
    (3, 64, 64, 21, 22),   # odd H: 1-D transform must not care
    (3, 3, 64, 16, 48),
    (9, 3, 64, 22, 22),
    (9, 64, 3, 22, 22),
    (5, 16, 16, 20, 20),
])
def test_conv_s2d_w_exact(k, cin, cout, h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    ker = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    ref = _ref_conv(x, ker)
    got = conv_s2d_w(x, ker)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("k,cin,cout", [(3, 64, 64), (9, 3, 64)])
def test_conv_s2d_2d_exact(k, cin, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 20, 24, cin)).astype(np.float32))
    ker = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    np.testing.assert_allclose(conv_s2d(x, ker), _ref_conv(x, ker),
                               rtol=1e-5, atol=1e-4)


def test_conv_s2d_w_grads_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 12, 16, 8)).astype(np.float32))
    ker = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))

    def loss(fn, x, k):
        return jnp.sum(fn(x, k) ** 2)

    gx_ref, gk_ref = jax.grad(lambda a, b: loss(_ref_conv, a, b), (0, 1))(x, ker)
    gx, gk = jax.grad(lambda a, b: loss(conv_s2d_w, a, b), (0, 1))(x, ker)
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(gk, gk_ref, rtol=1e-4, atol=1e-3)


def test_s2d_mode_dispatch():
    # measured rules: k>=7 -> 1d (round 2: beats 2d — no reorg transposes),
    # k==3 narrow -> 1d, wide/strided/odd-W -> None
    assert s2d_mode(220, 220, 9, 3, 64) == "1d"
    import os
    os.environ["FCDGAN_S2D_K9"] = "2d"
    try:
        assert s2d_mode(220, 220, 9, 3, 64) == "2d"
        assert s2d_mode(221, 220, 9, 3, 64) == "1d"  # odd H: 2d impossible
    finally:
        del os.environ["FCDGAN_S2D_K9"]
    assert s2d_mode(220, 220, 3, 64, 64) == "1d"
    assert s2d_mode(221, 220, 3, 64, 64) == "1d"   # odd H fine for 1-D
    assert s2d_mode(220, 221, 3, 64, 64) is None   # odd W blocks both
    assert s2d_mode(220, 220, 3, 128, 128) is None # wide fills lanes already
    assert s2d_mode(220, 220, 3, 64, 64, strides=(2, 2)) is None
    assert s2d_mode(4, 4, 3, 64, 64) is None       # tiny spatial


def test_s2d_mode_env_off(monkeypatch):
    monkeypatch.setenv("FCDGAN_NO_S2D", "1")
    assert s2d_mode(220, 220, 9, 3, 64) is None
