"""Fused pallas SSIM kernel vs the XLA composite (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fcdgan_tpu.ops import ssim as ssim_xla

pallas_mod = pytest.importorskip("fcdgan_tpu.ops.pallas.fused_ssim")


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 40, 48, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.08, size=x.shape), 0, 1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_kernel_matches_xla_composite(pair):
    x, y = pair
    win = jnp.asarray(ssim_xla.gaussian_window(11, 1.5))
    want_ssim, want_cs = ssim_xla._ssim_maps(x, y, 1.0, win)
    got_ssim, got_cs = pallas_mod.ssim_level_interpret(x, y, 1.0, 11, 1.5)
    np.testing.assert_allclose(np.asarray(got_ssim), np.asarray(want_ssim), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_cs), np.asarray(want_cs), atol=2e-5)


def test_kernel_identity_is_one(pair):
    x, _ = pair
    s, cs = pallas_mod.ssim_level_interpret(x, x, 1.0, 11, 1.5)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs), 1.0, atol=1e-5)


def test_custom_vjp_falls_back_to_composite(pair):
    """Gradient of the pallas op == gradient of the XLA composite."""
    x, y = pair
    win = jnp.asarray(ssim_xla.gaussian_window(11, 1.5))

    # custom_vjp backward path (forward replaced by interpret-mode pallas is
    # unnecessary here: the bwd rule never runs the kernel)
    def f_pallas(y_):
        s, cs = pallas_mod._fwd(x, y_, 1.0, 11, 1.5, 0.01, 0.03)[0], None
        # reuse the bwd rule directly against a composite forward value
        return None

    # compare d(mean ssim)/dy through the composite vs through the custom_vjp
    def through_composite(y_):
        s, _ = ssim_xla._ssim_maps(x, y_, 1.0, win)
        return s.mean()

    g_expected = jax.grad(through_composite)(y)

    # build the same scalar through the bwd rule
    ct = (jnp.full((2, 3), 1.0 / 6, jnp.float32), jnp.zeros((2, 3), jnp.float32))
    _, g_via_rule = pallas_mod._bwd(1.0, 11, 1.5, 0.01, 0.03, (x, y), ct)[0], None
    g_rule = pallas_mod._bwd(1.0, 11, 1.5, 0.01, 0.03, (x, y), ct)[1]
    np.testing.assert_allclose(np.asarray(g_rule), np.asarray(g_expected),
                               rtol=1e-4, atol=1e-6)


def test_use_pallas_guard():
    from fcdgan_tpu.ops.pallas.fused_ssim import use_pallas_ssim

    # CPU backend in tests -> always False
    assert use_pallas_ssim((2, 220, 220, 3)) is False


def test_dispatch_env_kill_switch(pair, monkeypatch):
    x, y = pair
    monkeypatch.setenv("FCDGAN_NO_PALLAS", "1")
    a = float(ssim_xla.ssim(x, y, data_range=1.0))
    monkeypatch.delenv("FCDGAN_NO_PALLAS")
    b = float(ssim_xla.ssim(x, y, data_range=1.0))
    assert a == pytest.approx(b, abs=1e-6)  # CPU: both take the XLA path
