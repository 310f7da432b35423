"""On-device (real TPU) kernel assertions — VERDICT.md round-1 weak item 4.

These tests compile and execute the Pallas fused SSIM kernel and the
space-to-depth conv rewrites on an actual TPU backend and assert them
against their XLA-composite references at training shapes. They self-skip
off-TPU; run them with::

    FCDGAN_TEST_TPU=1 python -m pytest tests/ -m tpu

(the conftest leaves the platform untouched when FCDGAN_TEST_TPU=1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="requires a real TPU backend"
    ),
]


@pytest.fixture(scope="module")
def pair220():
    rng = np.random.default_rng(7)
    x = rng.uniform(size=(2, 220, 220, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.05, size=x.shape), 0, 1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_pallas_ssim_gate_on_tpu():
    from fcdgan_tpu.ops.pallas.fused_ssim import use_pallas_ssim

    assert use_pallas_ssim((10, 220, 220, 3)) is True


def test_pallas_ssim_kernel_on_device(pair220):
    """Compiled (non-interpret) kernel vs XLA composite at the train shape."""
    from fcdgan_tpu.ops import ssim as ssim_xla
    from fcdgan_tpu.ops.pallas import fused_ssim

    x, y = pair220
    win = jnp.asarray(ssim_xla.gaussian_window(11, 1.5))
    want_ssim, want_cs = jax.jit(
        lambda a, b: ssim_xla._ssim_maps(a, b, 1.0, win)
    )(x, y)
    got_ssim, got_cs = jax.jit(
        lambda a, b: fused_ssim.ssim_level_pallas(a, b, 1.0, 11, 1.5)
    )(x, y)
    # 1e-3 not 3e-5: on TPU the XLA composite's f32 convs decompose into
    # bf16 passes (~2e-4 relative), while the pallas kernel accumulates in
    # f32 — the kernel is the MORE precise side of this comparison
    np.testing.assert_allclose(
        np.asarray(got_ssim), np.asarray(want_ssim), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(got_cs), np.asarray(want_cs), atol=1e-3)


def test_pallas_ssim_identity_on_device(pair220):
    from fcdgan_tpu.ops.pallas import fused_ssim

    x, _ = pair220
    s, cs = jax.jit(lambda a: fused_ssim.ssim_level_pallas(a, a, 1.0, 11, 1.5))(x)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cs), 1.0, atol=1e-4)


@pytest.mark.parametrize("k,c_in,c_out", [(9, 3, 64), (9, 64, 3), (3, 64, 64)])
def test_s2d_conv_exact_on_device(k, c_in, c_out):
    """s2d conv rewrites == lax.conv on device, f32."""
    from fcdgan_tpu.ops import s2d_conv

    rng = np.random.default_rng(k * 100 + c_out)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, c_in)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(k, k, c_in, c_out)).astype(np.float32) / (k * k)
    )
    pad = (k - 1) // 2
    want = jax.jit(
        lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )(x, w)
    got_2d = jax.jit(s2d_conv.conv_s2d)(x, w)
    got_1d = jax.jit(s2d_conv.conv_s2d_w)(x, w)
    np.testing.assert_allclose(np.asarray(got_2d), np.asarray(want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_1d), np.asarray(want), atol=2e-4)


def test_joint_step_smoke_on_device():
    """One jitted USSS joint step executes on the chip and returns finite
    losses (catches Mosaic/layout regressions the CPU suite cannot)."""
    from fcdgan_tpu.models import Generator, Segmentor
    from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.train.steps import PerceptionConfig, USSSSteps

    hw = 192
    steps = USSSSteps(
        Generator(3), Segmentor(3, bilinear=True), adam(), adam(),
        load_vgg16_params(),
        PerceptionConfig(select_feature_layers(1), per_band=True),
        perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
        interior_sizes=np.array([[hw - 8, hw - 8]] * 4, np.int32),
        pad=(4, 4), msssim_weights=(0.5, 0.5),
    )
    k = jax.random.PRNGKey(0)
    z = jnp.zeros((2, hw, hw, 3))
    g = create_net_state(steps.G, k, (z,), adam())
    s = create_net_state(steps.S, jax.random.fold_in(k, 1), (z, z), adam())
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(2, hw, hw, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(2, hw, hw, 3)).astype(np.float32))
    ref = jnp.ones((2, hw, hw, 1), jnp.float32)
    item = jnp.asarray([0, 1], jnp.int32)
    w = jnp.ones(2, jnp.float32)
    g, s, metrics = steps.joint(g, s, x, y, ref, item, w, 1e-4, 1e-4)
    for key, val in metrics.items():
        assert np.isfinite(np.asarray(val)).all(), key
