"""perception_loss(target_grad=False): exact G-pretrain fast path.

In every G-pretrain phase the mask and target are data (cmap = zeros at
Demo_USSS.py:151 / Demo_WSSS.py:167, cmap = region at Demo_RSSS.py:203), so
the perception target branch carries no gradient; losses.py then runs the two
VGG branches as separate passes with the target under stop_gradient, cutting
the target half's backward. These tests pin (a) forward-value equality,
(b) gradient equality w.r.t. the generated image, and (c) that the grad
computation actually got cheaper (XLA-reported FLOPs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcdgan_tpu.models.vgg import vgg16_random_params
from fcdgan_tpu.ops import losses as L

TAPS = (8, 3)  # shallow taps keep the CPU cost tiny; exercises multi-layer


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    tgt = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    gen = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    cmap = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 1)).astype(np.float32))
    vgg = vgg16_random_params()
    return tgt, gen, cmap, vgg


@pytest.mark.parametrize("per_band", [False, True])
def test_value_and_generated_grad_match(data, per_band):
    tgt, gen, cmap, vgg = data

    def loss(g, target_grad):
        return L.perception_loss(tgt, g, cmap, vgg, TAPS, per_band=per_band,
                                 target_grad=target_grad)

    v1, g1 = jax.value_and_grad(lambda g: loss(g, True))(gen)
    v0, g0 = jax.value_and_grad(lambda g: loss(g, False))(gen)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-7)


def test_composite_losses_pass_through(data):
    tgt, gen, cmap, vgg = data
    zeros = jnp.zeros_like(cmap)  # the USSS/WSSS pretrain mask
    msw = (0.5, 0.5)  # 2-scale MS-SSIM fits the 64px test tiles

    def cnet(g, tg):
        return L.cnet_loss(tgt, g, zeros, vgg, TAPS, msssim_weights=msw,
                           perception_target_grad=tg)

    def cgen(g, tg):
        return L.cgenerator_loss(tgt, g, cmap, vgg, TAPS, msssim_weights=msw,
                                 perception_target_grad=tg)

    for fn in (cnet, cgen):
        v1, g1 = jax.value_and_grad(lambda g: sum(fn(g, True)))(gen)
        v0, g0 = jax.value_and_grad(lambda g: sum(fn(g, False)))(gen)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-5, atol=1e-7)


def test_compute_ssim_off_matches_except_metric(data):
    """--ssim-metric false: identical losses/grads at ssim_weight 0, ssim=0."""
    tgt, gen, cmap, vgg = data
    msw = (0.5, 0.5)

    def total(g, compute_ssim):
        gl, l1, pl, sl = L.cnet_loss(tgt, g, cmap, vgg, TAPS,
                                     msssim_weights=msw, ssim_grad=False,
                                     compute_ssim=compute_ssim)
        return gl + 0.65 * l1 + 0.4 * pl + 0.0 * sl, (gl, l1, pl, sl)

    (v1, t1), g1 = jax.value_and_grad(total, has_aux=True)(gen, True)
    (v0, t0), g0 = jax.value_and_grad(total, has_aux=True)(gen, False)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-6)
    for a, b in zip(t0[:3], t1[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert float(t0[3]) == 0.0 and float(t1[3]) != 0.0


def test_backward_flops_drop(data):
    """The split form must make the grad computation cheaper, not just equal."""
    tgt, gen, cmap, vgg = data

    def flops(target_grad):
        f = jax.grad(lambda g: L.perception_loss(
            tgt, g, cmap, vgg, (15, 8, 3), target_grad=target_grad))
        cost = jax.jit(f).lower(gen).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])

    with_tg, without_tg = flops(True), flops(False)
    assert without_tg < 0.85 * with_tg, (with_tg, without_tg)
