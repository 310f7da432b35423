"""Quick-tier trace smoke: abstractly evaluate EVERY jitted step entry point.

``jax.eval_shape`` traces the full step (models, loss stack, optimizer
update) without compiling or running it, so this covers the whole Python
surface of each path in seconds. It exists because a path-specific
AttributeError (RSSSSteps missing ``_cgen_ck_pre``) once shipped with the
full-model step tests sitting in the slow tier — this file keeps every
step path exercised by ``-m "not slow"``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcdgan_tpu.models import Discriminator, Generator, Segmentor
from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
from fcdgan_tpu.train.optim import adam, rmsprop
from fcdgan_tpu.train.state import create_net_state
from fcdgan_tpu.train.steps import (
    PerceptionConfig, RSSSSteps, USSSSteps, WSSSSteps,
)

MSW = (0.5, 0.5)
HW = 32


@pytest.fixture(scope="module")
def vggp():
    return load_vgg16_params()


@pytest.fixture(scope="module")
def shapes():
    x = jax.ShapeDtypeStruct((2, HW, HW, 3), jnp.float32)
    ref = jax.ShapeDtypeStruct((2, HW, HW, 1), jnp.float32)
    item = jax.ShapeDtypeStruct((2,), jnp.int32)
    w = jax.ShapeDtypeStruct((2,), jnp.float32)
    lr = jax.ShapeDtypeStruct((), jnp.float32)
    return dict(x=x, ref=ref, item=item, w=w, lr=lr)


def _states(*nets_txs):
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, HW, HW, 3))
    out = []
    for i, (net, tx, nargs) in enumerate(nets_txs):
        out.append(create_net_state(net, jax.random.fold_in(k, i),
                                    (x,) * nargs, tx))
    return out


def test_usss_all_paths_trace(vggp, shapes):
    interior = np.array([[HW - 8, HW - 8]] * 4, np.int32)
    st = USSSSteps(
        Generator(3), Segmentor(3, bilinear=True), adam(), adam(), vggp,
        PerceptionConfig(select_feature_layers(1), per_band=True),
        perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
        interior_sizes=interior, pad=(4, 4), msssim_weights=MSW,
    )
    g, s = _states((st.G, adam(), 1), (st.S, adam(), 2))
    x, ref, item, w, lr = (shapes[k] for k in ("x", "ref", "item", "w", "lr"))
    jax.eval_shape(st.g_pretrain, g, x, x, w, lr)
    jax.eval_shape(st.s_init, g, s, x, x, ref, item, w, lr)
    jax.eval_shape(st.joint, g, s, x, x, ref, item, w, lr, lr)
    jax.eval_shape(st.infer, s, x, x)


def test_wsss_all_paths_trace(vggp, shapes):
    st = WSSSSteps(
        Generator(3), Segmentor(3, bilinear=True), Discriminator(3),
        adam(), rmsprop(), rmsprop(), vggp,
        PerceptionConfig(select_feature_layers(1), per_band=False),
        perception_weight=0.5, ssim_weight=0.0, g_weight=0.2,
        l1_weight=1.6, d_weight=1.0, nc_weight=1.5,
        prob_thresh=0.6, msssim_weights=MSW,
    )
    g, s, d = _states((st.G, adam(), 1), (st.S, rmsprop(), 2),
                      (st.D, rmsprop(), 2))
    x, ref, item, w, lr = (shapes[k] for k in ("x", "ref", "item", "w", "lr"))
    jax.eval_shape(st.g_pretrain, g, x, x, w, lr)
    jax.eval_shape(st.adversarial, s, d, g, x, x, ref, x, x, w, lr, lr)
    jax.eval_shape(st.infer, s, x, x)
    jax.eval_shape(st.infer_train_mode, s, x, x)


@pytest.mark.parametrize("remat", [False, True])
def test_rsss_all_paths_trace(vggp, shapes, remat):
    interior = np.array([[HW - 8, HW - 8]] * 4, np.int32)
    st = RSSSSteps(
        Generator(3), Segmentor(3, bilinear=True), Discriminator(3),
        adam(), rmsprop(), rmsprop(), vggp,
        PerceptionConfig(select_feature_layers(1), per_band=True),
        perception_weight=0.1, ssim_weight=0.0, g_weight=0.5,
        l1_weight=0.02, d_weight=1.0, r_weight=2.0,
        interior_sizes=interior, pad=(4, 4), msssim_weights=MSW,
        remat=remat,
    )
    g, s, d = _states((st.G, adam(), 1), (st.S, rmsprop(), 2),
                      (st.D, rmsprop(), 2))
    x, ref, item, w, lr = (shapes[k] for k in ("x", "ref", "item", "w", "lr"))
    jax.eval_shape(st.g_pretrain, g, x, x, ref, w, lr)
    jax.eval_shape(st.adversarial, s, d, g, x, x, ref, ref, item, w, lr, lr)
    jax.eval_shape(st.infer, s, x, x)
    jax.eval_shape(st.eval_confusion, s, x, x, ref, item, w)
