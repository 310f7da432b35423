"""Flat-buffer (fused) optimizer state vs per-leaf optax: exact equivalence.

The fused path (train/optim.py::_flat_adam/_flat_rmsprop, opt-in via
FCDGAN_FUSED_OPT=1 — measured neutral on the v5e joint step, so per-leaf
stays the default) keeps Adam/RMSprop moments as one flat f32 vector. Per
element the update formulas are identical to the per-leaf chain — these
tests pin that over multi-step trajectories on a ragged param tree (conv
kernels, biases, BN scales).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fcdgan_tpu.train import optim


def _tree(rng):
    return {
        "conv1": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 16, 32)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(32,)), jnp.float32)},
        "bn": {"scale": jnp.asarray(rng.normal(size=(32,)), jnp.float32),
               "bias": jnp.asarray(rng.normal(size=(32,)), jnp.float32)},
        "head": {"kernel": jnp.asarray(rng.normal(size=(1, 1, 32, 1)), jnp.float32)},
    }


def _run(tx, params, grads_seq, lrs):
    opt = jax.jit(tx.init)(params)
    step = jax.jit(lambda p, o, g, lr: optim.apply_updates(p, o, g, tx, lr))
    for g, lr in zip(grads_seq, lrs):
        params, opt = step(params, opt, g, lr)
    return params


@pytest.mark.parametrize("make_flat,make_leaf", [
    (lambda: optim._flat_adam(0.9, 0.99, 1e-8),
     lambda: __import__("optax").chain(
         __import__("optax").scale_by_adam(b1=0.9, b2=0.99, eps=1e-8, eps_root=0.0),
         __import__("optax").scale(-1.0))),
    (lambda: optim._flat_rmsprop(0.99, 1e-8),
     lambda: __import__("optax").chain(
         optim._scale_by_torch_rms(0.99, 1e-8),
         __import__("optax").scale(-1.0))),
], ids=["adam", "rmsprop"])
def test_flat_matches_per_leaf(make_flat, make_leaf):
    rng = np.random.default_rng(0)
    params = _tree(rng)
    grads_seq = [jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params)
        for _ in range(6)]
    lrs = [2e-4, 2e-4, 1e-4, 1e-4, 5e-5, 5e-5]

    p_flat = _run(make_flat(), params, grads_seq, lrs)
    p_leaf = _run(make_leaf(), params, grads_seq, lrs)

    flat_leaves = jax.tree.leaves(p_flat)
    leaf_leaves = jax.tree.leaves(p_leaf)
    assert len(flat_leaves) == len(leaf_leaves)
    for a, b in zip(flat_leaves, leaf_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("make_grouped,make_leaf", [
    # small_elems=64: the conv kernel (4608) stays per-leaf, biases/BN
    # scales (32) and the 1x1 head (32) go through the grouped flat vector
    (lambda: optim._grouped_adam(0.9, 0.99, 1e-8, small_elems=64),
     lambda: __import__("optax").chain(
         __import__("optax").scale_by_adam(b1=0.9, b2=0.99, eps=1e-8, eps_root=0.0),
         __import__("optax").scale(-1.0))),
    (lambda: optim._grouped_rmsprop(0.99, 1e-8, small_elems=64),
     lambda: __import__("optax").chain(
         optim._scale_by_torch_rms(0.99, 1e-8),
         __import__("optax").scale(-1.0))),
], ids=["adam", "rmsprop"])
def test_grouped_matches_per_leaf(make_grouped, make_leaf):
    rng = np.random.default_rng(1)
    params = _tree(rng)
    grads_seq = [jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params)
        for _ in range(6)]
    lrs = [2e-4, 2e-4, 1e-4, 1e-4, 5e-5, 5e-5]

    p_grp = _run(make_grouped(), params, grads_seq, lrs)
    p_leaf = _run(make_leaf(), params, grads_seq, lrs)

    for a, b in zip(jax.tree.leaves(p_grp), jax.tree.leaves(p_leaf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_grouped_all_small_and_all_big():
    # degenerate partitions: every leaf grouped / every leaf per-leaf
    rng = np.random.default_rng(2)
    params = _tree(rng)
    grads = [jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params)
        for _ in range(3)]
    lrs = [1e-4] * 3
    import optax as _ox

    ref = _run(_ox.chain(_ox.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8, eps_root=0.0),
                         _ox.scale(-1.0)), params, grads, lrs)
    for thresh in (0, 1 << 30):
        got = _run(optim._grouped_adam(0.9, 0.99, 1e-8, small_elems=thresh),
                   params, grads, lrs)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_factory_env_toggle(monkeypatch):
    monkeypatch.delenv("FCDGAN_FUSED_OPT", raising=False)
    monkeypatch.delenv("FCDGAN_OPT", raising=False)
    tx = optim.adam()
    st = tx.init({"w": jnp.zeros((3,))})
    assert not isinstance(st, optim.FlatAdamState)
    monkeypatch.setenv("FCDGAN_FUSED_OPT", "1")
    tx = optim.adam()
    assert isinstance(tx.init({"w": jnp.zeros((3,))}), optim.FlatAdamState)
    assert isinstance(optim.rmsprop().init({"w": jnp.zeros((3,))}),
                      optim.FlatRmsPropState)
    monkeypatch.setenv("FCDGAN_OPT", "grouped")
    assert isinstance(optim.adam().init({"w": jnp.zeros((3,))}),
                      optim.GroupedAdamState)
    assert isinstance(optim.rmsprop().init({"w": jnp.zeros((3,))}),
                      optim.GroupedRmsPropState)
