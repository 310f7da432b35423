"""BN bias-fold equivalence (models/layers.bn_fold_enabled).

A conv bias immediately followed by train-mode BatchNorm cancels exactly in
the normalized output; the fold (TorchConv defer_bias -> BatchNorm fold_bias)
must leave forward outputs, running stats, and every non-bias gradient
unchanged, with the bias gradient exactly zero (its true value).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fcdgan_tpu.models import Discriminator, Generator, Segmentor


def _run(monkeypatch, fold: bool, model, args, train):
    if fold:
        monkeypatch.delenv("FCDGAN_NO_BN_FOLD", raising=False)
    else:
        monkeypatch.setenv("FCDGAN_NO_BN_FOLD", "1")
    variables = model.init(jax.random.PRNGKey(0), *args)

    def loss_fn(params):
        out, muts = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            *args, train=train, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2), (out, muts["batch_stats"])

    if train:
        (loss, (out, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
    else:
        out = model.apply(variables, *args, train=False)
        loss, grads, bs = None, None, None
    return variables, out, bs, grads


MODELS = [
    ("generator", lambda: Generator(3), 1),
    ("segmentor", lambda: Segmentor(3, bilinear=True), 2),
    ("discriminator", lambda: Discriminator(3), 2),
]


@pytest.mark.parametrize("name,mk,nargs", MODELS, ids=[m[0] for m in MODELS])
def test_bn_fold_equivalence(monkeypatch, name, mk, nargs):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)).astype(np.float32))
    args = (x,) * nargs
    model = mk()

    v0, out0, bs0, g0 = _run(monkeypatch, False, model, args, train=True)
    v1, out1, bs1, g1 = _run(monkeypatch, True, model, args, train=True)

    # identical parameter trees (checkpoint interop)
    t0 = jax.tree_util.tree_structure(v0["params"])
    t1 = jax.tree_util.tree_structure(v1["params"])
    assert t0 == t1
    for a, b in zip(jax.tree.leaves(v0["params"]), jax.tree.leaves(v1["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=2e-5, rtol=2e-5)
    # running stats stored in the biased convention either way
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)

    # grads equal on every leaf except conv biases feeding a BN, where the
    # unfolded value is float-cancellation noise and the folded one is the
    # true zero
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    n_zeroed = 0
    for (p0, a), (p1, b) in zip(flat0, flat1):
        assert p0 == p1
        a, b = np.asarray(a), np.asarray(b)
        path = jax.tree_util.keystr(p0)
        if np.all(b == 0) and not np.all(a == 0):
            assert "Conv" in path and path.endswith("['bias']"), path
            assert np.abs(a).max() < 1e-2, (path, np.abs(a).max())
            n_zeroed += 1
        else:
            # reassociation noise amplifies chaotically through stacked BN
            # divides in deep models (isolated element outliers); the
            # per-layer exactness is pinned by test_bn_fold_single_block_tight
            # below, so the deep check is statistical
            # ...and epsilon-level input differences flip ReLU gates /
            # max-pool winners, discretely rerouting a tiny fraction of
            # gradient elements (O(1e-4) of a leaf) — both sides are exact
            # gradients of numerically-identical-to-rounding functions
            scale = max(np.abs(a).max(), 1e-3)
            diff = np.abs(a - b)
            assert diff.mean() <= 0.01 * scale, (path, diff.mean(), scale)
            n_out = int((diff > 0.03 * scale).sum())
            assert n_out <= max(3, a.size // 2000), (path, n_out)
            assert diff.max() <= 0.5 * scale, (path, diff.max(), scale)
    assert n_zeroed >= 3  # the fold actually engaged


def test_bn_fold_single_block_tight(monkeypatch):
    """One DoubleConv (2 conv+BN+relu pairs): fold vs no-fold grads agree to
    float-reassociation precision and the bias grad is exactly zero."""
    from fcdgan_tpu.models.layers import DoubleConv

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 8)).astype(np.float32))
    model = DoubleConv(16)

    outs = []
    for fold in (False, True):
        if fold:
            monkeypatch.delenv("FCDGAN_NO_BN_FOLD", raising=False)
        else:
            monkeypatch.setenv("FCDGAN_NO_BN_FOLD", "1")
        variables = model.init(jax.random.PRNGKey(0), x, True)

        def loss_fn(params):
            out, muts = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2), muts["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        outs.append((float(loss), bs, grads))

    (l0, bs0, g0), (l1, bs1, g1) = outs
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    zeroed = 0
    for (p0, a), (p1, b) in zip(flat0, flat1):
        path = jax.tree_util.keystr(p0)
        a, b = np.asarray(a), np.asarray(b)
        if "TorchConv" in path and path.endswith("['bias']"):
            assert np.all(b == 0), path
            zeroed += 1
        else:
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(a, b, atol=1e-4 * scale, err_msg=path)
    assert zeroed == 2


@pytest.mark.parametrize("name,mk,nargs", MODELS[:2], ids=["generator", "segmentor"])
def test_bn_fold_eval_equivalence(monkeypatch, name, mk, nargs):
    """Eval mode uses (running_mean - bias): matches the unfolded forward."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)).astype(np.float32))
    args = (x,) * nargs
    model = mk()

    # warm the running stats with one train-mode pass (fold ON), then compare
    # eval forwards with and without the fold on identical variables
    monkeypatch.delenv("FCDGAN_NO_BN_FOLD", raising=False)
    variables = model.init(jax.random.PRNGKey(0), *args)
    _, muts = model.apply(variables, *args, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": muts["batch_stats"]}

    out_fold = model.apply(variables, *args, train=False)
    monkeypatch.setenv("FCDGAN_NO_BN_FOLD", "1")
    out_plain = model.apply(variables, *args, train=False)
    np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_plain),
                               atol=2e-5, rtol=2e-5)
