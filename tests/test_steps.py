"""Train-step semantics: gradient flow parity, loss descent, DP equivalence."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcdgan_tpu.models import Discriminator, Generator, Segmentor
from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
from fcdgan_tpu.ops import losses as L
from fcdgan_tpu.train.optim import adam, apply_updates, rmsprop
from fcdgan_tpu.train.state import NetState, create_net_state
from fcdgan_tpu.train.steps import PerceptionConfig, RSSSSteps, USSSSteps, WSSSSteps

MSW = (0.5, 0.5)
HW = 32


def clone(state):
    """Fresh buffers: step jits donate their state arguments, so tests that
    reuse a fixture must hand each call its own copy."""
    return jax.tree.map(jnp.array, state)


@pytest.fixture(scope="module")
def vggp():
    return load_vgg16_params()


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, HW, HW, 3)).astype(np.float32)
    y = (x * 0.9 + 0.1 + rng.normal(scale=0.05, size=x.shape)).astype(np.float32)
    y[:, 10:20, 10:20, :] += 2.0  # a change square
    ref = np.ones((2, HW, HW, 1), np.float32)
    ref[:, 10:20, 10:20, :] = 2.0
    region = np.zeros((2, HW, HW, 1), np.float32)
    region[:, 6:24, 6:24, :] = 1.0
    item = np.array([0, 1], np.int32)
    w = np.ones(2, np.float32)
    return dict(x=x, y=y, ref=ref, region=region, item=item, w=w)


@pytest.fixture(scope="module")
def usss(vggp):
    G, S = Generator(3), Segmentor(3, bilinear=True)
    interior = np.array([[HW - 8, HW - 8]] * 4, np.int32)
    return USSSSteps(
        G, S, adam(), adam(), vggp,
        PerceptionConfig(select_feature_layers(1), per_band=True),
        perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
        interior_sizes=interior, pad=(4, 4), msssim_weights=MSW,
    )


@pytest.fixture(scope="module")
def usss_states(usss):
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, HW, HW, 3))
    g = create_net_state(usss.G, k, (x,), adam())
    s = create_net_state(usss.S, jax.random.fold_in(k, 1), (x, x), adam())
    return g, s


@pytest.mark.slow
def test_usss_g_pretrain_descends(usss, usss_states, batch):
    g = clone(usss_states[0])
    losses = []
    for i in range(4):
        g, m = usss.g_pretrain(g, batch["x"], batch["y"], batch["w"], 1e-3)
        losses.append(float(m["NetLoss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"G loss must descend: {losses}"


@pytest.mark.slow
def test_usss_s_init_updates_both_stats(usss, usss_states, batch):
    g, s = clone(usss_states[0]), clone(usss_states[1])
    g2, s2, m = usss.s_init(clone(g), clone(s), batch["x"], batch["y"], batch["ref"],
                            batch["item"], batch["w"], 1e-4)
    # G params unchanged, G batch_stats updated (train-mode forward parity)
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()),
                                     g.params, g2.params))
    stats_changed = jax.tree.map(lambda a, b: bool((a != b).any()),
                                 g.batch_stats, g2.batch_stats)
    assert any(jax.tree.leaves(stats_changed))
    # S params updated
    p_changed = jax.tree.map(lambda a, b: bool((a != b).any()), s.params, s2.params)
    assert any(jax.tree.leaves(p_changed))
    assert m["confusion"].shape == (2, 2)
    total = float(m["confusion"].sum())
    assert total == 2 * (HW - 8) * (HW - 8)  # interior-only eval


from flax import linen as _nn  # noqa: E402


class TinyGen(_nn.Module):
    n_channels: int = 3

    @_nn.compact
    def __call__(self, x, train: bool = True):
        h = _nn.Conv(8, (3, 3), padding=1)(x)
        h = _nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = _nn.relu(h)
        return _nn.Conv(self.n_channels, (3, 3), padding=1)(h)


class TinySeg(_nn.Module):
    @_nn.compact
    def __call__(self, x1, x2, train: bool = True):
        h = jnp.concatenate([x1, x2], axis=-1)
        h = _nn.Conv(8, (3, 3), padding=1)(h)
        h = _nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = _nn.relu(h)
        return _nn.sigmoid(_nn.Conv(1, (3, 3), padding=1)(h))


def _tiny_usss(vggp, tx=None):
    import optax

    tx = tx or adam()
    interior = np.array([[HW - 8, HW - 8]] * 8, np.int32)
    # shallow perception tap (relu1_2) keeps these semantics tests cheap
    return USSSSteps(
        TinyGen(3), TinySeg(), tx, tx, vggp,
        PerceptionConfig((3,), per_band=False),
        perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
        interior_sizes=interior, pad=(4, 4), msssim_weights=MSW,
    )


def test_usss_joint_gradient_identity(batch, vggp):
    """gradG == d(LossG + NetLoss)/dG and gradS == d(NetLoss)/dS.

    Tiny stand-in models keep this a semantics test, not a scale test."""
    steps = _tiny_usss(vggp)
    k = jax.random.PRNGKey(0)
    x, y, w = jnp.asarray(batch["x"]), jnp.asarray(batch["y"]), jnp.asarray(batch["w"])
    g = create_net_state(steps.G, k, (x,), adam())
    s = create_net_state(steps.S, jax.random.fold_in(k, 1), (x, x), adam())
    pw, l1w, sw = steps.pw, steps.l1w, steps.sw

    def losses_of(pg, ps):
        y_fake, _ = steps.G.apply({"params": pg, "batch_stats": g.batch_stats},
                                  x, train=True, mutable=["batch_stats"])
        cmap, _ = steps.S.apply({"params": ps, "batch_stats": s.batch_stats},
                                x, y, train=True, mutable=["batch_stats"])
        gen, l1, perc, ssim = L.cnet_loss(
            y, y_fake, cmap, vggp, (3,),
            perception_per_band=False, msssim_weights=MSW, sample_weight=w)
        loss_g = gen + pw * perc + sw * ssim
        net_loss = gen + l1w * l1 + pw * perc + sw * ssim
        return loss_g, net_loss

    # explicit two-backward reference semantics
    grad_g_expected = jax.jit(jax.grad(
        lambda pg: losses_of(pg, s.params)[0] + losses_of(pg, s.params)[1]
    ))(g.params)
    grad_s_expected = jax.jit(jax.grad(lambda ps: losses_of(g.params, ps)[1]))(s.params)

    # what the fused joint step computes internally (reproduce its vjp)
    @jax.jit
    def fused(pg, ps):
        def fwd(pg_, ps_):
            lg, nl = losses_of(pg_, ps_)
            return lg, nl - lg  # (A, l1w*l1) decomposition equivalent

        _, vjp_fn = jax.vjp(fwd, pg, ps)
        d_pg_a, _ = vjp_fn((jnp.ones(()), jnp.zeros(())))
        _, d_ps = vjp_fn((jnp.ones(()), jnp.ones(())))
        return jax.tree.map(lambda t: 2.0 * t, d_pg_a), d_ps

    grad_g_fused, grad_s_fused = fused(g.params, s.params)

    for a_, b_ in zip(jax.tree.leaves(grad_g_fused), jax.tree.leaves(grad_g_expected)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=2e-3, atol=2e-5)
    for a_, b_ in zip(jax.tree.leaves(grad_s_fused), jax.tree.leaves(grad_s_expected)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_usss_joint_step_runs_and_updates(usss, usss_states, batch):
    g, s = clone(usss_states[0]), clone(usss_states[1])
    g2, s2, m = usss.joint(clone(g), clone(s), batch["x"], batch["y"], batch["ref"],
                           batch["item"], batch["w"], 1e-4, 1e-4)
    for k in ("NetLoss", "generator_loss", "l1_loss", "perception_loss", "ssim_loss"):
        assert np.isfinite(float(m[k])), k
    changed_g = any(jax.tree.leaves(jax.tree.map(lambda a, b: bool((a != b).any()),
                                                 g.params, g2.params)))
    changed_s = any(jax.tree.leaves(jax.tree.map(lambda a, b: bool((a != b).any()),
                                                 s.params, s2.params)))
    assert changed_g and changed_s


@pytest.mark.slow
def test_usss_infer_in_eval_mode(usss, usss_states, batch):
    _, s = usss_states
    out = usss.infer(s, batch["x"], batch["y"])
    assert out.shape == (2, HW, HW, 1)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wsss(vggp):
    G, S, D = Generator(3), Segmentor(3, bilinear=True), Discriminator(3)
    return WSSSSteps(
        G, S, D, adam(), rmsprop(), rmsprop(), vggp,
        PerceptionConfig(select_feature_layers(1), per_band=False),
        perception_weight=0.5, ssim_weight=0.0, g_weight=0.2,
        l1_weight=1.6, d_weight=1.0, nc_weight=1.5,
        prob_thresh=0.6, msssim_weights=MSW,
    )


@pytest.mark.slow
def test_wsss_adversarial_step(wsss, batch):
    k = jax.random.PRNGKey(2)
    x = jnp.zeros((2, HW, HW, 3))
    g = create_net_state(wsss.G, k, (x,), adam())
    s = create_net_state(wsss.S, jax.random.fold_in(k, 1), (x, x), rmsprop())
    d = create_net_state(wsss.D, jax.random.fold_in(k, 2), (x, x), rmsprop())

    c_ref = (batch["ref"] - 1.0)  # {0,1} coding for WSSS
    s2, d2, m = wsss.adversarial(
        clone(s), clone(d), g, batch["x"], batch["y"], c_ref,
        batch["y"], batch["y"], batch["w"], 1e-4, 1e-5,
    )
    for key in ("d_loss", "s_loss", "s_d_loss", "l1_loss", "nc_loss", "g_loss"):
        assert np.isfinite(float(m[key])), key
    # d_loss = 1 + mean(nc) - mean(c) with sigmoid outputs: in [0, 2]
    assert 0.0 <= float(m["d_loss"]) <= 2.0
    assert m["confusion"].shape == (2, 2)
    assert float(m["confusion"].sum()) == 2 * HW * HW  # full patch eval
    for st, st2 in ((s, s2), (d, d2)):
        assert any(jax.tree.leaves(jax.tree.map(
            lambda a, b: bool((a != b).any()), st.params, st2.params)))


@pytest.mark.slow
def test_wsss_g_pretrain_descends(wsss, batch):
    k = jax.random.PRNGKey(3)
    g = create_net_state(wsss.G, k, (jnp.zeros((2, HW, HW, 3)),), adam())
    losses = []
    for _ in range(4):
        g, m = wsss.g_pretrain(g, batch["x"], batch["y"], batch["w"], 1e-3)
        losses.append(float(m["g_loss"]))
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rsss(vggp):
    G, S, D = Generator(3), Segmentor(3, bilinear=True), Discriminator(3)
    interior = np.array([[HW - 8, HW - 8]] * 4, np.int32)
    return RSSSSteps(
        G, S, D, adam(), rmsprop(), rmsprop(), vggp,
        PerceptionConfig(select_feature_layers(1), per_band=True),
        perception_weight=0.1, ssim_weight=0.0, g_weight=0.5,
        l1_weight=0.02, d_weight=1.0, r_weight=2.0,
        interior_sizes=interior, pad=(4, 4), msssim_weights=MSW,
    )


@pytest.mark.slow
def test_rsss_adversarial_step(rsss, batch):
    k = jax.random.PRNGKey(4)
    x = jnp.zeros((2, HW, HW, 3))
    g = create_net_state(rsss.G, k, (x,), adam())
    s = create_net_state(rsss.S, jax.random.fold_in(k, 1), (x, x), rmsprop())
    d = create_net_state(rsss.D, jax.random.fold_in(k, 2), (x, x), rmsprop())
    s2, d2, m = rsss.adversarial(
        clone(s), clone(d), g, batch["x"], batch["y"], batch["ref"], batch["region"],
        batch["item"], batch["w"], 5e-5, 5e-5,
    )
    for key in ("d_loss", "s_loss", "s_d_loss", "l1_loss", "r_loss", "g_loss"):
        assert np.isfinite(float(m[key])), key
    assert m["confusion"].shape == (2, 2)

    cm, cmap = rsss.eval_confusion(clone(s2), batch["x"], batch["y"], batch["ref"],
                                   batch["item"], batch["w"])
    assert cm.shape == (2, 2) and cmap.shape == (2, HW, HW, 1)

    # reference-parity test eval (Demo_RSSS.py:415): train-mode BN forward
    # whose confusion matches a direct mutable apply, and whose returned
    # state carries test-updated running stats
    s3 = clone(s2)
    cm_t, s4 = rsss.eval_confusion_train(clone(s2), batch["x"], batch["y"],
                                         batch["ref"], batch["item"], batch["w"])
    cmap_direct, muts = rsss.S.apply(s3.variables, batch["x"], batch["y"],
                                     train=True, mutable=["batch_stats"])
    cm_direct = rsss._confusion(np.asarray(cmap_direct, np.float32),
                                batch["ref"], batch["item"], batch["w"],
                                rsss.test_interior)
    np.testing.assert_array_equal(np.asarray(cm_t), np.asarray(cm_direct))
    stats_changed = jax.tree.map(lambda a, b: bool((np.asarray(a) !=
                                                    np.asarray(b)).any()),
                                 s3.batch_stats, s4.batch_stats)
    assert any(jax.tree.leaves(stats_changed))


@pytest.mark.slow
def test_rsss_g_pretrain_with_region_mask(rsss, batch):
    k = jax.random.PRNGKey(5)
    g = create_net_state(rsss.G, k, (jnp.zeros((2, HW, HW, 3)),), adam())
    losses = []
    for _ in range(4):
        g, m = rsss.g_pretrain(g, batch["x"], batch["y"], batch["region"],
                               batch["w"], 1e-3)
        losses.append(float(m["g_loss"]))
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# Data parallelism: sharded batch over 8 virtual devices == single device
# ---------------------------------------------------------------------------


def test_usss_joint_step_dp_equivalence(batch, vggp):
    """Sharded batch over an 8-device mesh == single-device run.

    Tiny models with BatchNorm: GSPMD must compute global-batch BN statistics
    and all-reduce the gradients with no code changes to the step."""
    import jax
    import optax
    from fcdgan_tpu.parallel.mesh import (
        make_mesh, pad_batch_to_multiple, replicate_state, shard_batch)

    # plain SGD: the param delta is lr * grad, so near-zero gradients can't
    # amplify reduction-order noise into sign flips (as Adam's first step does)
    sgd = optax.scale(-1.0)
    steps = _tiny_usss(vggp, tx=sgd)
    k = jax.random.PRNGKey(0)
    x = jnp.asarray(batch["x"])
    g = create_net_state(steps.G, k, (x,), sgd)
    s = create_net_state(steps.S, jax.random.fold_in(k, 1), (x, x), sgd)

    # single-device run on the full 8-sample batch (2 real + 6 weight-0 pads
    # so the DP run sees identical BN batches)
    hb = pad_batch_to_multiple(dict(
        x=batch["x"], y=batch["y"], ref=batch["ref"],
        item=batch["item"], weight=batch["w"]), 8)
    g1, s1, m1 = steps.joint(clone(g), clone(s), hb["x"], hb["y"], hb["ref"],
                             hb["item"], hb["weight"], 1e-4, 1e-4)

    mesh = make_mesh(8)
    db = shard_batch(hb, mesh)
    g8, s8, m8 = steps.joint(replicate_state(g, mesh), replicate_state(s, mesh),
                             db["x"], db["y"], db["ref"], db["item"],
                             db["weight"], 1e-4, 1e-4)

    np.testing.assert_allclose(float(m1["NetLoss"]), float(m8["NetLoss"]), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(m1["confusion"]), np.asarray(m8["confusion"]))
    # updated params must match leaf-by-leaf (global-batch BN + psum grads)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_joint_step_hlo_contains_collectives(batch, vggp):
    """GSPMD must insert cross-device collectives (gradient all-reduce /
    global-batch BN) for the sharded joint step — the framework's 'NCCL'."""
    import jax
    from fcdgan_tpu.parallel.mesh import (
        make_mesh, pad_batch_to_multiple, replicate_state, shard_batch)

    steps = _tiny_usss(vggp)
    k = jax.random.PRNGKey(0)
    x = jnp.asarray(batch["x"])
    g = create_net_state(steps.G, k, (x,), adam())
    s = create_net_state(steps.S, jax.random.fold_in(k, 1), (x, x), adam())
    mesh = make_mesh(8)
    hb = pad_batch_to_multiple(dict(
        x=batch["x"], y=batch["y"], ref=batch["ref"],
        item=batch["item"], weight=batch["w"]), 8)
    db = shard_batch(hb, mesh)
    g_r, s_r = replicate_state(g, mesh), replicate_state(s, mesh)
    compiled = steps.joint.lower(g_r, s_r, db["x"], db["y"], db["ref"],
                                 db["item"], db["weight"], 1e-4, 1e-4).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "expected GSPMD-inserted all-reduce collectives"


def test_wsss_adversarial_dp_smoke(vggp, batch):
    """WSSS D-then-S adversarial step runs sharded over the 8-device mesh."""
    import jax
    from fcdgan_tpu.parallel.mesh import (
        make_mesh, pad_batch_to_multiple, replicate_state, shard_batch)

    class TinyDisc(_nn.Module):
        @_nn.compact
        def __call__(self, x, y, train: bool = True):
            h = _nn.Conv(8, (3, 3), strides=2, padding=1)(x - y)
            h = _nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
            h = _nn.relu(h)
            return _nn.sigmoid(jnp.mean(h, axis=(1, 2, 3)))

    steps = WSSSSteps(
        TinyGen(3), TinySeg(), TinyDisc(), adam(), rmsprop(), rmsprop(), vggp,
        PerceptionConfig((3,), per_band=False),
        perception_weight=0.5, ssim_weight=0.0, g_weight=0.2,
        l1_weight=1.6, d_weight=1.0, nc_weight=1.5, msssim_weights=MSW)
    k = jax.random.PRNGKey(0)
    x = jnp.asarray(batch["x"])
    g = create_net_state(steps.G, k, (x,), adam())
    s = create_net_state(steps.S, jax.random.fold_in(k, 1), (x, x), rmsprop())
    d = create_net_state(steps.D, jax.random.fold_in(k, 2), (x, x), rmsprop())

    mesh = make_mesh(8)
    c_ref = batch["ref"] - 1.0
    hb = pad_batch_to_multiple(dict(
        c_x=batch["x"], c_y=batch["y"], c_ref=c_ref,
        nc_x=batch["y"], nc_y=batch["y"], weight=batch["w"]), 8)
    db = shard_batch(hb, mesh)
    s2, d2, m = steps.adversarial(
        replicate_state(s, mesh), replicate_state(d, mesh), replicate_state(g, mesh),
        db["c_x"], db["c_y"], db["c_ref"], db["nc_x"], db["nc_y"],
        db["weight"], 1e-4, 1e-5)
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["s_loss"]))
    assert np.asarray(m["confusion"]).shape == (2, 2)


@pytest.mark.slow
def test_usss_joint_remat_equivalent(usss, usss_states, batch, vggp):
    """remat=True recomputes forwards in the backward — identical math.

    Compared with unit-LR SGD so parameter deltas scale with the actual
    gradient difference: Adam would normalize the zero-gradient conv-bias
    leaves' float noise to +-lr, making the comparison ill-posed."""
    import optax

    sgd = lambda: optax.chain(optax.scale(-1.0))
    interior = np.array([[HW - 8, HW - 8]] * 4, np.int32)

    def mk(remat):
        return USSSSteps(
            usss.G, usss.S, sgd(), sgd(), vggp,
            PerceptionConfig(select_feature_layers(1), per_band=True),
            perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
            interior_sizes=interior, pad=(4, 4), msssim_weights=MSW,
            remat=remat,
        )

    outs = []
    for steps in (mk(False), mk(True)):
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((2, HW, HW, 3))
        g = create_net_state(steps.G, k, (x,), sgd())
        s = create_net_state(steps.S, jax.random.fold_in(k, 1), (x, x), sgd())
        g, s, m = steps.joint(g, s, batch["x"], batch["y"], batch["ref"],
                              batch["item"], batch["w"], 1e-3, 1e-3)
        outs.append((g, s, m))
    (g0, s0, m0), (g1, s1, m1) = outs
    np.testing.assert_allclose(float(m0["NetLoss"]), float(m1["NetLoss"]), rtol=1e-6)
    # the recompute path fuses/reassociates differently at f32: ~1e-6 noise
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g0.params), jax.tree.leaves(g1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.batch_stats), jax.tree.leaves(s1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
