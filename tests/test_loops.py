"""EpochAverages: on-device accumulation equals the naive host loop."""

import numpy as np

import jax.numpy as jnp

from fcdgan_tpu.train.loops import EpochAverages


def test_epoch_averages_matches_host_loop():
    rng = np.random.default_rng(0)
    total = 37
    av = EpochAverages(total)
    host_sums = {}
    host_cm = np.zeros((2, 2))
    for _ in range(5):
        bw = float(rng.integers(1, 11))
        m = {
            "NetLoss": jnp.asarray(rng.normal(), jnp.float32),
            "l1_loss": jnp.asarray(rng.normal(), jnp.float32),
            "confusion": jnp.asarray(
                rng.integers(0, 1000, size=(2, 2)).astype(np.float32)),
        }
        av.update(m, bw)
        for k, v in m.items():
            if k == "confusion":
                host_cm += np.asarray(v)
            else:
                host_sums[k] = host_sums.get(k, 0.0) + float(v) * bw / total

    for k, v in host_sums.items():
        np.testing.assert_allclose(av[k], v, rtol=1e-6)
    np.testing.assert_array_equal(av.confusion, host_cm.astype(np.int64))
    ev = av.evaluator(2)
    np.testing.assert_allclose(ev.confusion_matrix, host_cm)
    assert set(av.as_dict()) == set(host_sums)


def test_epoch_averages_empty_and_missing_keys():
    av = EpochAverages(10)
    assert av["anything"] == 0.0
    assert av.confusion is None
    assert av.as_dict() == {}
    ev = av.evaluator(2)
    assert ev.confusion_matrix.sum() == 0


def test_epoch_averages_start_read_and_mixed_folds():
    """start_read (async packed download) + updates after it + FOLD_EVERY
    folds all combine into the same totals as the naive host loop."""
    rng = np.random.default_rng(1)
    total = 23
    av = EpochAverages(total)
    av.FOLD_EVERY = 3  # force periodic host folds mid-stream
    host_sums = {}
    host_cm = np.zeros((2, 2))
    for i in range(10):
        bw = float(rng.integers(1, 7))
        m = {
            "NetLoss": jnp.asarray(rng.normal(), jnp.float32),
            "confusion": jnp.asarray(
                rng.integers(0, 1000, size=(2, 2)).astype(np.float32)),
        }
        av.update(m, bw)
        for k, v in m.items():
            if k == "confusion":
                host_cm += np.asarray(v)
            else:
                host_sums[k] = host_sums.get(k, 0.0) + float(v) * bw / total
        if i == 4:
            av.start_read()      # non-blocking pack + copy kick-off
            av.start_read()      # idempotent while pending
    av.start_read()
    for k, v in host_sums.items():
        np.testing.assert_allclose(av[k], v, rtol=1e-6)
    np.testing.assert_array_equal(av.confusion, host_cm.astype(np.int64))

# ---------------------------------------------------------------------------
# DeferredEpochEnd: shared device history buffer


def _mk_metrics(rng, keys=("NetLoss", "l1_loss"), confusion=True):
    m = {k: jnp.asarray(rng.normal(), jnp.float32) for k in keys}
    if confusion:
        m["confusion"] = jnp.asarray(
            rng.integers(0, 1000, size=(2, 2)).astype(np.float32))
    return m


def _run_epoch(rng, av, total, n_batches=4, keys=("NetLoss", "l1_loss")):
    host = {}
    cm = np.zeros((2, 2))
    for _ in range(n_batches):
        bw = float(rng.integers(1, 7))
        m = _mk_metrics(rng, keys)
        av.update(m, bw)
        for k, v in m.items():
            if k == "confusion":
                cm += np.asarray(v)
            else:
                host[k] = host.get(k, 0.0) + float(v) * bw / total
    return host, cm


def test_deferred_epoch_end_batches_and_orders():
    """Totals match the host loop; fns run in schedule order; fns for a
    window run one full window-cycle after it closes (never earlier)."""
    from fcdgan_tpu.train.loops import DeferredEpochEnd

    rng = np.random.default_rng(2)
    total = 19
    deferred = DeferredEpochEnd(enabled=True, depth=3)
    ran = []
    expected = []
    for e in range(8):
        av = EpochAverages(total)
        host, cm = _run_epoch(rng, av, total)
        expected.append((e, host, cm))

        def fn(e=e, av=av, host=host, cm=cm):
            ran.append(e)
            for k, v in host.items():
                np.testing.assert_allclose(av[k], v, rtol=1e-6)
            np.testing.assert_array_equal(av.confusion, cm.astype(np.int64))

        deferred.schedule(av, fn)
        # aged-window rule: after epoch 5 (two closed windows) epochs 0-2 ran
        if e < 5:
            assert ran == []
    assert ran == [0, 1, 2]
    deferred.flush()
    assert ran == list(range(8))
    deferred.flush()  # idempotent
    assert ran == list(range(8))


def test_deferred_epoch_end_early_read_keeps_fn_order():
    """Reading a deferred EpochAverages before flush resolves values but the
    summary closures still run in order at flush."""
    from fcdgan_tpu.train.loops import DeferredEpochEnd

    rng = np.random.default_rng(3)
    total = 11
    deferred = DeferredEpochEnd(enabled=True, depth=10)
    avs, hosts = [], []
    ran = []
    for e in range(4):
        av = EpochAverages(total)
        host, _ = _run_epoch(rng, av, total, n_batches=2)
        avs.append(av)
        hosts.append(host)
        deferred.schedule(av, lambda e=e: ran.append(e))
    # early read of epoch 1 resolves all pending rows, runs no fns
    np.testing.assert_allclose(avs[1]["NetLoss"], hosts[1]["NetLoss"], rtol=1e-6)
    assert ran == []
    deferred.flush()
    assert ran == [0, 1, 2, 3]
    for av, host in zip(avs, hosts):
        np.testing.assert_allclose(av["NetLoss"], host["NetLoss"], rtol=1e-6)


def test_deferred_epoch_end_mixed_row_lengths_and_attach():
    """attach-only rows (RSSS train av) share windows with scheduled rows of
    a different metric-key set; an empty av rides along."""
    from fcdgan_tpu.train.loops import DeferredEpochEnd

    rng = np.random.default_rng(4)
    deferred = DeferredEpochEnd(enabled=True, depth=4)
    train_av = EpochAverages(7)
    t_host, t_cm = _run_epoch(rng, train_av, 7, keys=("g_loss", "d_loss", "s_loss"))
    test_av = EpochAverages(5)
    s_host, s_cm = _run_epoch(rng, test_av, 5, n_batches=2)
    empty_av = EpochAverages(3)
    deferred.attach(train_av)
    deferred.attach(empty_av)
    ran = []
    deferred.schedule(test_av, lambda: ran.append("t"))
    deferred.flush()
    assert ran == ["t"]
    for k, v in t_host.items():
        np.testing.assert_allclose(train_av[k], v, rtol=1e-6)
    np.testing.assert_array_equal(train_av.confusion, t_cm.astype(np.int64))
    np.testing.assert_allclose(test_av["NetLoss"], s_host["NetLoss"], rtol=1e-6)
    assert empty_av.as_dict() == {}


def test_deferred_epoch_end_update_after_attach_raises():
    from fcdgan_tpu.train.loops import DeferredEpochEnd

    rng = np.random.default_rng(5)
    deferred = DeferredEpochEnd(enabled=True, depth=4)
    av = EpochAverages(3)
    av.update(_mk_metrics(rng), 1.0)
    deferred.attach(av)
    try:
        av.update(_mk_metrics(rng), 1.0)
    except RuntimeError:
        pass
    else:
        raise AssertionError("update after attach must raise")


def test_deferred_epoch_end_window_capacity_overflow():
    """Rows bigger than the window capacity roll into a fresh window without
    losing earlier rows."""
    from fcdgan_tpu.train.loops import DeferredEpochEnd

    rng = np.random.default_rng(6)
    deferred = DeferredEpochEnd(enabled=True, depth=1000)
    deferred._cap = 8  # tiny: each (2 scalars + 2x2 confusion) row is 6 floats
    avs, hosts, cms = [], [], []
    for _ in range(5):
        av = EpochAverages(9)
        host, cm = _run_epoch(rng, av, 9, n_batches=2)
        deferred.attach(av)
        avs.append(av)
        hosts.append(host)
        cms.append(cm)
    deferred.flush()
    for av, host, cm in zip(avs, hosts, cms):
        for k, v in host.items():
            np.testing.assert_allclose(av[k], v, rtol=1e-6)
        np.testing.assert_array_equal(av.confusion, cm.astype(np.int64))


def test_deferred_epoch_end_disabled_runs_inline():
    from fcdgan_tpu.train.loops import DeferredEpochEnd

    deferred = DeferredEpochEnd(enabled=False)
    ran = []
    av = EpochAverages(3)
    deferred.schedule(av, lambda: ran.append(1))
    assert ran == [1]
    deferred.attach(av)  # no-op
    av.update({"NetLoss": jnp.float32(1.0)}, 1.0)  # still usable
