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
