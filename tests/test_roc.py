"""ROC/AUC accumulator vs exact rank-based AUC."""

import numpy as np
import pytest

from fcdgan_tpu.eval.roc import RocCurve, roc_histogram_update


def exact_auc(scores, labels):
    """Mann-Whitney U / rank AUC."""
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    # average ranks for ties
    s = scores[order]
    r = np.arange(1, len(s) + 1, dtype=np.float64)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        r[i : j + 1] = r[i : j + 1].mean()
        i = j + 1
    ranks[order] = r
    pos = labels.astype(bool)
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def test_auc_perfect_and_random():
    rc = RocCurve(n_bins=512)
    d = np.concatenate([np.full(100, 0.9), np.full(100, 0.1)])
    g = np.concatenate([np.ones(100), np.zeros(100)])
    rc.add_batch(d, g)
    assert rc.auc() == pytest.approx(1.0, abs=1e-6)

    rc.reset()
    rng = np.random.default_rng(0)
    d = rng.uniform(size=20000)
    g = rng.integers(0, 2, size=20000)
    rc.add_batch(d, g)
    assert rc.auc() == pytest.approx(0.5, abs=0.02)


def test_auc_matches_rank_auc():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 2, size=5000).astype(float)
    d = np.clip(0.3 * g + rng.uniform(size=5000) * 0.7, 0, 1)
    rc = RocCurve(n_bins=2048)
    rc.add_batch(d, g)
    assert rc.auc() == pytest.approx(exact_auc(d, g), abs=5e-3)


def test_on_device_histogram_matches_host():
    rng = np.random.default_rng(2)
    d = rng.uniform(size=(4, 32, 32)).astype(np.float32)
    g = rng.integers(0, 2, size=(4, 32, 32)).astype(np.float32)
    valid = rng.integers(0, 2, size=(4, 32, 32)).astype(np.float32)

    hist = np.asarray(roc_histogram_update(d, g, n_bins=256, valid=valid))
    rc = RocCurve(n_bins=256)
    rc.add_batch(d, g, valid=valid)
    np.testing.assert_allclose(hist, rc.hist, atol=1e-4)

    rc2 = RocCurve(n_bins=256)
    rc2.add_histogram(hist)
    assert rc2.auc() == pytest.approx(rc.auc(), abs=1e-9)


def test_curve_monotone():
    rng = np.random.default_rng(3)
    rc = RocCurve(n_bins=128)
    rc.add_batch(rng.uniform(size=1000), rng.integers(0, 2, size=1000))
    fpr, tpr, thr = rc.curve()
    assert (np.diff(fpr) >= 0).all() and (np.diff(tpr) >= 0).all()
    assert fpr[0] == 0.0 and fpr[-1] == pytest.approx(1.0)
    assert thr[0] == 1.0
