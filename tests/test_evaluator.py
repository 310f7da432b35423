"""Evaluator metrics vs hand-computed confusion matrices (metrics.py parity)."""

import numpy as np
import pytest

from fcdgan_tpu.eval.evaluator import Evaluator, confusion_update


def test_add_batch_and_metrics():
    ev = Evaluator(num_class=2)
    gt = np.array([[0, 0, 1, 1], [1, 0, 1, 0]])
    pr = np.array([[0, 1, 1, 0], [1, 0, 1, 1]])
    ev.add_batch(gt, pr)
    # hand count: tn=2 fp=2 fn=1 tp=3
    np.testing.assert_array_equal(ev.confusion_matrix, [[2, 2], [1, 3]])
    assert ev.Pixel_Accuracy() == pytest.approx(5 / 8)
    assert ev.Pixel_Precision_Rate() == pytest.approx(3 / 5)
    assert ev.Pixel_Recall_Rate() == pytest.approx(3 / 4)
    f1 = 2 * (3 / 5) * (3 / 4) / ((3 / 5) + (3 / 4))
    assert ev.Pixel_F1_score() == pytest.approx(f1)
    po = 5 / 8
    pe = (4 * 3 + 4 * 5) / 64
    assert ev.Pixel_Kappa() == pytest.approx((po - pe) / (1 - pe))
    miou, ciou = ev.Mean_Intersection_over_Union()
    assert ciou == pytest.approx(3 / 6)
    assert miou == pytest.approx((2 / 5 + 3 / 6) / 2)


def test_add_batch_map_value_indirection():
    # USSS/RSSS coding: gt in {1,2}, pred in {0,1} (Demo_USSS.py:64-65)
    ev = Evaluator(num_class=2)
    gt = np.array([1, 1, 2, 2, 2])
    pr = np.array([0, 1, 1, 1, 0])
    ev.add_batch_map(gt, pr, gt_map=[1, 2], pre_map=[0, 1])
    np.testing.assert_array_equal(ev.confusion_matrix, [[1, 1], [1, 2]])


def test_generate_matrix_ignores_out_of_range_gt():
    ev = Evaluator(num_class=2)
    gt = np.array([0, 1, 255, -1])  # 255/-1 are nodata -> dropped
    pr = np.array([0, 1, 1, 0])
    ev.add_batch(gt, pr)
    np.testing.assert_array_equal(ev.confusion_matrix, [[1, 0], [0, 1]])


def test_confusion_update_matches_host():
    rng = np.random.default_rng(1)
    gt = rng.integers(1, 3, size=(4, 32, 32))  # coded {1,2}
    pr = rng.integers(0, 2, size=(4, 32, 32))  # coded {0,1}
    valid = rng.integers(0, 2, size=(4, 32, 32))

    ev = Evaluator(num_class=2)
    for b in range(4):
        g = gt[b][valid[b] == 1]
        p = pr[b][valid[b] == 1]
        ev.add_batch_map(g, p, gt_map=[1, 2], pre_map=[0, 1])

    cm = confusion_update(
        gt.astype(np.float32), pr.astype(np.float32), gt_map=[1, 2], pre_map=[0, 1],
        valid=valid.astype(np.float32),
    )
    np.testing.assert_allclose(np.asarray(cm), ev.confusion_matrix, rtol=0, atol=0)


def test_confusion_update_psum_over_mesh():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 8, "conftest must expose 8 virtual devices"
    mesh = Mesh(np.array(devs), ("data",))

    gt = np.tile(np.array([1, 2, 2, 1], np.float32), (8, 1))
    pr = np.tile(np.array([1, 1, 0, 0], np.float32), (8, 1))

    def step(g, p):
        return confusion_update(g, p, gt_map=[1, 2], pre_map=[0, 1], axis_name="data")

    out = jax.jit(
        jax.shard_map(step, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()),
    )(gt, pr)
    # per-shard cm = [[1,1],[1,1]], psum over 8 shards
    np.testing.assert_array_equal(np.asarray(out), 8 * np.array([[1, 1], [1, 1]]))
