"""Multi-host DP: two real processes, one global 8-device CPU mesh.

Exercises jax.distributed.initialize + make_array_from_process_local_data
end-to-end on the USSS joint step — the code path a multi-host v5e pod uses,
minus the fabric. Compares both processes' results to the single-process
8-virtual-device step on the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_joint_step_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tests", "multihost_worker.py"),
             str(pid), str(port)],
            env=env, cwd=_ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        outs.append(line.split())

    loss0, cm0 = float(outs[0][1]), int(outs[0][2])
    loss1, cm1 = float(outs[1][1]), int(outs[1][2])
    # replicated outputs: both processes observe the same global result
    assert cm0 == cm1
    np.testing.assert_allclose(loss0, loss1, rtol=1e-6)

    # single-process 8-virtual-device oracle on the same global batch
    import jax

    from fcdgan_tpu.models import Generator, Segmentor
    from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
    from fcdgan_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.train.steps import PerceptionConfig, USSSSteps
    import jax.numpy as jnp

    hw, nband, batch = 32, 3, 8
    net_g, net_s = Generator(nband), Segmentor(nband, bilinear=True)
    tx_g, tx_s = adam(), adam()
    interior = np.tile([[hw - 8, hw - 8]], (batch, 1)).astype(np.int32)
    steps = USSSSteps(
        net_g, net_s, tx_g, tx_s, load_vgg16_params(),
        PerceptionConfig(select_feature_layers(1), per_band=True),
        perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
        interior_sizes=interior, pad=(4, 4), msssim_weights=(0.5, 0.5),
    )
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(0)
    zx = jnp.zeros((1, hw, hw, nband), jnp.float32)
    gstate = replicate_state(create_net_state(net_g, key, (zx,), tx_g), mesh)
    sstate = replicate_state(
        create_net_state(net_s, jax.random.fold_in(key, 1), (zx, zx), tx_s), mesh
    )
    rng = np.random.default_rng(0)
    host = dict(
        x=rng.normal(size=(batch, hw, hw, nband)).astype(np.float32),
        y=rng.normal(size=(batch, hw, hw, nband)).astype(np.float32),
        ref=rng.integers(1, 3, size=(batch, hw, hw, 1)).astype(np.float32),
        item=np.arange(batch, dtype=np.int32),
        weight=np.ones(batch, np.float32),
    )
    db = shard_batch(host, mesh)
    _, _, metrics = steps.joint(
        gstate, sstate, db["x"], db["y"], db["ref"], db["item"], db["weight"],
        1e-4, 1e-4,
    )
    np.testing.assert_allclose(loss0, float(metrics["NetLoss"]), rtol=1e-5)
    assert cm0 == int(np.asarray(metrics["confusion"]).sum())


def test_two_process_usss_driver_end_to_end(tmp_path):
    """Full USSS driver across two processes: both produce complete,
    identical artifacts; density matches the single-process 8-device run."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tests", "multihost_worker.py"),
             str(pid), str(port), str(tmp_path)],
            env=env, cwd=_ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"driver worker failed:\n{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, f1, density_path = line.split(maxsplit=2)
        results.append((float(f1), density_path))

    from fcdgan_tpu.data.tiff import TiffReader

    d0 = TiffReader(results[0][1]).read_block()
    d1 = TiffReader(results[1][1]).read_block()
    np.testing.assert_array_equal(d0, d1)  # same global program, same output
    assert results[0][0] == results[1][0]

    # single-process oracle: same scene, same 8-device mesh in one process
    from fcdgan_tpu.config import USSSConfig
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.demos.demo_usss import run

    d = str(tmp_path / "single")
    os.makedirs(d, exist_ok=True)
    make_usss_scene(d, 96, 96, 3, seed=7)
    out = run(USSSConfig(
        dir=d, platform="cpu", batch_size=4, patch_size=(48, 48),
        overlap_padding=(4, 4), init_num_epochs_g=1, init_num_epochs_s=1,
        num_epochs=1, msssim_weights=(0.5, 0.5), log_tensorboard=False,
        progress=False, ext="_mh", n_devices=8,
    ))
    ds = TiffReader(out["density_path"]).read_block()
    # same math; only collective reduction order may differ across the
    # process topology
    np.testing.assert_allclose(ds, d0, atol=2e-5)
    np.testing.assert_allclose(out["evaluator"].Pixel_F1_score(),
                               results[0][0], atol=1e-6)


def test_two_process_rsss_driver_end_to_end(tmp_path):
    """Full RSSS driver across two processes: multi-scene stitched writers,
    per-epoch test eval, and checkpoint saves through the collective orbax
    path (the regression surface of the process-0-gated-save bug)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tests", "multihost_worker.py"),
             str(pid), str(port), str(tmp_path), "rsss"],
            env=env, cwd=_ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rsss worker failed:\n{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, f1, density_path = line.split(maxsplit=2)
        results.append((float(f1), density_path))

    from fcdgan_tpu.data.tiff import TiffReader

    d0 = TiffReader(results[0][1]).read_block()
    d1 = TiffReader(results[1][1]).read_block()
    np.testing.assert_array_equal(d0, d1)
    assert results[0][0] == results[1][0]
    assert np.isfinite(results[0][0])


def test_two_process_wsss_driver_end_to_end(tmp_path):
    """Full WSSS driver across two processes: pair batches, adversarial
    steps, PNG eval maps via the allgather download, identical metrics."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tests", "multihost_worker.py"),
             str(pid), str(port), str(tmp_path), "wsss"],
            env=env, cwd=_ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"wsss worker failed:\n{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, f1, n_maps = line.split()
        results.append((float(f1), int(n_maps)))

    # every changed sample got an eval map on BOTH processes, same metrics
    assert results[0][1] == results[1][1] == 4
    assert results[0][0] == results[1][0]
    assert np.isfinite(results[0][0])
