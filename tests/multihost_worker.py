"""Two-process multi-host worker: one DP joint step over a global CPU mesh.

Launched by tests/test_multihost.py as
``python tests/multihost_worker.py <process_id> <coordinator_port>``.
Each process owns 4 virtual CPU devices; the global mesh is 8. Prints one
line ``RESULT <NetLoss> <confusion-sum>`` the parent compares across
processes and against the single-process 8-device result.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins the TPU relay

import numpy as np


def main(pid: int, port: int) -> None:
    from fcdgan_tpu.parallel.multihost import (
        initialize_multihost,
        process_slice,
        shard_batch_multihost,
    )

    assert initialize_multihost(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    import jax.numpy as jnp

    from fcdgan_tpu.models import Generator, Segmentor
    from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
    from fcdgan_tpu.parallel.mesh import make_mesh, replicate_state
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.train.steps import PerceptionConfig, USSSSteps

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

    rng = np.random.default_rng(0)  # same seed: both processes hold the
    host = dict(                    # same GLOBAL batch, then slice locally
        x=rng.normal(size=(batch, hw, hw, nband)).astype(np.float32),
        y=rng.normal(size=(batch, hw, hw, nband)).astype(np.float32),
        ref=rng.integers(1, 3, size=(batch, hw, hw, 1)).astype(np.float32),
        item=np.arange(batch, dtype=np.int32),
        weight=np.ones(batch, np.float32),
    )
    sl = process_slice(batch)
    local = {k: np.asarray(v)[sl] for k, v in host.items()}
    db = shard_batch_multihost(local, mesh)

    gstate, sstate, metrics = steps.joint(
        gstate, sstate, db["x"], db["y"], db["ref"], db["item"], db["weight"],
        1e-4, 1e-4,
    )
    loss = float(metrics["NetLoss"])
    cm = np.asarray(metrics["confusion"])
    assert np.isfinite(loss) and np.isfinite(cm).all()
    print(f"RESULT {loss:.8f} {int(cm.sum())}", flush=True)


def main_driver(pid: int, port: int, work_dir: str) -> None:
    """Full USSS driver, two processes, 8 global devices; artifacts land in
    this process's own directory (each host owns complete artifacts)."""
    from fcdgan_tpu.config import USSSConfig
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.demos.demo_usss import run

    d = os.path.join(work_dir, f"p{pid}")
    os.makedirs(d, exist_ok=True)
    make_usss_scene(d, 96, 96, 3, seed=7)
    cfg = USSSConfig(
        dir=d, platform="cpu", batch_size=4, patch_size=(48, 48),
        overlap_padding=(4, 4), init_num_epochs_g=1, init_num_epochs_s=1,
        num_epochs=1, msssim_weights=(0.5, 0.5), log_tensorboard=False,
        progress=False, ext="_mh",
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    out = run(cfg)
    f1 = out["evaluator"].Pixel_F1_score()
    print(f"RESULT {f1:.8f} {out['density_path']}", flush=True)


def main_driver_wsss(pid: int, port: int, work_dir: str) -> None:
    """Full WSSS driver two-process: pair batches, PNG writers, train-mode
    BN final inference with the allgather download path."""
    from fcdgan_tpu.config import WSSSConfig
    from fcdgan_tpu.data.synthetic import make_whu_dataset
    from fcdgan_tpu.demos.demo_wsss import run

    d = os.path.join(work_dir, f"p{pid}")
    os.makedirs(d, exist_ok=True)
    paths = make_whu_dataset(d, n_changed=4, n_unchanged=6, size=48, seed=3)
    cfg = WSSSConfig(
        img_dir_x=paths["before"], img_dir_y=paths["after"],
        ref_dir=paths["Label"], label_dir=paths["root"],
        out_g_model_dir=os.path.join(d, "GModel"),
        init_num_epochs_g=1, num_epochs=1, batch_size=3, unc_batch_size=4,
        msssim_weights=(0.5, 0.5), log_tensorboard=False, progress=False,
        save_checkpoints=False,  # saves covered by the USSS/RSSS workers
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    out = run(cfg)
    import glob

    n_maps = len(glob.glob(os.path.join(out["out_dir"], "*.tif")))
    f1 = out["evaluator"].Pixel_F1_score()
    print(f"RESULT {f1:.8f} {n_maps}", flush=True)


def main_driver_rsss(pid: int, port: int, work_dir: str) -> None:
    """Full RSSS driver two-process: multi-scene OSCD dataset, region-masked
    G pretrain, adversarial steps, per-epoch test eval, per-(filter, scene)
    stitched writers through the allgather download path, checkpoint saves
    through the collective orbax path."""
    from fcdgan_tpu.config import RSSSConfig
    from fcdgan_tpu.data.synthetic import make_oscd_dataset
    from fcdgan_tpu.demos.demo_rsss import run

    d = os.path.join(work_dir, f"p{pid}", "oscd")
    os.makedirs(d, exist_ok=True)
    make_oscd_dataset(d, train_scenes=("alpha",), test_scenes=("gamma",),
                      xsize=64, ysize=64, seed=11)
    cfg = RSSSConfig(
        img_dir=d, out_g_model_dir=os.path.join(d, "GModel"),
        init_num_epochs_g=1, num_epochs=1, init_batch_size=4, batch_size=3,
        patch_size=(40, 40), overlap_padding=(4, 4),
        msssim_weights=(0.5, 0.5), log_tensorboard=False, progress=False,
        ext="_mh",
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    out = run(cfg)
    f1 = out["evaluator"].Pixel_F1_score()
    density = os.path.join(d, "gamma", "ImagePair", "density_mh")
    print(f"RESULT {f1:.8f} {density}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "wsss":
        main_driver_wsss(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 4 and sys.argv[4] == "rsss":
        main_driver_rsss(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 3:
        main_driver(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    else:
        main(int(sys.argv[1]), int(sys.argv[2]))
