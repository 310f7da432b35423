"""Periodic checkpointing + resume (TrainCheckpointer)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcdgan_tpu.io.checkpoint import TrainCheckpointer
from fcdgan_tpu.models import Generator
from fcdgan_tpu.train.optim import adam
from fcdgan_tpu.train.state import create_net_state


@pytest.fixture(scope="module")
def gstate():
    g = Generator(3)
    return create_net_state(g, jax.random.PRNGKey(0), (jnp.zeros((1, 16, 16, 3)),), adam())


def test_cadence(tmp_path, gstate):
    ck = TrainCheckpointer(str(tmp_path / "r.ckpt"), every=3)
    assert not ck.maybe_save("g", 0, netG=gstate)
    assert not ck.maybe_save("g", 1, netG=gstate)
    assert ck.maybe_save("g", 2, netG=gstate)  # (2+1) % 3 == 0
    assert ck.exists()
    _, meta = ck.restore({"netG": gstate})
    assert meta == {"phase": "g", "epoch": 2}


def test_disabled_never_saves(tmp_path, gstate):
    ck = TrainCheckpointer(str(tmp_path / "r2.ckpt"), every=0)
    assert not ck.enabled
    assert not ck.maybe_save("g", 0, netG=gstate)
    assert not ck.exists()


def test_restore_round_trip(tmp_path, gstate):
    ck = TrainCheckpointer(str(tmp_path / "r3.ckpt"), every=1)
    ck.maybe_save("joint", 7, netG=gstate)
    fresh = create_net_state(Generator(3), jax.random.PRNGKey(9),
                             (jnp.zeros((1, 16, 16, 3)),), adam())
    states, meta = ck.restore({"netG": fresh})
    for a, b in zip(jax.tree.leaves(states["netG"].params), jax.tree.leaves(gstate.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["epoch"] == 7


def test_start_epochs_phase_logic():
    order = ("g", "s", "joint")
    assert TrainCheckpointer.start_epochs(None, order) == {"g": 0, "s": 0, "joint": 0}
    s = TrainCheckpointer.start_epochs({"phase": "g", "epoch": 4}, order)
    assert s == {"g": 5, "s": 0, "joint": 0}
    s = TrainCheckpointer.start_epochs({"phase": "s", "epoch": 0}, order)
    assert s["g"] >= 10**8 and s["s"] == 1 and s["joint"] == 0
    s = TrainCheckpointer.start_epochs({"phase": "joint", "epoch": 9}, order)
    assert s["g"] >= 10**8 and s["s"] >= 10**8 and s["joint"] == 10


@pytest.mark.slow
def test_usss_driver_resume_skips_completed_epochs(tmp_path, capsys):
    """Run the driver with checkpoints, then resume: completed phases skip."""
    from fcdgan_tpu.config import USSSConfig
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.demos import demo_usss

    d = str(tmp_path / "scene")
    make_usss_scene(d, 64, 64, 3)
    cfg = USSSConfig(dir=d, init_num_epochs_g=1, init_num_epochs_s=1, num_epochs=1,
                     batch_size=4, patch_size=(40, 40), overlap_padding=(4, 4),
                     msssim_weights=(0.5, 0.5), log_tensorboard=False,
                     progress=False, ext="_r", checkpoint_every=1)
    demo_usss.run(cfg)
    capsys.readouterr()

    cfg.resume = True
    demo_usss.run(cfg)
    out = capsys.readouterr().out
    assert "Resuming from phase joint epoch 0" in out
    # all training epochs skipped: no per-epoch loss lines on the resume run
    assert "NetLoss Loss" not in out
    # inference + artifacts still produced
    assert "End of Saving" in out
