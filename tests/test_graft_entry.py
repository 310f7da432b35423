"""Driver contract: entry() compiles, dryrun_multichip runs on 8 fake devices."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 128, 128, 1)


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8, modes=("usss",))


import pytest


@pytest.mark.slow
def test_dryrun_multichip_adversarial_modes():
    """The WSSS/RSSS sharded adversarial steps (D/S alternation, frozen-G,
    synthesized unchanged pair) compile + execute on the virtual mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8, modes=("wsss", "rsss"))


def test_dryrun_multichip_serve():
    """The serving leg: sharded fused stitched density + window-cache epoch
    bit-equal to the single-device raster (VERDICT r4 task 6)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8, modes=("serve",))
