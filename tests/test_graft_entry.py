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

    ge.dryrun_multichip(8)
