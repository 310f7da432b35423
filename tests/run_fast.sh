#!/bin/bash
# The FAST tier (<10 s): pure-math + host-runtime tests, no model compiles.
# This is the subset that gates every commit; the deeper tiers are
#   pytest tests/ -m "not slow"    (~8 min: adds model/loss/step compiles)
#   pytest tests/                  (full: e2e drivers, torch goldens, multihost)
#   FCDGAN_TEST_TPU=1 pytest tests/ -m tpu   (on-device kernel assertions)
cd "$(dirname "$0")/.."
exec python -m pytest $(grep -v '^#' tests/fast.txt) -m "not slow" -q "$@"
