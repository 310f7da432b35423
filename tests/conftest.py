"""Test harness: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding logic (shard_map/psum data parallelism, confusion-matrix
reductions) is CI-testable without a TPU by forcing the host platform to
expose 8 fake devices (SURVEY.md section 4 "Multi-chip without a cluster").
Must run before jax is imported anywhere.

Two extra tiers on top of the hermetic default:

- ``FCDGAN_TEST_TPU=1 pytest tests/ -m tpu`` leaves the platform alone so
  the ``@pytest.mark.tpu`` on-device kernel assertions run against the real
  chip (they self-skip when the backend is not TPU).
- ``pytest tests/ -m "not slow"`` is the quick tier (< ~5 min on CPU): the
  full-model adversarial steps, e2e drivers, and torch-golden suites carry
  ``slow``.
"""

import os
import sys

_WANT_TPU = os.environ.get("FCDGAN_TEST_TPU", "") == "1"

if not _WANT_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments import jax from sitecustomize before this file runs,
# freezing JAX_PLATFORMS at interpreter startup; override via jax.config,
# which works any time before backend initialization.
import jax  # noqa: E402

if not _WANT_TPU:
    jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import fcdgan_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
