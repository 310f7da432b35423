"""Process-level JAX runtime setup shared by drivers, bench, and tools.

The reference's CUDA kernels are precompiled; under XLA every new process
pays a full trace+compile of each jitted program (minutes per program
through a remote TPU backend). The persistent compilation cache brings
repeat launches of the same driver/config down to seconds — production
behavior a reference user would expect from a framework, not an optional
dev nicety.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    Directory resolution: explicit arg > ``$FCDGAN_JAX_CACHE_DIR`` >
    ``~/.cache/fcdgan_tpu/jax``. Disable with ``FCDGAN_NO_COMPILE_CACHE=1``.
    Returns the cache directory in use, or None when disabled.
    """
    if os.environ.get("FCDGAN_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    path = (cache_dir or os.environ.get("FCDGAN_JAX_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "fcdgan_tpu", "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every executable: the big train steps are worth minutes each,
    # and even the small eval programs cost seconds through a remote backend
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path


def wait_for_backend(max_wait_s: float = 5400.0,
                     probe_timeout_s: float = 120.0,
                     interval_s: float = 30.0) -> bool:
    """Block until the JAX default backend initializes; True when ready.

    The remote TPU relay can be transiently unavailable (init raises
    UNAVAILABLE or hangs); a failed in-process init is cached by jax, so the
    probe runs in a SUBPROCESS and the real in-process init only happens
    after a probe succeeds. Gives up after ``max_wait_s`` (returns False and
    lets the caller's real init surface the error). No-op overhead on a
    healthy backend: one ~2 s subprocess.

    Disable with FCDGAN_NO_BACKEND_WAIT=1.
    """
    if os.environ.get("FCDGAN_NO_BACKEND_WAIT") == "1":
        return True
    # the round-end bench run is one-shot: a multi-hour relay outage has been
    # observed (ROADMAP.md round 2), so default to waiting it out; override
    # with FCDGAN_BACKEND_WAIT_S for interactive use
    env_wait = os.environ.get("FCDGAN_BACKEND_WAIT_S")
    if env_wait:
        max_wait_s = float(env_wait)
    import subprocess
    import sys
    import time

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                return True
            reason = (r.stderr.strip().splitlines() or ["?"])[-1][-200:]
        except subprocess.TimeoutExpired:
            reason = f"probe hung > {probe_timeout_s:.0f}s"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"wait_for_backend: giving up after {attempt} probes "
                  f"({reason})", file=sys.stderr, flush=True)
            return False
        print(f"wait_for_backend: backend not ready (attempt {attempt}: "
              f"{reason}); retrying, {remaining:.0f}s left",
              file=sys.stderr, flush=True)
        time.sleep(min(interval_s, max(remaining, 0)))


def apply_platform(platform: str | None) -> None:
    """Force the JAX platform if requested (the axon sitecustomize pins
    JAX_PLATFORMS at interpreter startup, so the env var alone is ignored;
    config.update after import is the reliable override)."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
