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


def apply_platform(platform: str | None) -> None:
    """Force the JAX platform if requested (the axon sitecustomize pins
    JAX_PLATFORMS at interpreter startup, so the env var alone is ignored;
    config.update after import is the reliable override)."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
