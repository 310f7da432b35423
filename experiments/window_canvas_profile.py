"""Phase-level profile of the round-5 resident-canvas window serving path.

The in-process A/B (window_serve_ab.py) measured canvas 0.35 / fallback 0.80
/ fused 4.2 Mpx/s on the forced-gate 2048 f32 scene — the canvas path is
slower than the per-slab-download fallback it was meant to beat, and both
are ~5x under fused despite uploads measuring 1.5 GB/s (upload_probe.py).
This inlines the canvas loop with per-slab timers and A/Bs three variants:

  gated   - shipped: slab k+1 load gated on slab k-1's probe (worker thread)
  free    - plain _ensure prefetch, no probes at all
  serial  - no prefetch: load+upload slab k inline, then dispatch

Usage: FCDGAN_SCENE_CACHE_MAX_MB=80 python experiments/window_canvas_profile.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FCDGAN_SCENE_CACHE_MAX_MB", "80")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.data.datasets import ScenePairDataset
    from fcdgan_tpu.data import device_cache as dc
    from fcdgan_tpu.data.device_cache import (DeviceSceneCache,
                                              DeviceSceneWindowCache,
                                              _scene_jits)
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.models import Segmentor
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.utils.runtime import enable_compile_cache, wait_for_backend

    enable_compile_cache()
    wait_for_backend()
    scene_px = int(os.environ.get("SCENE_PX", "2048"))
    density_dtype = os.environ.get("DD", "uint8")

    model = Segmentor(3, bilinear=True, dtype=jnp.bfloat16)
    zx = jnp.zeros((1, 220, 220, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    td = tempfile.mkdtemp()
    paths = make_usss_scene(td, scene_px, scene_px, 3, dtype="float32")
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))
    assert DeviceSceneWindowCache.supports(ds)
    px_count = scene_px * scene_px

    def run(variant):
        cache = DeviceSceneWindowCache(ds, None)
        _scene_jits()
        run_acc = dc._ACC_RUN
        grid = cache._grid
        ph, pw, padx, pady, wp = cache._geom
        sy_, sx_ = ph - 2 * pady, pw - 2 * padx
        hs, ws = cache._scene_hw
        hp2, wp2 = grid.padded_shape()
        geom = (ph, pw, padx, pady, sy_, sx_)
        cdt = {"uint8": jnp.uint8, "bfloat16": jnp.bfloat16}.get(
            density_dtype, jnp.float32)
        bs = min(10, max(cache.slab_sizes))
        max_chunks = max(-(-n // bs) for n in cache.slab_sizes)

        def gated_load(k, barrier):
            if barrier is not None:
                np.asarray(barrier)
            return cache._load_slab(k)

        t_all = time.perf_counter()
        canvas = jnp.zeros((hp2 - 2 * pady, wp2 - 2 * padx, 1), cdt)
        probes = {}
        timers = {"advance": [], "dispatch": []}
        if variant != "serial":
            cache._ensure(0)
        for k in range(cache.n_slabs):
            t = time.perf_counter()
            if variant == "serial":
                cache._resident[k] = cache._load_slab(k)
                cache._current = k
                for other in [s for s in cache._resident if s != k]:
                    del cache._resident[other]
            else:
                cache._advance_to(k)
            timers["advance"].append(time.perf_counter() - t)
            px, py, pref, row0 = cache._resident[k]
            items = cache.slab_items(k)
            idxs = np.resize(items.astype(np.int32), max_chunks * bs)
            idxs = idxs.reshape(max_chunks, bs)
            t = time.perf_counter()
            canvas, probe = run_acc(infer, geom, density_dtype,
                                    jnp.asarray(idxs), px, py, pref,
                                    cache._origins, cache._wins, cache._norm,
                                    canvas, sstate, jnp.int32(int(row0)))
            timers["dispatch"].append(time.perf_counter() - t)
            probes[k] = probe
            if variant == "gated" and k + 1 < cache.n_slabs:
                with cache._lock:
                    if k + 1 not in cache._futures:
                        cache._futures[k + 1] = cache._pool.submit(
                            gated_load, k + 1, probes.get(k - 1))
            elif variant == "free" and k + 1 < cache.n_slabs:
                cache._ensure(k + 1)
        t = time.perf_counter()
        host = np.asarray(canvas)
        t_dl = time.perf_counter() - t
        wall = time.perf_counter() - t_all
        cache._pool.shutdown(wait=True)
        del host
        return {
            "variant": variant, "wall_s": round(wall, 3),
            "mpx_per_s": round(px_count / wall / 1e6, 3),
            "n_slabs": cache.n_slabs,
            "final_download_s": round(t_dl, 3),
            "advance_ms": [round(v * 1e3, 1) for v in timers["advance"]],
            "dispatch_ms": [round(v * 1e3, 1) for v in timers["dispatch"]],
        }

    for variant in ("serial", "free", "gated"):
        for rep in range(2):
            r = run(variant)
            r["rep"] = rep
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
