"""Root-cause the rolling-window SERVING gap (ROADMAP round 4).

ab_round4.jsonl ``infer_2048_window_gate80`` measured 0.21-0.24 Mpx/s uint8
through DeviceSceneWindowCache.stitched_density — slower than the plain
streaming fallback (0.30-0.60) and ~20x under the whole-scene fused path,
while the TRAINING window feed reaches 91% of the cache rate on the same
slabs. This script re-runs that exact point with per-slab phase timers
(upload wait / dispatch / async-copy call / download resolve) and A/Bs the
candidate fixes in-place:

  shipped   - the loop as shipped (copy_to_host_async right after dispatch)
  noasync   - same loop, skip the explicit copy_to_host_async (round-2
              run_overlapped finding: an early async copy on the relay
              serializes against the dispatch channel)
  batchdl   - dispatch every slab first, resolve all downloads at the end
              (downloads batched behind the full compute queue)

Usage (forces the past-the-gate regime on a 2048px scene):

  FCDGAN_SCENE_CACHE_MAX_MB=80 python experiments/window_serve_profile.py
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
    from fcdgan_tpu.data.device_cache import DeviceSceneWindowCache, _scene_jits
    from fcdgan_tpu.data import device_cache as dc
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.models import Segmentor
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.utils.runtime import wait_for_backend

    wait_for_backend()
    scene_px = int(os.environ.get("SCENE_PX", "2048"))
    density_dtype = os.environ.get("DD", "uint8")

    model = Segmentor(3, bilinear=True, dtype=jnp.bfloat16)
    zx = jnp.zeros((1, 220, 220, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    td = tempfile.mkdtemp()
    paths = make_usss_scene(td, scene_px, scene_px, 3)
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))
    assert DeviceSceneWindowCache.supports(ds), "gate did not force windows"

    def run(variant, cache):
        """stitched_density inlined with phase timers."""
        _scene_jits()
        run_win = dc._WINDOW_RUN
        grid = cache._grid
        ph, pw, padx, pady, wp = cache._geom
        sy_, sx_ = ph - 2 * pady, pw - 2 * padx
        hs, ws = cache._scene_hw
        ys = grid.ystarts
        out_h = (cache._rows_per_slab - 1) * cache._stride + sy_
        out_w = wp - 2 * padx
        geom = (ph, pw, padx, pady, sy_, sx_, out_h, out_w)
        bs = min(10, max(cache.slab_sizes))
        max_chunks = max(-(-n // bs) for n in cache.slab_sizes)
        host_dt = np.uint8 if density_dtype == "uint8" else np.float32
        out = np.zeros((hs, ws), host_dt)
        phases = {"advance": [], "dispatch": [], "async": [], "resolve": []}

        def resolve(p):
            dev, y0, rows = p
            t = time.perf_counter()
            host = np.asarray(dev)
            phases["resolve"].append(time.perf_counter() - t)
            out[y0:y0 + rows] = host[:rows, :ws]

        t_all = time.perf_counter()
        pending = []
        for k in range(cache.n_slabs):
            cache._ensure(k)
            if k + 1 < cache.n_slabs:
                cache._ensure(k + 1)
            t = time.perf_counter()
            cache._advance_to(k)
            phases["advance"].append(time.perf_counter() - t)
            px, py, pref, row0 = cache._resident[k]
            items = cache.slab_items(k)
            idxs = np.resize(items.astype(np.int32), max_chunks * bs)
            idxs = idxs.reshape(max_chunks, bs)
            t = time.perf_counter()
            dev = run_win(infer, geom, density_dtype, jnp.asarray(idxs),
                          px, py, pref, cache._origins, cache._wins,
                          cache._norm, sstate, jnp.int32(int(row0)))
            phases["dispatch"].append(time.perf_counter() - t)
            if variant == "shipped":
                t = time.perf_counter()
                try:
                    dev.copy_to_host_async()
                except AttributeError:
                    pass
                phases["async"].append(time.perf_counter() - t)
            y0 = ys[cache._slab_r0[k]]
            pending.append((dev, y0, min(out_h, hs - y0)))
            if variant in ("shipped", "noasync") and len(pending) > 1:
                resolve(pending.pop(0))
        for p in pending:
            resolve(p)
        wall = time.perf_counter() - t_all
        px_count = hs * ws
        return {
            "variant": variant, "wall_s": round(wall, 3),
            "mpx_per_s": round(px_count / wall / 1e6, 3),
            "n_slabs": cache.n_slabs,
            "phase_ms": {k: [round(v * 1e3, 1) for v in vs]
                         for k, vs in phases.items()},
        }

    results = []
    for variant in ("shipped", "noasync", "batchdl"):
        for rep in range(2):
            cache = DeviceSceneWindowCache(ds, None)
            r = run(variant, cache)
            r["rep"] = rep
            results.append(r)
            print(json.dumps(r), flush=True)
            cache._pool.shutdown(wait=True)


if __name__ == "__main__":
    main()
