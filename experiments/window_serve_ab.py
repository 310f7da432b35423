"""In-process A/B of the round-5 rolling-window serving paths.

Cross-process relay drift makes absolute Mpx/s unreliable evidence (round-4
uint8 medians shifted 4.09 -> 5.60 between processes), so this runs BOTH
window variants and the fused whole-scene cache ceiling interleaved in ONE
process on the same forced-gate scene:

  fallback - per-slab slab-canvas downloads on the writer thread (round-4
             shipped path, FCDGAN_SERVE_CANVAS_MAX_MB=0 forces it)
  canvas   - round-5 device-resident output canvas, one download
  fused    - whole-scene DeviceSceneCache.stitched_density (the ceiling;
             constructed directly, ignoring the gate)

Usage: FCDGAN_SCENE_CACHE_MAX_MB=80 python experiments/window_serve_ab.py
(defaults pin the round-4 infer_2048_window_gate80 geometry: f32 scene,
2048px, 2-tile-row slabs).
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
    from fcdgan_tpu.data.device_cache import (DeviceSceneCache,
                                              DeviceSceneWindowCache)
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.models import Segmentor
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.utils.runtime import enable_compile_cache, wait_for_backend

    enable_compile_cache()
    wait_for_backend()
    scene_px = int(os.environ.get("SCENE_PX", "2048"))
    density_dtype = os.environ.get("DD", "uint8")
    reps = int(os.environ.get("REPS", "3"))

    model = Segmentor(3, bilinear=True, dtype=jnp.bfloat16)
    zx = jnp.zeros((1, 220, 220, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    td = tempfile.mkdtemp()
    paths = make_usss_scene(td, scene_px, scene_px, 3, dtype="float32")
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))
    assert not DeviceSceneCache.fits(ds), "gate did not force windows"
    assert DeviceSceneWindowCache.supports(ds)
    px_count = scene_px * scene_px

    full = DeviceSceneCache(ds, None)  # ceiling: ignore the gate on purpose

    def run_fused():
        return full.stitched_density(infer, sstate, batch_size=10,
                                     density_dtype=density_dtype)

    def run_window(variant):
        if variant == "fallback":
            os.environ["FCDGAN_SERVE_CANVAS_MAX_MB"] = "0.000001"
        else:
            os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)
        cache = DeviceSceneWindowCache(ds, None)
        try:
            return cache.stitched_density(infer, sstate, batch_size=10,
                                          density_dtype=density_dtype)
        finally:
            cache._pool.shutdown(wait=True)
            os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)

    # warm all three (compile) + capture outputs for the exactness check
    want = run_fused()
    outs = {}
    for v in ("fallback", "canvas"):
        outs[v] = run_window(v)
        exact = np.array_equal(outs[v], want)
        print(json.dumps({"check": v, "bit_exact_vs_fused": bool(exact)}),
              flush=True)

    results = {"fused": [], "fallback": [], "canvas": []}
    for rep in range(reps):
        for v in ("fallback", "canvas", "fused"):
            t0 = time.perf_counter()
            if v == "fused":
                run_fused()
            else:
                run_window(v)
            dt = time.perf_counter() - t0
            results[v].append(px_count / dt / 1e6)
            print(json.dumps({"variant": v, "rep": rep,
                              "mpx_per_s": round(px_count / dt / 1e6, 3),
                              "wall_s": round(dt, 3),
                              "t": round(time.time(), 3)}), flush=True)

    summary = {v: {"median": round(float(np.median(r)), 3),
                   "min": round(min(r), 3), "max": round(max(r), 3)}
               for v, r in results.items()}
    summary["canvas_over_fused"] = round(
        summary["canvas"]["median"] / summary["fused"]["median"], 3)
    summary["canvas_over_fallback"] = round(
        summary["canvas"]["median"] / summary["fallback"]["median"], 3)
    print(json.dumps({"summary": summary, "scene_px": scene_px,
                      "density_dtype": density_dtype}), flush=True)


if __name__ == "__main__":
    main()
