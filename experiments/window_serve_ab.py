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
    scene_dt = os.environ.get("SCENE_DT", "float32")
    density_dtype = os.environ.get("DD", "uint8")
    reps = int(os.environ.get("REPS", "3"))

    model = Segmentor(3, bilinear=True, dtype=jnp.bfloat16)
    zx = jnp.zeros((1, 220, 220, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    td = tempfile.mkdtemp()
    paths = make_usss_scene(td, scene_px, scene_px, 3, dtype=scene_dt)
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))
    assert not DeviceSceneCache.fits(ds), "gate did not force windows"
    assert DeviceSceneWindowCache.supports(ds)
    px_count = scene_px * scene_px
    print(json.dumps({"scene_dt": scene_dt, "scene_px": scene_px,
                      "rows_per_slab": DeviceSceneWindowCache._plan_rows(ds),
                      "serve_mode": os.environ.get("FCDGAN_SERVE_MODE",
                                                   "auto")}), flush=True)

    full = DeviceSceneCache(ds, None)  # ceiling: ignore the gate on purpose

    # in-process TRUE link bandwidth (consuming jit + value fetch — the
    # only sound upload barrier on the relay, true_bandwidth_probe.py):
    # fresh-scene window serving is H2D-bound, so every variant is also
    # quoted as a fraction of its own link bound
    force1 = jax.jit(lambda a: a.reshape(-1)[0].astype(jnp.float32) + 1)
    rng = np.random.default_rng(1)
    probe_arr = rng.normal(size=int(21e6 / 4)).astype(np.float32)
    float(np.asarray(force1(jax.device_put(np.zeros(8, np.float32)))))
    t0 = time.perf_counter()
    d = jax.device_put(probe_arr)
    float(np.asarray(force1(d)))
    link_mb_s = 21.0 / (time.perf_counter() - t0)
    del d
    print(json.dumps({"link_mb_per_s": round(link_mb_s, 1)}), flush=True)

    win_probe = DeviceSceneWindowCache(ds, None)
    slab_bytes = (win_probe._bytes_per_row(ds) * win_probe._slab_h
                  * win_probe.n_slabs)
    win_probe._pool.shutdown(wait=True)

    def run_fused():
        return full.stitched_density(infer, sstate, batch_size=10,
                                     density_dtype=density_dtype)

    def run_window(variant):
        if variant == "fallback":
            os.environ["FCDGAN_SERVE_CANVAS_MAX_MB"] = "0.000001"
        else:
            os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)
        if variant == "canvas_bf16":
            os.environ["FCDGAN_SERVE_SLAB_DTYPE"] = "bfloat16"
        cache = DeviceSceneWindowCache(ds, None)
        try:
            return cache.stitched_density(infer, sstate, batch_size=10,
                                          density_dtype=density_dtype)
        finally:
            cache._pool.shutdown(wait=True)
            os.environ.pop("FCDGAN_SERVE_CANVAS_MAX_MB", None)
            os.environ.pop("FCDGAN_SERVE_SLAB_DTYPE", None)

    variants = ["fallback", "canvas"]
    if ds.raster_x.dtype == np.float32:
        variants.append("canvas_bf16")  # byte-halver only bites on f32 scenes

    # warm all (compile) + capture outputs for the exactness check
    want = run_fused()
    for v in variants:
        out = run_window(v)
        if v == "canvas_bf16":
            err = float(np.max(np.abs(out - want)))
            print(json.dumps({"check": v, "max_abs_err_vs_fused":
                              round(err, 5)}), flush=True)
        else:
            print(json.dumps({"check": v, "bit_exact_vs_fused":
                              bool(np.array_equal(out, want))}), flush=True)

    v_bytes = {"fused": 0, "fallback": slab_bytes, "canvas": slab_bytes,
               "canvas_bf16": slab_bytes // 2}
    results = {v: [] for v in ["fused"] + variants}
    for rep in range(reps):
        for v in variants + ["fused"]:
            t0 = time.perf_counter()
            if v == "fused":
                run_fused()
            else:
                run_window(v)
            dt = time.perf_counter() - t0
            results[v].append(px_count / dt / 1e6)
            bound = v_bytes[v] / 1e6 / link_mb_s
            print(json.dumps({"variant": v, "rep": rep,
                              "mpx_per_s": round(px_count / dt / 1e6, 3),
                              "wall_s": round(dt, 3),
                              "link_bound_s": round(bound, 3),
                              "frac_of_link_bound": (round(bound / dt, 3)
                                                     if bound else None),
                              "t": round(time.time(), 3)}), flush=True)

    summary = {v: {"median": round(float(np.median(r)), 3),
                   "min": round(min(r), 3), "max": round(max(r), 3)}
               for v, r in results.items()}
    summary["canvas_over_fused"] = round(
        summary["canvas"]["median"] / summary["fused"]["median"], 3)
    summary["canvas_over_fallback"] = round(
        summary["canvas"]["median"] / summary["fallback"]["median"], 3)
    print(json.dumps({"summary": summary, "scene_px": scene_px,
                      "density_dtype": density_dtype,
                      "link_mb_per_s": round(link_mb_s, 1),
                      "upload_bytes": slab_bytes}), flush=True)


if __name__ == "__main__":
    main()
