"""In-process sweep of the production serving chunk width (FCDGAN_SERVE_BS).

Round 5 shipped FCDGAN_SERVE_BS=32 (+22-27% over batch-exact bs10 on the
fused whole-scene path) as the bench/tools default. This sweeps wider caps
interleaved in one process on the same resident uint16 scene to find where
the MXU-depth win saturates, and quantifies the per-width value drift vs
the bs-exact baseline (XLA picks per-batch-size conv lowerings on TPU bf16,
so widths differ by ~1 uint8 quantization step on a few % of pixels —
BASELINE.md round-5 chunker note).

Usage: python experiments/serve_bs_sweep.py   [SCENE_PX=2048 REPS=3
       WIDTHS=0,32,64,96 DD=uint8]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.data.datasets import ScenePairDataset
    from fcdgan_tpu.data.device_cache import DeviceSceneCache
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
    widths = [int(w) for w in
              os.environ.get("WIDTHS", "0,32,64,96").split(",")]

    model = Segmentor(3, bilinear=True, dtype=jnp.bfloat16)
    zx = jnp.zeros((1, 220, 220, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    td = tempfile.mkdtemp()
    paths = make_usss_scene(td, scene_px, scene_px, 3, dtype="uint16")
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))
    cache = DeviceSceneCache(ds, None)
    px_count = scene_px * scene_px

    def run(width):
        if width > 0:
            os.environ["FCDGAN_SERVE_BS"] = str(width)
        else:
            os.environ.pop("FCDGAN_SERVE_BS", None)
        try:
            return cache.stitched_density(infer, sstate, batch_size=10,
                                          density_dtype=density_dtype)
        finally:
            os.environ.pop("FCDGAN_SERVE_BS", None)

    # warm (compile) each width + drift check vs the bs-exact baseline
    base = np.asarray(run(0))
    for w in widths:
        if w == 0:
            continue
        out = np.asarray(run(w))
        diff = np.abs(out.astype(np.int32) - base.astype(np.int32))
        print(json.dumps({"width": w, "max_steps_vs_bs0": int(diff.max()),
                          "pct_px_differing":
                          round(float((diff > 0).mean() * 100), 2)}),
              flush=True)

    results = {w: [] for w in widths}
    for rep in range(reps):
        for w in widths:
            t0 = time.perf_counter()
            run(w)
            dt = time.perf_counter() - t0
            results[w].append(px_count / dt / 1e6)
            print(json.dumps({"width": w, "rep": rep,
                              "mpx_per_s": round(px_count / dt / 1e6, 3),
                              "wall_s": round(dt, 3),
                              "t": round(time.time(), 3)}), flush=True)

    summary = {str(w): {"median": round(float(np.median(r)), 3),
                        "min": round(min(r), 3), "max": round(max(r), 3)}
               for w, r in results.items()}
    print(json.dumps({"summary": summary, "scene_px": scene_px,
                      "density_dtype": density_dtype}), flush=True)


if __name__ == "__main__":
    main()
