"""Isolate the resident-canvas chain overhead from the program content.

window_canvas_profile.py showed the 6-slab canvas chain's device time is
~2.2 s where the fused whole-scene program does more-or-less the same work
in ~0.5-1.0 s. Three candidate costs: (1) wrap-padded chunks (180 vs 130
tile dispatches at the forced geometry), (2) per-program/chaining overhead
on the relay, (3) run_acc itself (donated canvas, row0-offset gather).

This times, in ONE process on the SAME scene:
  fused    - DeviceSceneCache.stitched_density (ceiling)
  oneslab  - the canvas path with the window budget raised so ONE slab
             holds the scene: same program count as fused (1), same chunk
             structure, plus donation + probe -> isolates (3)
  chain6   - the canvas path at the forced gate (6 slabs) -> adds (1)+(2)

Usage: python experiments/canvas_chain_isolate.py
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

    model = Segmentor(3, bilinear=True, dtype=jnp.bfloat16)
    zx = jnp.zeros((1, 220, 220, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    td = tempfile.mkdtemp()
    paths = make_usss_scene(td, scene_px, scene_px, 3, dtype="float32")
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))
    px_count = scene_px * scene_px

    full = DeviceSceneCache(ds, None)

    def timed(name, fn, reps=3):
        fn()  # warm (compile)
        for rep in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            print(json.dumps({"variant": name, "rep": rep,
                              "wall_s": round(dt, 3),
                              "mpx_per_s": round(px_count / dt / 1e6, 3),
                              "t": round(time.time(), 3)}), flush=True)

    timed("fused", lambda: full.stitched_density(
        infer, sstate, batch_size=10, density_dtype=density_dtype))

    os.environ["FCDGAN_SCENE_WINDOW_MB"] = "4096"
    one = DeviceSceneWindowCache(ds, None)
    assert one.n_slabs == 1, one.n_slabs
    timed("oneslab", lambda: one.stitched_density(
        infer, sstate, batch_size=10, density_dtype=density_dtype))
    one._pool.shutdown(wait=True)

    os.environ["FCDGAN_SCENE_CACHE_MAX_MB"] = "80"
    os.environ.pop("FCDGAN_SCENE_WINDOW_MB")
    six = DeviceSceneWindowCache(ds, None)
    print(json.dumps({"chain_slabs": six.n_slabs}), flush=True)
    timed("chain6", lambda: six.stitched_density(
        infer, sstate, batch_size=10, density_dtype=density_dtype))
    six._pool.shutdown(wait=True)


if __name__ == "__main__":
    main()
