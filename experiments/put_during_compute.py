"""Does a host->device put DURING active compute stall the relay's stream?

chain_micro.py: 6 chained canvas programs, all data resident = 0.46 s.
canvas_chain_isolate.py: same chain with per-slab background loads/uploads
= 5.2 s. Uploads alone measure 1.5 GB/s standalone (upload_probe.py). The
remaining suspect is put/compute serialization on the relay (the round-4
training-feed finding, ab_round4.jsonl driver_window_2048 spread).

Variants (same 6-program resident chain as chain_micro):
  none      - no puts (control)
  put_main  - a 20.8 MB device_put on the MAIN thread after each dispatch
  put_thread- same puts issued from a background thread (the slab-feed shape)

Usage: python experiments/put_during_compute.py
"""

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.data.datasets import ScenePairDataset
    from fcdgan_tpu.data import device_cache as dc
    from fcdgan_tpu.data.device_cache import DeviceSceneWindowCache, _scene_jits
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.models import Segmentor
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.utils.runtime import enable_compile_cache, wait_for_backend

    enable_compile_cache()
    wait_for_backend()
    scene_px = 2048

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

    os.environ["FCDGAN_SCENE_WINDOW_MB"] = "4096"
    cache = DeviceSceneWindowCache(ds, None)
    cache._ensure(0)
    cache._advance_to(0)
    pxb, pyb, prefb, row0 = cache._resident[0]

    _scene_jits()
    run_acc = dc._ACC_RUN
    grid = cache._grid
    ph, pw, padx, pady, wp = cache._geom
    sy_, sx_ = ph - 2 * pady, pw - 2 * padx
    hp2, wp2 = grid.padded_shape()
    geom = (ph, pw, padx, pady, sy_, sx_)
    n = len(ds)
    items = np.arange(n, dtype=np.int32)
    n_parts = 6
    per = -(-n // n_parts)
    payload = np.random.default_rng(0).integers(
        0, 60000, size=(420, 2068, 6), dtype=np.uint16).astype(np.float32)
    # ~20.8 MB: one forced-gate slab's packed upload

    def run_chain(variant):
        canvas = jnp.zeros((hp2 - 2 * pady, wp2 - 2 * padx, 1), jnp.uint8)
        holds = []
        threads = []
        put_times = []
        for p in range(n_parts):
            part = items[p * per:(p + 1) * per]
            idxs = np.resize(part, per).reshape(-1, per)
            canvas, _probe = run_acc(infer, geom, "uint8",
                                     jnp.asarray(idxs), pxb, pyb, prefb,
                                     cache._origins, cache._wins, cache._norm,
                                     canvas, sstate, row0)
            if variant == "put_main":
                t0 = time.perf_counter()
                holds.append(jax.device_put(payload))
                put_times.append(time.perf_counter() - t0)
            elif variant == "put_thread":
                def putter():
                    t0 = time.perf_counter()
                    holds.append(jax.device_put(payload))
                    put_times.append(time.perf_counter() - t0)
                th = threading.Thread(target=putter)
                th.start()
                threads.append(th)
        for th in threads:
            th.join()
        host = np.asarray(canvas)
        del holds
        return host, put_times

    for variant in ("none", "put_main", "put_thread"):
        run_chain(variant)  # warm
        for rep in range(2):
            t0 = time.perf_counter()
            _, put_times = run_chain(variant)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "variant": variant, "rep": rep, "wall_s": round(dt, 3),
                "mpx_per_s": round(px_count / dt / 1e6, 3),
                "put_ms": [round(v * 1e3, 1) for v in put_times]}),
                flush=True)

    cache._pool.shutdown(wait=True)


if __name__ == "__main__":
    main()
