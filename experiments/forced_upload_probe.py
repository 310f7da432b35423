"""Time TRUE slab-upload completion vs program execution on fresh buffers.

serve_ab4: in phased serving the per-group barrier fetch costs 3.1-3.8 s
even though the puts 'complete' in ~90 ms — device_put is async on the
relay and the real transfer lands later, serializing into the execute
stream. upload_probe.py's 1.5 GB/s used block_until_ready, which the relay
acks early, and repeat downloads are served from a host-side cache — so
neither is a trustworthy upload barrier. The only sound barrier is a
device program that READS the uploaded buffer + a value fetch of its
output.

Phases timed per iteration (same 20.8 MB slab payload, 6 iterations):
  put_ms     - the device_put call (async enqueue)
  force_ms   - tiny consuming jit + 1-elem value fetch (true upload wall)
  run_ms     - the slab canvas program dispatch
  barrier_ms - value fetch of the program's probe (true execution wall)

Usage: python experiments/forced_upload_probe.py
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
    os.environ["FCDGAN_SCENE_CACHE_MAX_MB"] = "80"
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))
    cache = DeviceSceneWindowCache(ds, None)
    n = cache.n_slabs
    print(json.dumps({"n_slabs": n, "rows_per_slab": cache._rows_per_slab}),
          flush=True)

    _scene_jits()
    run_acc = dc._ACC_RUN
    grid = cache._grid
    ph, pw, padx, pady, wp = cache._geom
    sy_, sx_ = ph - 2 * pady, pw - 2 * padx
    hp2, wp2 = grid.padded_shape()
    geom = (ph, pw, padx, pady, sy_, sx_)

    force = jax.jit(lambda a, b: a[0, 0, 0].astype(jnp.float32)
                    + b[0, 0, 0].astype(jnp.float32))

    payloads = [cache._read_slab_host(k) for k in range(n)]

    def one_pass(do_force):
        canvas = jnp.zeros((hp2 - 2 * pady, wp2 - 2 * padx, 1), jnp.uint8)
        rows = []
        for k in range(n):
            t0 = time.perf_counter()
            bufs = cache._put_slab(payloads[k])
            t1 = time.perf_counter()
            px, py, pref, row0 = bufs
            if do_force:
                np.asarray(force(px, py))
            t2 = time.perf_counter()
            idxs = cache._serve_chunks(cache.slab_items(k), 10)
            canvas, probe = run_acc(infer, geom, "uint8",
                                    jnp.asarray(idxs), px, py, pref,
                                    cache._origins, cache._wins, cache._norm,
                                    canvas, sstate, jnp.int32(int(row0)))
            t3 = time.perf_counter()
            np.asarray(probe)
            t4 = time.perf_counter()
            rows.append({"k": k, "put_ms": round((t1 - t0) * 1e3, 1),
                         "force_ms": round((t2 - t1) * 1e3, 1),
                         "run_ms": round((t3 - t2) * 1e3, 1),
                         "barrier_ms": round((t4 - t3) * 1e3, 1)})
        t5 = time.perf_counter()
        np.asarray(canvas)
        dl = time.perf_counter() - t5
        return rows, dl

    for do_force in (False, True):
        one_pass(do_force)  # warm
        for rep in range(2):
            t0 = time.perf_counter()
            rows, dl = one_pass(do_force)
            wall = time.perf_counter() - t0
            print(json.dumps({"force": do_force, "rep": rep,
                              "wall_s": round(wall, 3),
                              "mpx_per_s": round(scene_px * scene_px / wall / 1e6, 3),
                              "final_dl_s": round(dl, 3), "rows": rows}),
                  flush=True)


if __name__ == "__main__":
    main()
