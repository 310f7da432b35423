"""Isolate the per-execution cost of the per-slab fused stitcher.

window_serve_profile.py showed each slab program (~30 tiles) taking ~1.15 s
on device while the whole-scene fused program does 121 tiles in ~1 s. This
times the two programs directly with the nailed-down protocol from
experiments/phase_pool_bench.py: fresh argument per rep, VALUE fetch as the
barrier (the relay serves repeated same-arg executions from cache and
block_until_ready can return early).

  python experiments/window_prog_bench.py
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
    from fcdgan_tpu.data.device_cache import (DeviceSceneCache,
                                              DeviceSceneWindowCache,
                                              _scene_jits)
    from fcdgan_tpu.data.synthetic import make_usss_scene
    from fcdgan_tpu.models import Segmentor
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.utils.runtime import wait_for_backend

    wait_for_backend()
    scene_px = 2048

    model = Segmentor(3, bilinear=True, dtype=jnp.bfloat16)
    zx = jnp.zeros((1, 220, 220, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(
        st.variables, x, y, train=False).astype(jnp.float32))

    td = tempfile.mkdtemp()
    paths = make_usss_scene(td, scene_px, scene_px, 3)
    ds = ScenePairDataset(paths["x"], paths["y"],
                          patch_size=(220, 220), overlap_padding=(10, 10))

    _scene_jits()
    run = dc._STITCH_RUN
    run_win = dc._WINDOW_RUN

    def timed(label, fn, reps=3):
        vals = []
        for r in range(reps):
            t0 = time.perf_counter()
            out = fn(r)
            # VALUE fetch barrier: force a real device round trip on the result
            np.asarray(out[:1, :1])
            vals.append(time.perf_counter() - t0)
        print(json.dumps({"label": label,
                          "ms": [round(v * 1e3, 1) for v in vals]}), flush=True)

    # -- whole-scene fused program (gate wide open) --------------------------
    cache = DeviceSceneCache(ds, None)
    grid = cache._grid
    ph, pw = grid.canvas_shape()
    padx, pady = grid.overlap_padding
    hp, wp = grid.padded_shape()
    hs, ws = cache._scene_hw
    sy_, sx_ = ph - 2 * pady, pw - 2 * padx
    geom = (ph, pw, padx, pady, sy_, sx_, hp, wp, hs, ws)
    n = len(ds)
    bs = 10
    nch = -(-n // bs)

    def whole(rep):
        ids = np.resize(np.arange(n, dtype=np.int32), nch * bs).reshape(nch, bs)
        ids[0, 0] = rep % n  # fresh arg (dup write is exact: same interiors)
        return run(infer, geom, "uint8", jnp.asarray(ids), cache._px,
                   cache._py, cache._pref, cache._origins, cache._wins,
                   cache._norm, sstate)

    timed(f"whole_scene_{n}tiles_{nch}chunks", whole)

    # -- per-slab program at the forced gate80 geometry ----------------------
    os.environ["FCDGAN_SCENE_CACHE_MAX_MB"] = "80"
    wcache = DeviceSceneWindowCache(ds, None)
    ph2, pw2, padx2, pady2, wp2 = wcache._geom
    out_h = (wcache._rows_per_slab - 1) * wcache._stride + sy_
    out_w = wp2 - 2 * padx2
    wgeom = (ph2, pw2, padx2, pady2, sy_, sx_, out_h, out_w)
    wcache._advance_to(0)
    px, py, pref, row0 = wcache._resident[0]
    items = wcache.slab_items(0)
    m = len(items)
    print(json.dumps({"slab_tiles": m, "n_slabs": wcache.n_slabs,
                      "slab_h": wcache._slab_h, "out_h": out_h}), flush=True)

    for bs2 in (10, m):
        nch2 = -(-m // bs2)

        def slab(rep, bs2=bs2, nch2=nch2):
            ids = np.resize(items.astype(np.int32), nch2 * bs2)
            ids = ids.reshape(nch2, bs2)
            ids[0, 0] = items[rep % m]
            return run_win(infer, wgeom, "uint8", jnp.asarray(ids), px, py,
                           pref, wcache._origins, wcache._wins, wcache._norm,
                           sstate, jnp.int32(int(row0)))

        timed(f"slab_{m}tiles_bs{bs2}_{nch2}chunks", slab)

    # -- control: the same slab's tiles through the WHOLE-scene program ------
    def whole_slab(rep):
        ids = np.resize(items.astype(np.int32), 3 * 10).reshape(3, 10)
        ids[0, 0] = items[rep % m]
        return run(infer, geom, "uint8", jnp.asarray(ids), cache._px,
                   cache._py, cache._pref, cache._origins, cache._wins,
                   cache._norm, sstate)

    timed("whole_prog_slab_tiles_3chunks", whole_slab)


if __name__ == "__main__":
    main()
