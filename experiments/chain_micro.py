"""Micro-isolate the per-program cost of the chained canvas serve path.

canvas_chain_isolate.py: one run_acc program over the whole scene = 7.7
Mpx/s (>= fused), but a 6-slab chain = 0.80 — ~0.75 s of overhead PER
CHAINED PROGRAM beyond its compute. Candidates: (a) canvas donation
round-trips on the relay, (b) execute-queue serialization when a donated
input is a still-executing program's output, (c) the slab loads/uploads
interleaving with dispatch.

Here ALL data stays resident (one whole-scene slab, no loads, no uploads):
the same 121 tiles run as 1 / 2 / 6 sequential run_acc programs chained on
the canvas, with and without donation. One final download each.

Usage: python experiments/chain_micro.py
"""

import functools
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
    scene_px = int(os.environ.get("SCENE_PX", "2048"))
    density_dtype = "uint8"

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
    assert cache.n_slabs == 1
    cache._ensure(0)
    cache._advance_to(0)
    pxb, pyb, prefb, row0 = cache._resident[0]

    _scene_jits()
    run_acc = dc._ACC_RUN
    prep = dc._SCENE_PREP

    # no-donate twin of run_acc (same trace body)
    @functools.partial(jax.jit, static_argnums=(0, 1, 2))
    def run_acc_nd(infer_fn, geom, density_dtype, chunks, px, py, pref,
                   origins, wins, norm, canvas, st, row0):
        ph, pw, padx, pady, sy_, sx_ = geom

        def body(i, out):
            ids = chunks[i]
            arr = jnp.stack([ids, jnp.ones_like(ids)], axis=1)
            x, y, _, _, _ = prep((ph, pw), arr, px, py, pref, origins,
                                 wins, norm, row0)
            d = infer_fn(st, x, y).astype(jnp.float32)
            core = jax.lax.slice(d, (0, pady, padx, 0),
                                 (d.shape[0], pady + sy_, padx + sx_, 1))
            core = (jnp.clip(core, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
            org = origins[ids]

            def write(j, out):
                return jax.lax.dynamic_update_slice(
                    out, core[j], (org[j, 0], org[j, 1], 0))

            return jax.lax.fori_loop(0, d.shape[0], write, out)

        out = jax.lax.fori_loop(0, chunks.shape[0], body, canvas)
        return out, jax.lax.slice(out, (0, 0, 0), (1, 1, 1))

    grid = cache._grid
    ph, pw, padx, pady, wp = cache._geom
    sy_, sx_ = ph - 2 * pady, pw - 2 * padx
    hp2, wp2 = grid.padded_shape()
    geom = (ph, pw, padx, pady, sy_, sx_)
    n = len(ds)
    items = np.arange(n, dtype=np.int32)

    def run_chain(n_parts, fn, label):
        # split the tile list into n_parts chunk groups of equal chunk shape
        per = -(-n // n_parts)
        canvas = jnp.zeros((hp2 - 2 * pady, wp2 - 2 * padx, 1), jnp.uint8)
        for p in range(n_parts):
            part = items[p * per:(p + 1) * per]
            if len(part) == 0:
                break
            idxs = np.resize(part, per).reshape(-1, per)  # one chunk row
            canvas, _probe = fn(infer, geom, density_dtype,
                                jnp.asarray(idxs), pxb, pyb, prefb,
                                cache._origins, cache._wins, cache._norm,
                                canvas, sstate, row0)
        host = np.asarray(canvas)
        return host

    for label, fn in (("donate", run_acc), ("nodonate", run_acc_nd)):
        for n_parts in (1, 2, 6):
            run_chain(n_parts, fn, label)  # warm/compile
            for rep in range(2):
                t0 = time.perf_counter()
                run_chain(n_parts, fn, label)
                dt = time.perf_counter() - t0
                print(json.dumps({
                    "variant": f"{label}_x{n_parts}", "rep": rep,
                    "wall_s": round(dt, 3),
                    "mpx_per_s": round(px_count / dt / 1e6, 3)}), flush=True)

    cache._pool.shutdown(wait=True)


if __name__ == "__main__":
    main()
