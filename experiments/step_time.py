"""Minimal joint-step timer for quick A/Bs (no driver, no baseline lowering).

Run: python experiments/step_time.py [--steps 20] [--reps 3]
Prints one JSON line: {"ms_per_step": ..., "mpx_per_s": ..., "reps_ms": [...]}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--hw", type=int, default=220)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.utils.runtime import enable_compile_cache, wait_for_backend

    wait_for_backend()
    enable_compile_cache()

    from fcdgan_tpu.models import Generator, Segmentor
    from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.train.steps import PerceptionConfig, USSSSteps

    batch, hw, nband = args.batch, args.hw, 3
    pad = (10, 10)
    dtype = (jnp.bfloat16
             if os.environ.get("FCDGAN_BENCH_DTYPE", "bfloat16") == "bfloat16"
             else None)

    net_g = Generator(nband, dtype=dtype)
    net_s = Segmentor(nband, bilinear=True, dtype=dtype)
    tx_g, tx_s = adam(), adam()
    interior = np.tile([[hw - 2 * pad[1], hw - 2 * pad[0]]],
                       (batch, 1)).astype(np.int32)
    steps = USSSSteps(
        net_g, net_s, tx_g, tx_s, load_vgg16_params(),
        PerceptionConfig(select_feature_layers(1), per_band=True,
                         dtype="bfloat16" if dtype is not None else None),
        perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
        interior_sizes=interior, pad=pad,
    )

    key = jax.random.PRNGKey(0)
    zx = jnp.zeros((1, hw, hw, nband), jnp.float32)
    gstate = create_net_state(net_g, key, (zx,), tx_g)
    sstate = create_net_state(net_s, jax.random.fold_in(key, 1), (zx, zx), tx_s)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, nband)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, hw, hw, nband)).astype(np.float32))
    ref = jnp.asarray(rng.integers(1, 3, size=(batch, hw, hw, 1)).astype(np.float32))
    item = jnp.arange(batch, dtype=jnp.int32)
    w = jnp.ones(batch, jnp.float32)

    compiled = steps.joint.lower(gstate, sstate, x, y, ref, item, w,
                                 1e-4, 1e-4).compile()

    for _ in range(3):
        gstate, sstate, m = compiled(gstate, sstate, x, y, ref, item, w,
                                     1e-4, 1e-4)
    float(m["NetLoss"])

    reps_ms = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            gstate, sstate, m = compiled(gstate, sstate, x, y, ref, item, w,
                                         1e-4, 1e-4)
        float(m["NetLoss"])
        reps_ms.append((time.perf_counter() - t0) / args.steps * 1e3)

    best = min(reps_ms)
    print(json.dumps({
        "ms_per_step": round(best, 2),
        "mpx_per_s": round(batch * hw * hw / best / 1e3, 3),
        "reps_ms": [round(r, 2) for r in reps_ms],
    }))


if __name__ == "__main__":
    main()
