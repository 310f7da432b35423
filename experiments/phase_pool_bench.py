"""Isolated A/B of the VGG block-1 phase-pool-exit forward.

Times the XLA where+reduce_window composite vs the fused pallas kernel
(ops/pallas/phase_pool.py) at the block-1 s2d shape the joint step actually
runs (stacked per-band VGG batch, 128 channels = 64 phase pairs), with a
chained data dependency so the axon relay cannot serve repeats from cache.

Run: python experiments/phase_pool_bench.py [--stack 60] [--hw 220]
Prints one JSON line per variant.
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
    ap.add_argument("--stack", type=int, default=60,
                    help="stacked VGG batch (2*C*B images)")
    ap.add_argument("--hw", type=int, default=220)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.utils.runtime import enable_compile_cache, wait_for_backend

    wait_for_backend()
    enable_compile_cache()

    from fcdgan_tpu.models.vgg import _phase_pool_exit
    from fcdgan_tpu.ops.pallas.phase_pool import (
        phase_pool_forward, use_pallas_phase_pool,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # block-1 W-s2d shape: (stack, H, W/2, 2*64)
    shape = (args.stack, args.hw, args.hw // 2, 128)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), dtype)
    print(json.dumps({"shape": list(shape), "dtype": args.dtype,
                      "pallas_applicable": bool(
                          use_pallas_phase_pool(shape, dtype))}))

    def chained(fn):
        @jax.jit
        def run(x):
            def body(i, acc):
                y = fn(x + acc)        # data-dep chain defeats result caching
                # full-output reduce so XLA cannot dead-code the pool down to
                # one element (a [0,0,0,0] probe measured 0.005 ms — DCE'd)
                return acc + jnp.max(y).astype(x.dtype) * 1e-9
            return jax.lax.fori_loop(0, args.steps, body, jnp.zeros((), x.dtype))
        return run

    for name, fn in (("xla_composite", _phase_pool_exit),
                     ("pallas_fused", phase_pool_forward)):
        if name == "pallas_fused" and not use_pallas_phase_pool(shape, dtype):
            print(json.dumps({"variant": name, "skipped": "gate"}))
            continue
        run = chained(fn)
        float(np.asarray(run(x)))  # compile; value fetch = real barrier
        reps = []
        for r in range(args.reps):
            # fresh argument every rep: the axon relay serves repeated
            # same-arg executions from cache (measured 0.0007 ms "calls");
            # and fetch the VALUE each time — block_until_ready alone
            # returned in ~1 us on the relay (async dispatch)
            xr = x + jnp.asarray(r + 1, x.dtype) * 1e-6
            float(np.asarray(jnp.max(xr)))
            t0 = time.perf_counter()
            float(np.asarray(run(xr)))
            reps.append((time.perf_counter() - t0) / args.steps * 1e3)
        print(json.dumps({"variant": name,
                          "ms_per_call": round(min(reps), 4),
                          "reps_ms": [round(r, 4) for r in reps]}))


if __name__ == "__main__":
    main()
