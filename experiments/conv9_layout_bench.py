"""Layout candidates for the generator's 9x9 OUTPUT conv (64 -> n_channels).

Round-3 trace: this conv runs ~1.4 ms at 11 TF/s — with n_channels ~6 output
lanes the MXU N dimension is 5% filled, so it is structurally latency-bound
in any direct layout. Candidates (all exact rewrites):

  direct   : conv 9x9, (B, 220, 220, 64) -> (B, 220, 220, C)
  out_s2d4 : input 4x4 space-to-depth to (B, 55, 55, 1024); kernel rebuilt
             as 3x3 x 1024 -> 16*C covering the same 12x12 tap window
             (9x9 zero-padded); output depth-to-space back. N = 16*C lanes,
             1.78x FLOPs, plus the two relayouts.

This bench times the direct conv against the out_s2d4 MATMUL CEILING (the
same-shape conv with a random kernel — kernel construction exactness is not
the question here, the layout's speed is), chained fresh-arg value-fetch
timing (see phase_pool_bench.py for why).

Run: python experiments/conv9_layout_bench.py [--batch 10] [--nband 3]
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
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--hw", type=int, default=220)
    ap.add_argument("--nband", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.utils.runtime import enable_compile_cache, wait_for_backend

    wait_for_backend()
    enable_compile_cache()

    b, hw, c_in, c_out = args.batch, args.hw, 64, args.nband
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, hw, hw, c_in)), dt)
    k9 = jnp.asarray(rng.normal(size=(9, 9, c_in, c_out)) * 0.05, dt)
    # out-s2d4 ceiling: same pixels as (b, 55, 55, 16*c_in) with a 3x3 kernel
    # to 16*c_out lanes (the exact rewrite pads 9x9 into the 12x12 window)
    hw4 = hw // 4
    x4 = jnp.asarray(rng.normal(size=(b, hw4, hw4, 16 * c_in)), dt)
    k4 = jnp.asarray(rng.normal(size=(3, 3, 16 * c_in, 16 * c_out)) * 0.05, dt)

    def direct(x):
        return jax.lax.conv_general_dilated(
            x, k9, (1, 1), [(4, 4), (4, 4)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def s2d_relayout(x):
        # the real path pays this reorganization in and out
        x4r = x.reshape(b, hw4, 4, hw4, 4, c_in).transpose(0, 1, 3, 2, 4, 5)
        x4r = x4r.reshape(b, hw4, hw4, 16 * c_in)
        y = jax.lax.conv_general_dilated(
            x4r, k4, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, hw4, hw4, 4, 4, c_out).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, hw, hw, c_out)

    def chained(fn, x0):
        @jax.jit
        def run(x):
            def body(i, acc):
                y = fn(x + acc)
                return acc + jnp.max(y).astype(x.dtype) * 1e-9
            return jax.lax.fori_loop(0, args.steps, body, jnp.zeros((), x.dtype))
        return run, x0

    flops = dict(direct=2 * b * hw * hw * 81 * c_in * c_out,
                 out_s2d4=2 * b * hw4 * hw4 * 9 * 16 * c_in * 16 * c_out)
    for name, (run, x0) in (("direct", chained(direct, x)),
                            ("out_s2d4", chained(s2d_relayout, x))):
        float(np.asarray(run(x0)))  # compile + real barrier
        reps = []
        for r in range(args.reps):
            xr = x0 + jnp.asarray(r + 1, x0.dtype) * 1e-6
            float(np.asarray(jnp.max(xr)))
            t0 = time.perf_counter()
            float(np.asarray(run(xr)))
            reps.append((time.perf_counter() - t0) / args.steps * 1e3)
        ms = min(reps)
        print(json.dumps({"variant": name, "ms_per_call": round(ms, 4),
                          "tf_per_s": round(flops[name] / (ms * 1e-3) / 1e12, 2),
                          "reps_ms": [round(r, 4) for r in reps]}))


if __name__ == "__main__":
    main()
