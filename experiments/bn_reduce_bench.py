"""Microbench: per-channel stat reductions (BN fwd/bwd pattern) on TPU.

The joint-step trace shows convert_reduce fusions (BN statistics over big
NHWC activations) at ~20-25% of HBM bandwidth, 31 ms of a 135 ms step. This
isolates the reduce patterns at the production shapes and compares XLA's
lowering with a Pallas lane-aligned multi-reduce.

NB: repeated execution with IDENTICAL args measures ~10 TB/s on the axon
relay — executions get deduped somewhere in the stack. Every timing here
cycles through distinct pre-staged inputs (same trick bench.py uses by
chaining outputs).

Run: python experiments/bn_reduce_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_BUF = 8
REPS = 4


def timeit_cycle(f, bufs):
    """Time f over distinct device-resident inputs (defeats dedup)."""
    import jax

    y = f(*bufs[0])
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    n = 0
    for _ in range(REPS):
        for args in bufs:
            y = f(*args)
            n += 1
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    shapes = [
        (20, 220, 220, 64),
        (10, 220, 220, 128),
        (10, 110, 110, 256),
        (10, 55, 55, 512),
        (10, 27, 27, 1024),
    ]
    rng = np.random.default_rng(0)

    @jax.jit
    def xla_stats(x):
        xf = x.astype(jnp.float32)
        return jnp.mean(xf, (0, 1, 2)), jnp.mean(jnp.square(xf), (0, 1, 2))

    @jax.jit
    def xla_bwd_sums(dy, x):
        dyf = dy.astype(jnp.float32)
        return jnp.sum(dyf, (0, 1, 2)), jnp.sum(dyf * x.astype(jnp.float32), (0, 1, 2))

    from fcdgan_tpu.ops.pallas.channel_sums import channel_sums, channel_sums_pair

    p_stats = jax.jit(lambda x: channel_sums(x, square=True))
    p_pair = jax.jit(channel_sums_pair)

    for shp in shapes:
        xs = [
            jnp.asarray(rng.normal(size=shp).astype(np.float32), jnp.bfloat16)
            for _ in range(N_BUF)
        ]
        dys = [
            jnp.asarray(rng.normal(size=shp).astype(np.float32), jnp.bfloat16)
            for _ in range(N_BUF)
        ]
        jax.block_until_ready(xs + dys)
        one = [(x,) for x in xs]
        two = list(zip(dys, xs))
        nbytes = xs[0].size * 2
        t_x = timeit_cycle(xla_stats, one)
        t_b = timeit_cycle(xla_bwd_sums, two)
        try:
            s, ss = p_stats(xs[0])
            ref_s = np.sum(np.asarray(xs[0], np.float32), (0, 1, 2))
            ref_ss = np.sum(np.square(np.asarray(xs[0], np.float32)), (0, 1, 2))
            err = max(
                np.abs(np.asarray(s) - ref_s).max() / (np.abs(ref_s).max() + 1e-9),
                np.abs(np.asarray(ss) - ref_ss).max() / (np.abs(ref_ss).max() + 1e-9),
            )
            t_p = timeit_cycle(p_stats, one)
            t_pp = timeit_cycle(p_pair, two)
        except Exception as e:
            t_p = t_pp = float("nan")
            err = float("nan")
            print(f"pallas failed on {shp}: {type(e).__name__}: {e}")
        bw = lambda t, mult: mult * nbytes / t / 1e9
        print(
            f"{str(shp):22s} xla_fwd {t_x*1e3:6.3f} ms ({bw(t_x,1):5.0f} GB/s)"
            f"  xla_bwd {t_b*1e3:6.3f} ms ({bw(t_b,2):5.0f} GB/s)"
            f"  pl_fwd {t_p*1e3:6.3f} ms ({bw(t_p,1):5.0f} GB/s)"
            f"  pl_pair {t_pp*1e3:6.3f} ms ({bw(t_pp,2):5.0f} GB/s)"
            f"  relerr {err:.2e}"
        )


if __name__ == "__main__":
    main()
