"""Measure residual-trunk layout variants for the generator's 3x3 64-ch convs.

The generator's five ResidualBlocks (3x3 64->64 at 220px) run at 14-20 TF/s on
v5e — the step's biggest MFU hole (ROADMAP.md). Candidates, all EXACT
rewrites of the same math:

  base64 : trunk as-is                       (10, 220, 220,  64) k3x3
  pad128 : kernels zero-padded to 128x128    (10, 220, 220, 128) k3x3, 4x FLOPs
  s2d2d  : 2-D space-to-depth trunk          (10, 110, 110, 256) k3x3, 4x FLOPs
  s2d1d  : 1-D space-to-depth (W only)       (10, 220, 110, 128) k3x3, 2x FLOPs

Timing: chained data dependency between iterations (axon serves repeated
same-arg calls from cache), block on the final output.

Run: python experiments/gen_layout_bench.py [--dtype bfloat16] [--fwd-only]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--hw", type=int, default=220)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from fcdgan_tpu.ops.s2d_conv import s2d_kernel, space_to_depth, depth_to_space

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B, HW, C = args.batch, args.hw, 64
    NCONV = 11  # 5 blocks x 2 + trailing conv
    rng = np.random.default_rng(0)
    kernels = [rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32) for _ in range(NCONV)]
    x0 = jnp.asarray(rng.normal(size=(B, HW, HW, C)).astype(np.float32), dtype)

    def conv(x, w, pad=1):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # ---- 1-D space-to-depth (W axis only) helpers -------------------------
    def s2d_w(x, b=2):
        n, h, w, c = x.shape
        return x.reshape(n, h, w // b, b, c).reshape(n, h, w // b, b * c)

    def d2s_w(y, c_out, b=2):
        n, h, w2, _ = y.shape
        return y.reshape(n, h, w2, b, c_out).reshape(n, h, w2 * b, c_out)

    @functools.lru_cache(maxsize=None)
    def s2d1d_scatter(k, pad, c_in, c_out, b=2):
        lo = min((q + d - pad) // b for q in range(b) for d in (0, k - 1))
        hi = max((q + d - pad) // b for q in range(b) for d in (0, k - 1))
        kt = hi - lo + 1
        src, dst = [[], [], []], [[], [], []]
        for qx in range(b):
            for dx in range(k):
                tx = (qx + dx - pad) // b - lo
                rx = (qx + dx - pad) % b
                for c in range(c_in):
                    src[0].append(dx)
                    src[1].append(c)
                    dst[0].append(tx)
                    dst[1].append(rx * c_in + c)
                    dst[2].append(qx)
        return (kt, -lo, tuple(np.asarray(a, np.int32) for a in src[:2]),
                tuple(np.asarray(a, np.int32) for a in dst))

    def s2d1d_kernel(w, pad, b=2):
        k = w.shape[1]
        c_in, c_out = w.shape[2], w.shape[3]
        kt, pad2, src, dst = s2d1d_scatter(k, pad, c_in, c_out, b)
        vals = w[:, src[0], src[1], :]  # (ky, n_entries, c_out)
        w2 = np.zeros((w.shape[0], kt, b * c_in, b * c_out), w.dtype)
        tx, cin2, qx = dst
        out_cols = qx[:, None] * c_out + np.arange(c_out)[None, :]
        for e in range(len(tx)):
            w2[:, tx[e], cin2[e], out_cols[e]] = vals[:, e, :]
        return w2, pad2

    # ---- variants ----------------------------------------------------------
    def trunk_base(x, ws):
        for w in ws:
            x = conv(x, w)
        return x

    def loss_of(fn, ws):
        def f(x):
            return jnp.sum(fn(x, ws).astype(jnp.float32) ** 2)
        return f

    pad128 = [np.zeros((3, 3, 128, 128), np.float32) for _ in range(NCONV)]
    for w, p in zip(kernels, pad128):
        p[:, :, :64, :64] = w
    s2d2d_ws = [np.asarray(s2d_kernel(jnp.asarray(w), 1)[0]) for w in kernels]
    s2d2d_pad = s2d_kernel(jnp.asarray(kernels[0]), 1)[1]
    s2d1d_ws = [s2d1d_kernel(w, 1)[0] for w in kernels]
    s2d1d_pad = s2d1d_kernel(kernels[0], 1)[1]

    def trunk_pad128(x, ws):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 64)))
        for w in ws:
            x = conv(x, w)
        return x[..., :64]

    def trunk_s2d2d(x, ws):
        x = space_to_depth(x)
        for w in ws:
            x = conv(x, w, pad=s2d2d_pad)
        # channel phase layout differs from input layout between convs; for a
        # pure-conv chain this still measures the conv cost faithfully
        return depth_to_space(x, 64)

    def trunk_s2d1d(x, ws):  # pad stays 1 on H, scattered pad on W
        x = s2d_w(x)
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(w, x.dtype), (1, 1),
                [(1, 1), (s2d1d_pad, s2d1d_pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return d2s_w(x, 64)

    base_flops = 2 * B * HW * HW * 9 * C * C * NCONV  # useful MACs*2

    variants = {
        "base64": (trunk_base, [jnp.asarray(w) for w in kernels]),
        "pad128": (trunk_pad128, [jnp.asarray(w) for w in pad128]),
        "s2d2d": (trunk_s2d2d, [jnp.asarray(w) for w in s2d2d_ws]),
        "s2d1d": (trunk_s2d1d, [jnp.asarray(w) for w in s2d1d_ws]),
    }

    # correctness vs base (fwd, f32 on small input)
    xs = jnp.asarray(rng.normal(size=(1, 16, 16, 64)).astype(np.float32))
    refy = trunk_base(xs, [jnp.asarray(w) for w in kernels])
    for name, (fn, ws) in variants.items():
        got = fn(xs, ws)
        err = float(jnp.max(jnp.abs(got - refy)))
        print(f"{name}: max|err| vs base = {err:.2e}")

    for mode in ("fwd", "fwdbwd"):
        print(f"--- {mode} ---")
        results = {}
        for name, (fn, ws) in variants.items():
            if mode == "fwd":
                f = jax.jit(lambda x, fn=fn, ws=ws: fn(x, ws))
            else:
                f = jax.jit(jax.grad(loss_of(fn, ws)))

            # chained iterations: output feeds next input (same shape)
            def chain(x, n=args.steps, f=f):
                out = x
                for _ in range(n):
                    out = f(out * (1.0 + 1e-7))
                return out

            y = f(x0)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            y = chain(x0)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / args.steps
            mult = 3.0 if mode == "fwdbwd" else 1.0
            tf = base_flops * mult / dt / 1e12
            results[name] = dt
            print(f"{name:8s}: {dt*1e3:8.2f} ms  ({tf:6.1f} useful-TF/s)")
        base = results["base64"]
        for name, dt in results.items():
            print(f"{name:8s}: speedup vs base = {base/dt:.2f}x")


if __name__ == "__main__":
    main()
