"""Per-component timing of the USSS joint step at the production config.

Times each piece in isolation (fwd and fwd+bwd where applicable) with chained
iterations, plus the full joint step, so the MFU budget in ROADMAP.md stays
measured rather than guessed.

Run: python experiments/profile_joint.py [--dtype float32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(f, x, steps=10, perturb=1e-7):
    import jax

    y = f(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    out = x
    for _ in range(steps):
        out = f(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--hw", type=int, default=220)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.models import Generator, Segmentor
    from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers, vgg16_features
    from fcdgan_tpu.ops import losses as L

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    B, HW, C = args.batch, args.hw, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, HW, HW, C)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, HW, HW, C)).astype(np.float32))

    G = Generator(C, dtype=dtype)
    S = Segmentor(C, bilinear=True, dtype=dtype)
    vg = G.init(jax.random.PRNGKey(0), x)
    vs = S.init(jax.random.PRNGKey(1), x, y)
    vgg = load_vgg16_params()
    taps = select_feature_layers(1)

    res = {}

    def g_fwd(xx):
        out, _ = G.apply(vg, xx, train=True, mutable=["batch_stats"])
        return out.astype(jnp.float32) * 1e-6 + xx  # chainable same-shape

    res["G fwd"] = timeit(jax.jit(g_fwd), x)

    def g_fwdbwd(xx):
        def loss(p):
            out, _ = G.apply({"params": p, "batch_stats": vg["batch_stats"]},
                             xx, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9
        g = jax.grad(loss)(vg["params"])
        return xx + jax.tree.leaves(g)[0].mean() * 1e-9

    res["G fwd+bwd"] = timeit(jax.jit(g_fwdbwd), x)

    def s_fwd(xx):
        out, _ = S.apply(vs, xx, y, train=True, mutable=["batch_stats"])
        return xx + out.astype(jnp.float32).mean() * 1e-9

    res["S fwd"] = timeit(jax.jit(s_fwd), x)

    def s_fwdbwd(xx):
        def loss(p):
            out, _ = S.apply({"params": p, "batch_stats": vs["batch_stats"]},
                             xx, y, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9
        g = jax.grad(loss)(vs["params"])
        return xx + jax.tree.leaves(g)[0].mean() * 1e-9

    res["S fwd+bwd"] = timeit(jax.jit(s_fwdbwd), x)

    pdt = jnp.bfloat16 if dtype is not None else None

    def perc_fwdbwd(xx):
        def loss(yy):
            cmask = jnp.zeros(yy.shape[:3] + (1,), yy.dtype)
            return L.perception_loss(xx, yy, cmask, vgg, taps, per_band=True,
                                     dtype=pdt)
        return xx + jax.grad(loss)(xx) * 1e-9

    try:
        res["perception fwd+bwd"] = timeit(jax.jit(perc_fwdbwd), x)
    except Exception as e:
        print("perception isolation skipped:", type(e).__name__, str(e)[:120])

    # full CNet loss (masked L1 rescale + perception + MS-SSIM fwd) wrt
    # (y_fake, cmap) — the joint step's loss stack without the models
    cmap0 = jnp.asarray(rng.uniform(size=(B, HW, HW, 1)).astype(np.float32))

    def cnet_fwdbwd(xx):
        def loss(yy, cm):
            gen, l1, perc, ssim = L.cnet_loss(
                xx, yy, cm, vgg, taps, perception_per_band=True,
                ssim_grad=False,
                perception_dtype=pdt,
            )
            return gen + 0.4 * perc + 0.65 * l1
        gy, gc = jax.grad(loss, argnums=(0, 1))(y, cmap0)
        return xx + gy.mean() * 1e-9 + gc.mean() * 1e-9

    res["cnet loss fwd+bwd"] = timeit(jax.jit(cnet_fwdbwd), x)

    # MS-SSIM forward alone (5 scales, pallas level kernel, no grad)
    from fcdgan_tpu.ops.ssim import ms_ssim

    def ssim_fwd(xx):
        v = ms_ssim(xx, y, data_range=1.0)
        return xx + v.mean() * 1e-9

    res["ms-ssim fwd"] = timeit(jax.jit(ssim_fwd), x)

    for name, dt in res.items():
        print(f"{name:22s}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
