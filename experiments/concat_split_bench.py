"""Does splitting conv-over-concat beat materializing the concat?

The Segmentor decoder's first conv per Up level consumes
concat([upsampled, skip]) (models/segmentor.py) — at level 1 that is a
bf16[10,27,27,2048] tensor. conv(concat(a,b), W) == conv(a, Wa) + conv(b, Wb)
exactly, which skips writing/reading the concatenation. This measures both
forms (fwd and fwd+bwd) at the four decoder shapes to decide whether the
rewrite is worth wiring into Up.

Run when the host is quiet: python experiments/concat_split_bench.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(f, *a, steps=20):
    import jax

    y = f(*a)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = f(*a)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    # (H, W, C_up, C_skip, C_out) per decoder level, bs 10, bilinear config
    shapes = [
        (27, 27, 1024, 1024, 512),
        (55, 55, 512, 512, 256),
        (110, 110, 256, 256, 128),
        (220, 220, 128, 128, 64),
    ]
    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")
    for h, w, ca, cb, co in shapes:
        a = jnp.asarray(rng.normal(size=(10, h, w, ca)).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(10, h, w, cb)).astype(np.float32)).astype(jnp.bfloat16)
        wk = jnp.asarray(rng.normal(size=(3, 3, ca + cb, co)).astype(np.float32) * 0.01).astype(jnp.bfloat16)

        def concat_form(a, b, wk):
            x = jnp.concatenate([a, b], axis=-1)
            return jax.lax.conv_general_dilated(x, wk, (1, 1), "SAME", dimension_numbers=dn)

        def split_form(a, b, wk):
            wa, wb = wk[:, :, :ca, :], wk[:, :, ca:, :]
            ya = jax.lax.conv_general_dilated(a, wa, (1, 1), "SAME", dimension_numbers=dn)
            yb = jax.lax.conv_general_dilated(b, wb, (1, 1), "SAME", dimension_numbers=dn)
            return ya + yb

        f1 = jax.jit(concat_form)
        f2 = jax.jit(split_form)
        g1 = jax.jit(jax.grad(lambda a, b, wk: concat_form(a, b, wk).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        g2 = jax.jit(jax.grad(lambda a, b, wk: split_form(a, b, wk).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        t_cat = timeit(f1, a, b, wk)
        t_spl = timeit(f2, a, b, wk)
        tg_cat = timeit(g1, a, b, wk)
        tg_spl = timeit(g2, a, b, wk)
        print(
            f"({h}x{w}, {ca}+{cb}->{co}): fwd concat {t_cat:.3f} split {t_spl:.3f} | "
            f"bwd concat {tg_cat:.3f} split {tg_spl:.3f} ms"
        )

    # sanity: exactness
    ya = jax.jit(concat_form)(a, b, wk)
    yb = jax.jit(split_form)(a, b, wk)
    print("max abs diff:", float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
