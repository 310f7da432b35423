"""Time the WSSS adversarial step on the device at WHU slice shapes, and
compare against the measured host batch-assembly rate — the feeding-limit
check that decides whether a native (C++) WHU loader is worth building
(ROADMAP round-2 candidate 6)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(batch=10, hw=256, nband=3):
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.models import Discriminator, Generator, Segmentor
    from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
    from fcdgan_tpu.train.optim import adam, rmsprop
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.train.steps import PerceptionConfig, WSSSSteps
    from fcdgan_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.bfloat16
    net_g = Generator(nband, dtype=dtype)
    net_s = Segmentor(nband, bilinear=True, dtype=dtype)
    net_d = Discriminator(nband, dtype=dtype)
    tx_g, tx_s, tx_d = adam(), rmsprop(), rmsprop()
    steps = WSSSSteps(
        net_g, net_s, net_d, tx_g, tx_s, tx_d, load_vgg16_params(),
        PerceptionConfig(select_feature_layers(1), per_band=True, dtype="bfloat16"),
        perception_weight=0.4, ssim_weight=2.0, g_weight=1.0, l1_weight=1.6,
        d_weight=1.0, nc_weight=1.5,
    )
    key = jax.random.PRNGKey(0)
    zx = jnp.zeros((1, hw, hw, nband), jnp.float32)
    gstate = create_net_state(net_g, key, (zx,), tx_g)
    sstate = create_net_state(net_s, jax.random.fold_in(key, 1), (zx, zx), tx_s)
    dstate = create_net_state(net_d, jax.random.fold_in(key, 2), (zx, zx), tx_d)

    rng = np.random.default_rng(0)
    mk = lambda: rng.normal(size=(batch, hw, hw, nband)).astype(np.float32)
    x, y, nx, ny = mk(), mk(), mk(), mk()
    ref = rng.uniform(size=(batch, hw, hw, 1)).astype(np.float32)
    w = np.ones(batch, np.float32)

    args = (x, y, ref, nx, ny, w, 1e-4, 1e-4)
    out = steps.adversarial(sstate, dstate, gstate, *args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    sstate, dstate = out[0], out[1]
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = steps.adversarial(sstate, dstate, gstate, *args)
        sstate, dstate = out[0], out[1]
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / n * 1000
    print(f"WSSS adversarial step (bs{batch}, {hw}px, bf16): {dt:.1f} ms")
    print(f"host WHU pair assembly measured ~38 ms/batch (2x19 ms, warm, "
          f"1 core) -> feeding-limited: {dt < 38}")


if __name__ == "__main__":
    main()
