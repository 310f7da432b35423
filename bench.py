"""Benchmark: USSS joint-phase training throughput on the available device.

Measures the flagship hot loop — the fused USSS joint step (generator +
siamese U-Net forward, single combined backward, both optimizer updates,
on-device confusion matrix) at the reference's production configuration
(batch 10 of 220x220 tiles, per-band perception layer 1, 5-scale MS-SSIM;
Demo_USSS.py:33-76) — and prints ONE JSON line:

    {"metric": "usss_train_throughput", "value": <Mpx/s>, "unit": "Mpx/s",
     "vs_baseline": <value / estimated A100 reference>}

Baseline methodology (see BASELINE.md): the reference repo publishes no
numbers and no GPU is available here, so the A100 PyTorch baseline is an
*estimate*: reference step FLOPs (measured from this step's XLA cost analysis,
scaled by 5/3 for the reference's second backward pass) at 35% utilization of
A100 TF32 peak (156 TFLOP/s). vs_baseline > 1 means faster than that estimate.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.models import Generator, Segmentor
    from fcdgan_tpu.models.vgg import load_vgg16_params, select_feature_layers
    from fcdgan_tpu.train.optim import adam
    from fcdgan_tpu.train.state import create_net_state
    from fcdgan_tpu.train.steps import PerceptionConfig, USSSSteps

    # reference USSS production config (Demo_USSS.py:33-76); mixed precision
    # by default (bf16 MXU compute, f32 losses/BN) — FCDGAN_BENCH_DTYPE=float32
    # for the exact-parity dtype
    import os

    batch, hw, nband = 10, 220, 3
    pad = (10, 10)
    dtype = (jnp.bfloat16
             if os.environ.get("FCDGAN_BENCH_DTYPE", "bfloat16") == "bfloat16"
             else None)

    net_g = Generator(nband, dtype=dtype)
    net_s = Segmentor(nband, bilinear=True, dtype=dtype)
    tx_g, tx_s = adam(), adam()
    interior = np.tile([[hw - 2 * pad[1], hw - 2 * pad[0]]], (batch, 1)).astype(np.int32)
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

    # compile + measure FLOPs of the jitted step (state buffers donated)
    lowered = steps.joint.lower(gstate, sstate, x, y, ref, item, w, 1e-4, 1e-4)
    compiled = lowered.compile()

    # Baseline FLOPs must reflect the REFERENCE's math, not this step's: the
    # space-to-depth rewrites trade extra FLOPs for lane utilization, so the
    # transformed step's XLA count overstates what the reference would run.
    # Lower the step once with the transforms disabled for the faithful count.
    os.environ["FCDGAN_NO_S2D"] = "1"
    try:
        steps_plain = USSSSteps(
            net_g, net_s, tx_g, tx_s, load_vgg16_params(),
            PerceptionConfig(select_feature_layers(1), per_band=True,
                             dtype="bfloat16" if dtype is not None else None),
            perception_weight=0.4, l1_weight=0.65, ssim_weight=0.0,
            interior_sizes=interior, pad=pad,
        )
        plain = steps_plain.joint.lower(gstate, sstate, x, y, ref, item, w,
                                        1e-4, 1e-4)
        cost = plain.cost_analysis()
        if not cost or not float((cost[0] if isinstance(cost, (list, tuple))
                                  else cost).get("flops", 0.0)):
            cost = plain.compile().cost_analysis()
    finally:
        del os.environ["FCDGAN_NO_S2D"]
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0

    def run_step(g, s):
        return compiled(g, s, x, y, ref, item, w, 1e-4, 1e-4)

    # warmup
    for _ in range(3):
        gstate, sstate, m = run_step(gstate, sstate)
    jax.block_until_ready(m["NetLoss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        gstate, sstate, m = run_step(gstate, sstate)
    jax.block_until_ready(m["NetLoss"])
    dt = time.perf_counter() - t0

    px_per_step = batch * hw * hw
    mpx_per_s = px_per_step * n_steps / dt / 1e6

    # estimated A100 reference baseline (BASELINE.md methodology)
    ref_step_flops = step_flops * (5.0 / 3.0)  # reference runs two backwards
    a100_effective = 0.35 * 156e12  # TF32 peak at 35% utilization
    baseline_mpx = (
        px_per_step / (ref_step_flops / a100_effective) / 1e6
        if step_flops > 0 else float("nan")
    )
    vs_baseline = mpx_per_s / baseline_mpx if baseline_mpx == baseline_mpx else -1.0

    print(json.dumps({
        "metric": "usss_train_throughput",
        "value": round(mpx_per_s, 3),
        "unit": "Mpx/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
