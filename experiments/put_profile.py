"""Profile host->device batch placement strategies on the axon relay.

The round-2 driver A/B recorded 1.551 Mpx/s end-to-end vs 3.607 step-only
(ab_round2.jsonl): ~147 ms/batch of non-step time. The prime suspect is
per-leaf jax.device_put latency (~25-35 ms/transfer on this relay). This
experiment times: (a) per-leaf puts of a USSS batch, (b) one packed-array
put, (c) puts overlapped with step compute from a background thread.
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    steps, gstate, sstate, data = bench._setup_usss_step(batch=10)
    d = {k: jnp.asarray(v) for k, v in data.items()}
    args = (d["x"], d["y"], d["ref"], d["item"], d["weight"], 1e-4, 1e-4)
    g, s, m = steps.joint(gstate, sstate, *args)
    float(m["NetLoss"])

    host = {k: np.asarray(v) for k, v in data.items()}
    mb = sum(v.nbytes for v in host.values()) / 1e6

    # (a) per-leaf puts, synced
    def put_leaves():
        out = {k: jax.device_put(v) for k, v in host.items()}
        jax.block_until_ready(out)
        return out

    put_leaves()
    t0 = time.perf_counter()
    for _ in range(5):
        put_leaves()
    dta = (time.perf_counter() - t0) / 5
    print(f"(a) per-leaf put ({len(host)} leaves, {mb:.1f} MB): {dta*1e3:.1f} ms")

    # (b) packed single-array put (x,y,ref channel-concat + tiny scalar tail)
    packed = np.concatenate([host["x"], host["y"], host["ref"]], axis=-1)
    small = np.concatenate([host["item"].astype(np.float32), host["weight"]])

    def put_packed():
        a = jax.device_put(packed)
        b = jax.device_put(small)
        jax.block_until_ready((a, b))
        return a, b

    put_packed()
    t0 = time.perf_counter()
    for _ in range(5):
        put_packed()
    dtb = (time.perf_counter() - t0) / 5
    print(f"(b) packed put (2 leaves, {packed.nbytes/1e6:.1f} MB): {dtb*1e3:.1f} ms")

    # (c) packed put from a background thread while the step runs
    def step_once(g, s):
        g, s, m = steps.joint(g, s, *args)
        return g, s, m

    results = {}

    def putter():
        t0 = time.perf_counter()
        a = jax.device_put(packed)
        b = jax.device_put(small)
        jax.block_until_ready((a, b))
        results["put_s"] = time.perf_counter() - t0

    # baseline step time
    g, s, m = step_once(g, s)
    float(m["NetLoss"])
    t0 = time.perf_counter()
    for _ in range(5):
        g, s, m = step_once(g, s)
    float(m["NetLoss"])
    step_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"    step alone: {step_ms:.1f} ms")

    t0 = time.perf_counter()
    ths = []
    for _ in range(5):
        th = threading.Thread(target=putter)
        th.start()
        g, s, m = step_once(g, s)
        ths.append(th)
    for th in ths:
        th.join()
    float(m["NetLoss"])
    dtc = (time.perf_counter() - t0) / 5
    print(f"(c) step + overlapped packed put: {dtc*1e3:.1f} ms/iter "
          f"(last put {results.get('put_s', -1)*1e3:.1f} ms)")

    # (d) on-device unpack cost: slice the packed array back into x/y/ref
    nband = 3
    unpack = jax.jit(lambda p: (p[..., :nband], p[..., nband:2*nband],
                                p[..., 2*nband:]))
    pd = jax.device_put(packed)
    u = unpack(pd)
    jax.block_until_ready(u)
    # chained unpack+step vs plain step (measures fusion cost)
    def step_packed(g, s, pd, sm):
        x, y, ref = unpack(pd)
        it = sm[:10].astype(jnp.int32)
        w = sm[10:]
        g, s, m = steps.joint(g, s, x, y, ref, it, w, 1e-4, 1e-4)
        return g, s, m

    smd = jax.device_put(small)
    g, s, m = step_packed(g, s, pd, smd)
    float(m["NetLoss"])
    t0 = time.perf_counter()
    for _ in range(5):
        g, s, m = step_packed(g, s, pd, smd)
    float(m["NetLoss"])
    print(f"(d) unpack+step: {(time.perf_counter()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()
