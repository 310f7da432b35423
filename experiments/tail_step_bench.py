"""Task: close (or bound) the USSS 4% driver tail (VERDICT r4 item 4).

The USSS driver at the reference config dispatches 3 bs10 joint steps + one
bs6 short-tail step per 36-tile epoch; driver/step sits at 0.952-0.958 with
the residual attributed to the tail step's fixed overheads amortizing over
fewer pixels. This measures T(b) for b in {6, 10} precisely (chained value
fetch protocol: fresh args per rep, final metric fetch as the barrier) and
computes the analytic short-tail bound

    driver/step <= 3.6 * T10 / (3*T10 + T6)

If the measured driver fraction already meets the bound, the 4% is
structural (per-step fixed cost: optimizer moment update ~6.6 ms + BN stat
reductions + dispatch) and the honest outcome is a measured negative.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.utils.runtime import enable_compile_cache, wait_for_backend

    enable_compile_cache()
    wait_for_backend()
    import bench

    out = {}
    for b in (6, 10):
        steps, gstate, sstate, data = bench._setup_usss_step(batch=b)
        d = {k: jnp.asarray(v) for k, v in data.items()}
        args = (d["x"], d["y"], d["ref"], d["item"], d["weight"], 1e-4, 1e-4)
        g, s, m = steps.joint(gstate, sstate, *args)
        float(np.asarray(m["NetLoss"]))  # compile + settle

        reps = []
        for rep in range(5):
            # fresh arg values per rep (the relay serves repeated same-arg
            # executions from cache — round-4 protocol finding)
            rng = np.random.default_rng(rep + 1)
            xf = jnp.asarray(rng.normal(size=data["x"].shape).astype(np.float32))
            n = 5
            t0 = time.perf_counter()
            for i in range(n):
                g, s, m = steps.joint(g, s, xf + np.float32(i), d["y"],
                                      d["ref"], d["item"], d["weight"],
                                      1e-4, 1e-4)
            float(np.asarray(m["NetLoss"]))  # value fetch = barrier
            reps.append((time.perf_counter() - t0) / n * 1e3)
        out[f"T{b}_ms"] = sorted(round(r, 2) for r in reps)

    t10 = float(np.median(out["T10_ms"]))
    t6 = float(np.median(out["T6_ms"]))
    bound = 3.6 * t10 / (3 * t10 + t6)
    print(json.dumps({
        **out, "T10_med": round(t10, 2), "T6_med": round(t6, 2),
        "t6_over_t10": round(t6 / t10, 3),
        "driver_frac_bound_short_tail": round(bound, 4),
        "note": "bound assumes zero driver overhead beyond the step mix; "
                "measured driver_frac 0.952-0.958 (BENCH_r04)",
    }))


if __name__ == "__main__":
    main()
