"""Same-host CPU-vs-CPU step-time anchor (BASELINE.md round-2 note).

The reference's joint-phase epoch on this host's single core is measured
from its own progress lines (~97 s/epoch uncontended at scene_a's 4-tile
batch). This script times the rebuild's jitted USSS joint step on the SAME
host CPU at the same effective configuration (batch of 4 tiles, 220x220x3,
f32, per-band perception layer 1, 5-scale MS-SSIM) — one joint epoch ==
one step here, since all 4 tiles fit one batch.

Run uncontended: python experiments/parity_e2e/cpu_anchor.py
"""

import json
import os
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    os.environ["FCDGAN_BENCH_DTYPE"] = "float32"  # torch-matching numerics
    import bench

    st, g, s, d = bench._setup_usss_step(batch=4)

    t0 = time.perf_counter()
    gg, ss, m = st.joint(g, s, d["x"], d["y"], d["ref"], d["item"], d["weight"], 1e-4, 1e-4)
    jax.block_until_ready(m["NetLoss"])
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        gg, ss, m = st.joint(gg, ss, d["x"], d["y"], d["ref"], d["item"], d["weight"], 1e-4, 1e-4)
        jax.block_until_ready(m["NetLoss"])
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))
    out = {
        "rebuild_cpu_joint_step_s": round(step_s, 2),
        "compile_s": round(compile_s, 1),
        "reference_cpu_joint_epoch_s": 97.0,
        "note": "reference epoch time read from its own uncontended progress "
                "lines on scene_a (/tmp-run log; 1m37s/iter, one iter/epoch)",
        "ratio": round(97.0 / step_s, 2),
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "results", "cpu_anchor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
