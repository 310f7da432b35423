"""H2D bandwidth with a TRUE barrier (consuming jit + value fetch).

forced_upload_probe.py: a 20.8 MB device_put really lands in ~2.1 s
(~10 MB/s) — block_until_ready acks early, so upload_probe.py's 1.5 GB/s
was fiction. Questions that decide the serving design:

  serial    - true serial bandwidth at 8/21/42 MB payloads
  conc N    - same total bytes as N concurrent puts from N threads, all
              forced at once: does concurrency scale effective bandwidth?
  dedup     - put + force the SAME bytes twice: does the relay dedup
              repeated content (explains warm-rep speedups)?

Usage: python experiments/true_bandwidth_probe.py
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fcdgan_tpu.utils.runtime import wait_for_backend

    wait_for_backend()

    force1 = jax.jit(lambda a: a.reshape(-1)[0].astype(jnp.float32) + 1)

    def put_force(arr):
        d = jax.device_put(arr)
        v = float(np.asarray(force1(d)))
        return d, v

    # warm the force jit
    put_force(np.zeros(8, np.float32))

    rng = np.random.default_rng(0)

    for mb in (8, 21, 42):
        n = int(mb * 1e6 / 4)
        for rep in range(2):
            arr = rng.normal(size=n).astype(np.float32)  # fresh bytes
            t0 = time.perf_counter()
            d, _ = put_force(arr)
            dt = time.perf_counter() - t0
            print(json.dumps({"probe": "serial", "mb": mb, "rep": rep,
                              "s": round(dt, 3),
                              "mb_per_s": round(mb / dt, 1)}), flush=True)
            del d

    forceN = {}
    for nthreads in (2, 4):
        total_mb = 21
        per = int(total_mb * 1e6 / 4 / nthreads)
        if nthreads not in forceN:
            forceN[nthreads] = jax.jit(
                lambda *bufs: sum(b.reshape(-1)[0].astype(jnp.float32)
                                  for b in bufs))
        for rep in range(2):
            arrs = [rng.normal(size=per).astype(np.float32)
                    for _ in range(nthreads)]
            outs = [None] * nthreads

            def worker(i):
                outs[i] = jax.device_put(arrs[i])

            t0 = time.perf_counter()
            ths = [threading.Thread(target=worker, args=(i,))
                   for i in range(nthreads)]
            for th in ths:
                th.start()
            for th in ths:
                th.join()
            float(np.asarray(forceN[nthreads](*outs)))
            dt = time.perf_counter() - t0
            print(json.dumps({"probe": "concurrent", "threads": nthreads,
                              "total_mb": total_mb, "rep": rep,
                              "s": round(dt, 3),
                              "mb_per_s": round(total_mb / dt, 1)}),
                  flush=True)
            outs = None

    # dedup: same bytes twice (fresh python buffer, identical content)
    base = rng.normal(size=int(21e6 / 4)).astype(np.float32)
    for rep in range(3):
        arr = base.copy()
        t0 = time.perf_counter()
        d, _ = put_force(arr)
        dt = time.perf_counter() - t0
        print(json.dumps({"probe": "dedup_same_bytes", "rep": rep,
                          "s": round(dt, 3),
                          "mb_per_s": round(21 / dt, 1)}), flush=True)
        del d


if __name__ == "__main__":
    main()
