"""Probe the host->device upload path: size sweep + concurrency.

The round-4 window-serving gap attributed its residual wall to "~8 MB/s
measured link" for slab uploads, while round-2 recorded ~850 MB/s for
batch puts. This probe times jax.device_put for a size ladder, then the
same total bytes split across N concurrent threads, to decide whether the
round-5 fix should (a) pipeline more uploads, (b) shrink bytes, or (c)
parallelize the transfer itself.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from fcdgan_tpu.utils.runtime import wait_for_backend

    wait_for_backend()

    def put_timed(arr):
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        jax.block_until_ready(d)
        return time.perf_counter() - t0, d

    # warm up
    put_timed(np.zeros((256, 256), np.uint8))

    for mb in (0.5, 2, 8, 32, 64):
        n = int(mb * 1e6)
        arr = np.random.randint(0, 255, size=n, dtype=np.uint8)
        ts = []
        for _ in range(3):
            dt, d = put_timed(arr)
            ts.append(dt)
            del d
        print(json.dumps({"probe": "serial", "mb": mb,
                          "ms": [round(t * 1e3, 1) for t in ts],
                          "mb_per_s": round(mb / min(ts), 1)}), flush=True)

    # concurrency: same total bytes split over N threads
    total_mb = 32
    for nthreads in (1, 2, 4):
        per = int(total_mb * 1e6 / nthreads)
        arrs = [np.random.randint(0, 255, size=per, dtype=np.uint8)
                for _ in range(nthreads)]
        outs = [None] * nthreads

        def worker(i):
            outs[i] = jax.device_put(arrs[i])

        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            ths = [threading.Thread(target=worker, args=(i,))
                   for i in range(nthreads)]
            for th in ths:
                th.start()
            for th in ths:
                th.join()
            jax.block_until_ready(outs)
            ts.append(time.perf_counter() - t0)
            for i in range(nthreads):
                outs[i] = None
        print(json.dumps({"probe": "concurrent", "threads": nthreads,
                          "total_mb": total_mb,
                          "ms": [round(t * 1e3, 1) for t in ts],
                          "mb_per_s": round(total_mb / min(ts), 1)}),
              flush=True)

    # download for comparison
    d = jax.device_put(np.random.randint(0, 255, size=int(8e6), dtype=np.uint8))
    jax.block_until_ready(d)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(d)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"probe": "download", "mb": 8,
                      "ms": [round(t * 1e3, 1) for t in ts],
                      "mb_per_s": round(8 / min(ts), 1)}), flush=True)


if __name__ == "__main__":
    main()
