"""Does the tunnel allow CONCURRENT upload streams?

docs/PROBE_dispatch_r3.json measured ~40-75 MB/s effective single-
stream upload; every dispatch's device_put blocks its calling thread.
If the transport multiplexes, uploading from 2-4 threads should scale
aggregate bandwidth and unlock the remaining e2e gap (device program
~75 ms/batch needs ~44 MB/s sustained to stay fed at CB=128 i16).

    python tools/probe_upload_threads.py
Writes docs/PROBE_upload_threads_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    MB = 1024 * 1024
    buf = np.random.default_rng(0).integers(
        -500, 500, size=(4 * MB,), dtype=np.int16
    )  # 8 MB per upload
    bufs = [buf + i for i in range(16)]  # distinct arrays, no caching

    def upload(a):
        return jnp.asarray(a).block_until_ready()

    upload(bufs[0])  # warm up

    results = {}
    for nthreads in (1, 2, 4):
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            if nthreads == 1:
                outs = [upload(a) for a in bufs]
            else:
                with ThreadPoolExecutor(nthreads) as ex:
                    outs = list(ex.map(upload, bufs))
            # materialise a byte from each to be safe through the relay
            _ = [np.asarray(o[:1]) for o in outs]
            dt = time.perf_counter() - t0
            best = max(best, len(bufs) * buf.nbytes / MB / dt)
        results[f"threads={nthreads}"] = {"agg_MB_per_s": round(best, 1)}
        print(f"threads={nthreads}: {best:7.1f} MB/s aggregate", flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROBE_upload_threads_r3.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
