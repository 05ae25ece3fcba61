"""Measure tunnel RPC concurrency: do parallel H2D/D2H round trips overlap?

The round-5 roofline (docs/PROFILE_r5.json) showed the default path's
e2e gap is host round trips: every dispatch (H2D + launch) and every
materialise (device wait + D2H) blocks its thread for a tunnel round
trip.  One upload thread + one collector thread (the shipped defaults)
move those off the caller, but each side is still SERIAL within its
thread.  Whether adding threads helps depends on whether the tunnel
multiplexes concurrent RPCs or serialises them on one connection —
this probe measures that directly:

  - H2D: upload K distinct buffers serially vs from K threads
  - D2H: materialise K distinct device buffers serially vs K threads
  - dispatch: launch K compiled programs serially vs K threads

speedup ~K  => the tunnel multiplexes; more pipeline threads are real
speedup ~1  => one connection serialises everything; threads only help
               by overlapping with host compute, not with each other

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_tunnel_concurrency_r5.py

Writes docs/PROBE_tunnel_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 4
MB = 4  # payload per buffer
REPS = 5


def timed(fn) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend(), "k": K,
           "payload_mb": MB, "reps": REPS, "timing": "best-of-reps"}
    rng = np.random.default_rng(0)
    host_bufs = [rng.standard_normal(MB * 131072).astype(np.float32)
                 for _ in range(K)]
    pool = ThreadPoolExecutor(K)

    # warm
    dev = [jnp.asarray(b) for b in host_bufs]
    _ = [np.asarray(d) for d in dev]

    # -- H2D ----------------------------------------------------------
    def h2d_serial():
        done = [jnp.asarray(b) for b in host_bufs]
        jax.block_until_ready(done)

    def h2d_threads():
        futs = [pool.submit(jnp.asarray, b) for b in host_bufs]
        jax.block_until_ready([f.result() for f in futs])

    t_ser = timed(h2d_serial)
    t_par = timed(h2d_threads)
    out["h2d"] = {"serial_s": round(t_ser, 4), "threads_s": round(t_par, 4),
                  "speedup": round(t_ser / t_par, 2)}

    # D2H has no standalone section: a jax.Array caches its host copy
    # after the first materialise, so repeated np.asarray of the same
    # buffer times nothing.  The dispatch_roundtrip section below
    # produces a FRESH device output per call and materialises it, so
    # it measures launch + device wait + D2H together -- the shape the
    # collector thread actually resolves.

    # -- dispatch (compiled matmul launch + result) -------------------
    x = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))
    f = jax.jit(lambda a: a @ a)
    _ = np.asarray(f(x))  # compile

    def disp_serial():
        _ = [np.asarray(f(x)) for _ in range(K)]

    def disp_threads():
        futs = [pool.submit(lambda: np.asarray(f(x))) for _ in range(K)]
        _ = [r.result() for r in futs]

    t_ser = timed(disp_serial)
    t_par = timed(disp_threads)
    out["dispatch_roundtrip"] = {
        "serial_s": round(t_ser, 4), "threads_s": round(t_par, 4),
        "speedup": round(t_ser / t_par, 2)}

    print(json.dumps(out, indent=1))
    path = os.path.join(REPO, "docs", "PROBE_tunnel_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
