"""Quantify per-dispatch overhead through the axon tunnel (round 3).

bench.py shows ~160 ms/batch of end-to-end overhead on top of the
83 ms device time.  This probes the overhead's structure with a
depth-8 pipelined dispatch loop over a TRIVIAL device program
(sum -> [B,16] out), varying only the upload payload:

    f32 [128, 12804]   (the real packed chunk batch, 6.6 MB)
    int16 [128, 12804] (half the bytes)
    f32 [128, 1028]    (0.5 MB)
    f32 [8, 132]       (4 KB: the fixed floor)

If per-batch cost scales with bytes, the tunnel's effective bandwidth
is the wall and int16/bf16 packing doubles throughput; if it is flat,
only bigger batches amortise it.

    python tools/probe_dispatch_r3.py [NDISPATCH]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
RESULTS: dict = {}


def main() -> int:
    import jax
    import jax.numpy as jnp

    def probe(label, shape, dtype):
        buf = np.ones(shape, dtype)
        nbytes = buf.nbytes

        @jax.jit
        def prog(x):
            return jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)[
                :16
            ] * jnp.ones((1, 16), jnp.float32)

        _ = np.asarray(prog(jnp.asarray(buf)))  # compile
        best = 1e30
        for _rep in range(3):
            t0 = time.perf_counter()
            pending = []
            for _i in range(N):
                pending.append(prog(jnp.asarray(buf)))
                if len(pending) > 8:
                    _ = np.asarray(pending.pop(0))
            for out in pending:
                _ = np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / N)
        RESULTS[label] = {"ms_per_dispatch": best * 1e3, "mbytes": nbytes / 1e6,
                          "eff_MB_per_s": nbytes / best / 1e6}
        print(f"{label:28s} {best*1e3:8.2f} ms/dispatch "
              f"({nbytes/1e6:6.2f} MB -> {nbytes/best/1e6:6.0f} MB/s eff)",
              flush=True)

    probe("f32 [128,12804] (real)", (128, 12804), np.float32)
    probe("int16 [128,12804]", (128, 12804), np.int16)
    probe("f32 [128,1028]", (128, 1028), np.float32)
    probe("f32 [8,132] (floor)", (8, 132), np.float32)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROBE_dispatch_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
