"""Grouped-dispatch probe: amortise the tunnel's per-dispatch floor.

docs/PROBE_dispatch_r3.json measured a ~31.5 ms fixed floor per
host->device round trip plus ~40-75 MB/s effective upload through the
axon tunnel; the per-batch pipelined e2e rate therefore sits far below
the 83 ms device rate of the chunk program.  This probe A/Bs shipping
G chunk batches as ONE [G*CB, chunk+16] int16 array with the device
running lax.map over the G sub-batches (one round trip, one byte
matrix back) against the per-batch baseline (G=1).

    python tools/probe_group_r3.py
Writes docs/PROBE_group_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax

    from bench import CB, CHUNK, build_adc_batches, build_chunk_batches_i16
    from bench_common import pipelined
    from flappie_tpu.basecall import Basecaller

    B, T = 64, 65536
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, overlap=1600, chunk_batch=CB)
    adc_batches = build_adc_batches(B, T)
    chunk_i16, samples = build_chunk_batches_i16(caller, adc_batches)
    print(f"# backend={jax.default_backend()} nbatches={len(chunk_i16)} "
          f"samples={samples/1e6:.2f}M", flush=True)

    results = {}
    for G in (1, 2, 3, 4, 8):
        bufs = []
        for ofs in range(0, len(chunk_i16) - G + 1, G):
            bufs.append(np.concatenate(chunk_i16[ofs : ofs + G], axis=0))
        n_per = G * CB * CHUNK  # overlap recompute counted as payload here
        dispatch = (caller.dispatch_packed_chunk_i16 if G == 1 else
                    (lambda b: caller.dispatch_packed_chunk_i16_grouped(b, G)))
        t0 = time.perf_counter()
        _ = np.asarray(dispatch(bufs[0]))
        compile_s = time.perf_counter() - t0
        sps = max(pipelined(dispatch, bufs, n_per * len(bufs), 3)
                  for _ in range(3))
        results[f"G={G}"] = {
            "device_Msamples_per_s": round(sps / 1e6, 2),
            "n_dispatches": len(bufs),
            "mbytes_per_dispatch": bufs[0].nbytes / 1e6,
            "compile_s": round(compile_s, 1),
        }
        print(f"G={G}: {sps/1e6:7.2f} Ms/s  ({len(bufs)} dispatches of "
              f"{bufs[0].nbytes/1e6:.1f} MB, compile {compile_s:.0f}s)",
              flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROBE_group_r3.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
