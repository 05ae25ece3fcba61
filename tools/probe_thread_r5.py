"""A/B: caller-thread vs threaded (upload pool + collector) pipelining.

The round-5 roofline (docs/PROFILE_r5.json) showed each dispatch AND
each materialise blocking the caller thread for a tunnel round trip --
together more host time per batch than the batch's device time.  This
probe measures the production paths with the round trips on background
threads (upload pool + collector-thread _Pipeline, the new defaults)
vs the old caller-thread loop, interleaved A/B/A/B in one session.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_thread_r5.py

Writes docs/PROBE_thread_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def unthreaded_epoch(dispatch, bufs, samples, reps, depth=8):
    """The pre-round-5 loop: every round trip on the caller thread."""
    t0 = time.perf_counter()
    pending: list = []
    for _ in range(reps):
        for buf in bufs:
            pending.append(dispatch(buf))
            if len(pending) > depth:
                _ = np.asarray(pending.pop(0))
    for out in pending:
        _ = np.asarray(out)
    return samples * reps / (time.perf_counter() - t0)


def main() -> int:
    from flappie_tpu.cli import enable_persistent_cache, honor_jax_platforms

    honor_jax_platforms()
    enable_persistent_cache()

    import jax

    from bench import build_adc_batches, build_chunk_batches_i16
    from bench_common import pipelined
    from flappie_tpu.basecall import Basecaller, encode_d8

    CHUNK, OVERLAP, CB = 12800, 1600, 128
    B, T = 64, 65536
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, overlap=OVERLAP, chunk_batch=CB)
    adc_batches = build_adc_batches(B, T)
    chunk_i16, samples_owned = build_chunk_batches_i16(caller, adc_batches)
    chunk_d8 = [encode_d8(b) for b in chunk_i16]
    full_i16 = [
        Basecaller.pack_chunk_inputs_i16(
            a, l, np.zeros(B, np.int32), np.zeros(B, np.int32), sc)
        for a, l, sc in adc_batches
    ]
    full_d8 = [encode_d8(b) for b in full_i16]
    samples_full = sum(int(l.sum()) for _, l, _ in adc_batches)
    g4 = [np.concatenate((chunk_d8 * 2)[o:o + 4], axis=0)
          for o in range(0, len(chunk_d8) - 3, 4)][:2]
    s_g4 = samples_owned * len(g4) * 4 // len(chunk_d8)

    paths = {
        "chunked_d8_g4": (lambda b: caller.dispatch_packed_chunk_d8_grouped(b, 4),
                          g4, s_g4),
        "fullread_d8": (caller.dispatch_packed_batch_d8, full_d8, samples_full),
    }
    res: dict = {"backend": jax.default_backend(),
                 "upload_threads_default": os.environ.get(
                     "FLAPPIE_TPU_UPLOAD_THREADS", "(default)")}
    epochs: dict = {}
    for name, (dispatch, bufs, n) in paths.items():
        _ = np.asarray(dispatch(bufs[0]))  # warm
        epochs[name] = {"threaded": [], "caller_thread": []}
    for _rep in range(4):
        for name, (dispatch, bufs, n) in paths.items():
            epochs[name]["threaded"].append(
                pipelined(dispatch, bufs, n, 3,
                          submit=caller._submit_dispatch))
            epochs[name]["caller_thread"].append(
                unthreaded_epoch(dispatch, bufs, n, 3))
        print("#", {k: {m: round(v[-1] / 1e6, 2) for m, v in d.items()}
                    for k, d in epochs.items()}, file=sys.stderr)
    res["msamples_per_s"] = {
        k: {m: {"best": round(max(v) / 1e6, 2),
                "epochs": [round(e / 1e6, 2) for e in v]}
            for m, v in d.items()}
        for k, d in epochs.items()
    }
    out = os.path.join(REPO, "docs", "PROBE_thread_r5.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(f"wrote {out}")
    print(json.dumps(res["msamples_per_s"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
