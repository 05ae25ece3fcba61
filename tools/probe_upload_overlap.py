"""A/B the threaded-upload dispatch path against synchronous dispatch.

The round-4 instrumented soak (docs/SOAK_r4.json) caught
FLAPPIE_TPU_UPLOAD_THREADS=2 REGRESSING the warm CLI 5x (collect_wait
69.7s vs 2.4s) under the same tunnel weather that sustained 21 Ms/s on
the dispatch-only path.  This probe reproduces the effect in ONE
process so the mechanism is attributable: the same chunked workload
(packed d8 grouped buffers, the production wire) is pushed through the
real dispatch pipeline with threads=0/1/2, interleaving a simulated
host-side pack cost between dispatches like the CLI does.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_upload_overlap.py

Writes docs/PROBE_upload_overlap_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from flappie_tpu.basecall import Basecaller, _Pipeline, encode_d8

    CHUNK, OVERLAP, CB, G = 12800, 1600, 128, 4
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, overlap=OVERLAP, chunk_batch=CB)
    stride = caller.cfg.total_stride

    from flappie_tpu.io.crp import read_crp

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    rng = np.random.default_rng(0)
    offset, ru = np.float32(16.0), np.float32(1373.41 / 8192.0)
    pa = (adc.astype(np.float32) + offset) * ru
    med = np.float32(np.median(pa))
    mad = np.float32(np.median(np.abs(pa - med)) * 1.4826)

    NBATCH = 12  # 12 batches of CB chunks -> 3 grouped dispatches of G=4
    bufs = []
    for k in range(NBATCH):
        a = np.zeros((CB, CHUNK), np.int16)
        base = np.tile(adc, int(np.ceil(CHUNK / adc.size)))[:CHUNK]
        for j in range(CB):
            a[j] = base + rng.integers(-3, 4, size=CHUNK).astype(np.int16)
        ln = np.full(CB, CHUNK, np.int32)
        qlo = np.zeros(CB, np.int32)
        qhi = np.full(CB, CHUNK // stride, np.int32)
        sc = np.tile(np.array([offset, ru, med, mad], np.float32), (CB, 1))
        b16 = Basecaller.pack_chunk_inputs_i16(a, ln, qlo, qhi, sc)
        b8 = encode_d8(b16)
        assert b8 is not None
        bufs.append(b8)
    grouped = [np.concatenate(bufs[o : o + G], axis=0)
               for o in range(0, NBATCH, G)]
    samples = NBATCH * CB * CHUNK

    # warm the grouped program
    _ = np.asarray(caller.dispatch_packed_chunk_d8_grouped(grouped[0], G))

    def run(nthreads: int, pack_ms: float) -> float:
        os.environ["FLAPPIE_TPU_UPLOAD_THREADS"] = str(nthreads)
        caller._upload_pool = None  # fresh pool per config
        outs = []
        pipe = _Pipeline(lambda tag, out: outs.append(out[0, 0]))
        t0 = time.perf_counter()
        for k, buf in enumerate(grouped):
            if pack_ms:
                # simulated host-side pack/encode between dispatches
                t_busy = time.perf_counter() + pack_ms / 1e3
                while time.perf_counter() < t_busy:
                    pass
            pipe.push(k, caller._submit_dispatch(
                caller.dispatch_packed_chunk_d8_grouped, buf, G))
        pipe.drain()
        dt = time.perf_counter() - t0
        os.environ.pop("FLAPPIE_TPU_UPLOAD_THREADS", None)
        assert len(outs) == len(grouped)
        return samples / dt

    results = {"samples_per_dispatch_run": samples, "groups": len(grouped)}
    for pack_ms in (0.0, 100.0):
        for nthreads in (0, 1, 2):
            best = max(run(nthreads, pack_ms) for _ in range(3))
            key = f"threads={nthreads},pack_ms={int(pack_ms)}"
            results[key] = {"samples_per_s": round(best, 1)}
            print(f"{key}: {best/1e6:7.2f} Msamples/s", flush=True)

    out = os.path.join(REPO, "docs", "PROBE_upload_overlap_r4.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
