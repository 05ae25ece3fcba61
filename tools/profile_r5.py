"""Roofline of the default production path (round-4 verdict next #1).

Decomposes where the default CLI configuration's cycles go and why the
chunked grouped path (21.29 Ms/s in BENCH_r04) trails fullread_d8
(24.97).  Two measurement families, interleaved in ONE session so the
tunnel weather is shared:

A. DEVICE time per program: buffers pre-staged on device, N dispatches
   queued, only the LAST output materialised (no per-iter D2H), slope
   (t18 - t6)/12 cancels queue-fill and the fixed tail.  Valid because
   each launch's ~31.5 ms host floor is below every measured program's
   device time (the smallest, the single chunk batch, is ~42 ms).
   Programs: chunk d8 single / grouped G=3 / G=4, fullread d8 single /
   G=3, and the forward-only stage (transitions: d8-unpack + conv +
   RNN + head) for the decode share.

B. END-TO-END pipelined rate (H2D included, host buffers, 8-deep
   pipeline, bench_common.pipelined): chunked_d8 g1 / g3 / g4 and
   fullread_d8 g1, epochs interleaved A/B/A/B.

Also computes the STRUCTURAL overlap-recompute ratio of the chunked
plan on the bench workload (processed samples / owned samples) --
the part of the chunked-vs-fullread gap no kernel can remove.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_r5.py

Writes docs/PROFILE_r5.json.  Reference axis: the two reference hot
loops /root/reference/src/layers.c:979-1026 (GRU step) and
src/decode.c:119-204 (Viterbi) -- here the fused Pallas recurrence and
the batch-minor CRF kernels.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNK, OVERLAP, CB = 12800, 1600, 128
B_FULL, T_FULL = 64, 65536
RESULTS: dict = {}


def stage(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def device_time(dispatch, dev_buf, n_hi=18, n_lo=6, label="", reps=3):
    """Slope-timed device seconds per dispatch (see module docstring).

    The lo/hi pair is measured ``reps`` times INTERLEAVED and the
    per-dispatch slope is taken from the median of each side: a tunnel
    contention burst that lands inside one timing window then shifts
    one sample, not the estimate (the r4 run recorded a *negative*
    fwd-only time from exactly such a burst).
    """

    def run(n):
        outs = [dispatch(dev_buf) for _ in range(n)]
        last = outs[-1]
        del outs
        _ = np.asarray(last if not isinstance(last, tuple) else last[0])

    run(2)  # warm: trace + compile + cache load
    lo_s, hi_s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(n_lo)
        lo_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n_hi)
        hi_s.append(time.perf_counter() - t0)
    t_lo = float(np.median(lo_s))
    t_hi = float(np.median(hi_s))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"# device {label}: {per*1e3:.1f} ms/dispatch "
          f"(med t{n_lo}={t_lo:.2f}s t{n_hi}={t_hi:.2f}s over {reps} reps; "
          f"spread lo {min(lo_s):.2f}-{max(lo_s):.2f} "
          f"hi {min(hi_s):.2f}-{max(hi_s):.2f})", file=sys.stderr)
    return per


def main() -> int:
    from flappie_tpu.cli import enable_persistent_cache, honor_jax_platforms

    honor_jax_platforms()
    enable_persistent_cache()

    import jax

    from bench import build_adc_batches, build_chunk_batches_i16
    from bench_common import pipelined
    from flappie_tpu.basecall import Basecaller, encode_d8
    from flappie_tpu.parallel.chunking import plan_chunks

    RESULTS["backend"] = jax.default_backend()
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, overlap=OVERLAP, chunk_batch=CB)

    # -- workload (same construction as bench.py) -------------------------
    adc_batches = build_adc_batches(B_FULL, T_FULL)
    chunk_i16, samples_owned = build_chunk_batches_i16(caller, adc_batches)
    chunk_d8 = [encode_d8(b) for b in chunk_i16]
    assert all(b is not None for b in chunk_d8)
    full_i16 = [
        Basecaller.pack_chunk_inputs_i16(
            a, l, np.zeros(B_FULL, np.int32), np.zeros(B_FULL, np.int32), sc)
        for a, l, sc in adc_batches
    ]
    full_d8 = [encode_d8(b) for b in full_i16]
    assert all(b is not None for b in full_d8)
    samples_full = sum(int(l.sum()) for _, l, _ in adc_batches)

    # structural recompute: processed chunk samples vs owned samples
    stride = caller.cfg.total_stride
    processed = 0
    for _, lengths, _ in adc_batches:
        for n in lengths:
            plan = plan_chunks(int(n), stride, CHUNK, OVERLAP)
            processed += sum(
                min(plan.chunk, plan.nsample - s) for s in plan.starts)
    RESULTS["structural"] = {
        "owned_samples": samples_full,
        "processed_samples": processed,
        "recompute_ratio": round(processed / samples_full, 4),
        "note": "chunked throughput ceiling = fullread_rate / ratio "
                "(overlap regions are computed twice by design)",
    }
    print(f"# structural recompute ratio: {processed / samples_full:.4f}",
          file=sys.stderr)

    # -- A. device times ---------------------------------------------------
    g3_chunk = np.concatenate(chunk_d8[:3], axis=0)
    g4_chunk = np.concatenate((chunk_d8 * 2)[:4], axis=0)
    g3_full = np.concatenate(full_d8, axis=0)
    dev = {
        "chunk_d8_single": (caller.dispatch_packed_chunk_d8,
                            stage(chunk_d8[0]), CB * CHUNK, 1),
        "chunk_d8_g3": (lambda b: caller.dispatch_packed_chunk_d8_grouped(b, 3),
                        stage(g3_chunk), 3 * CB * CHUNK, 3),
        "chunk_d8_g4": (lambda b: caller.dispatch_packed_chunk_d8_grouped(b, 4),
                        stage(g4_chunk), 4 * CB * CHUNK, 4),
        "full_d8_single": (caller.dispatch_packed_batch_d8,
                           stage(full_d8[0]), B_FULL * T_FULL, 1),
        "full_d8_g3": (lambda b: caller.dispatch_packed_batch_d8_grouped(b, 3),
                       stage(g3_full), 3 * B_FULL * T_FULL, 3),
    }
    # forward-only stage at the chunk shape (f32 signal in, SCALAR
    # out): isolates the network forward so decode share =
    # chunk_total - fwd.  The transitions tensor is reduced to one
    # scalar ON DEVICE -- returning the raw [128, 2560, 40] trans
    # (52 MB) made the final materialise (~1.3-2 s through the
    # tunnel, +-0.3 s weather) swamp the ~0.3 s slope signal, which is
    # how both the r4 and the first r5 run recorded NEGATIVE fwd time.
    import jax
    import jax.numpy as jnp

    from flappie_tpu.basecall import _device_basecall_fwd

    @jax.jit
    def fwd_scalar(params, sig_, len_):
        trans, nblocks = _device_basecall_fwd(
            params, sig_, len_, caller.cfg, 1.0, "auto")
        return jnp.sum(trans) + jnp.sum(nblocks)

    sig = np.random.default_rng(0).normal(
        0, 1, size=(CB, CHUNK)).astype(np.float32)
    lengths = np.full(CB, CHUNK, np.int32)
    sig_dev, len_dev = stage(sig), stage(lengths)

    def fwd_dispatch(_b):
        return fwd_scalar(caller.params, sig_dev, len_dev)

    RESULTS["device_ms"] = {}
    RESULTS["device_msamples_per_s_capacity"] = {}
    for name, (dispatch, buf, cap, _g) in dev.items():
        t = device_time(dispatch, buf, label=name)
        RESULTS["device_ms"][name] = round(t * 1e3, 2)
        RESULTS["device_msamples_per_s_capacity"][name] = round(
            cap / t / 1e6, 2)
    t_fwd = device_time(fwd_dispatch, None, n_hi=18, n_lo=6,
                        label="fwd_only[128x12800]")
    RESULTS["device_ms"]["fwd_only_chunkshape"] = round(t_fwd * 1e3, 2)
    t_single = RESULTS["device_ms"]["chunk_d8_single"]
    RESULTS["decomposition"] = {
        "fwd_share_pct": round(100 * t_fwd * 1e3 / t_single, 1),
        "decode_plus_pack_share_pct": round(
            100 * (1 - t_fwd * 1e3 / t_single), 1),
        "grouped_bubble_g3_pct": round(
            100 * (RESULTS["device_ms"]["chunk_d8_g3"] / (3 * t_single) - 1), 1),
        "grouped_bubble_g4_pct": round(
            100 * (RESULTS["device_ms"]["chunk_d8_g4"] / (4 * t_single) - 1), 1),
        "fullread_grouped_bubble_g3_pct": round(
            100 * (RESULTS["device_ms"]["full_d8_g3"]
                   / (3 * RESULTS["device_ms"]["full_d8_single"]) - 1), 1),
    }

    # -- B. end-to-end pipelined rates, interleaved epochs -----------------
    grouped3 = [np.concatenate(chunk_d8[o:o + 3], axis=0)
                for o in range(0, len(chunk_d8) - 2, 3)]
    grouped4 = [np.concatenate((chunk_d8 * 2)[o:o + 4], axis=0)
                for o in range(0, len(chunk_d8) - 3, 4)][:2]
    s_g3 = samples_owned * len(grouped3) * 3 // len(chunk_d8)
    s_g4 = samples_owned * len(grouped4) * 4 // len(chunk_d8)
    paths = {
        "chunked_d8_g1": (caller.dispatch_packed_chunk_d8, chunk_d8,
                          samples_owned),
        "chunked_d8_g3": (lambda b: caller.dispatch_packed_chunk_d8_grouped(b, 3),
                          grouped3, s_g3),
        "chunked_d8_g4": (lambda b: caller.dispatch_packed_chunk_d8_grouped(b, 4),
                          grouped4, s_g4),
        "fullread_d8_g1": (caller.dispatch_packed_batch_d8, full_d8,
                           samples_full),
    }
    epochs: dict = {k: [] for k in paths}
    for name, (dispatch, bufs, n) in paths.items():  # warm all first
        _ = np.asarray(dispatch(bufs[0]))
    for _rep in range(5):
        for name, (dispatch, bufs, n) in paths.items():
            epochs[name].append(pipelined(dispatch, bufs, n, 3))
        print("# e2e epoch:", {k: round(v[-1] / 1e6, 2)
                               for k, v in epochs.items()}, file=sys.stderr)
    RESULTS["e2e_msamples_per_s"] = {
        k: {"best": round(max(v) / 1e6, 2),
            "median": round(float(np.median(v)) / 1e6, 2),
            "epochs": [round(e / 1e6, 2) for e in v]}
        for k, v in epochs.items()
    }

    out = os.path.join(REPO, "docs", "PROFILE_r5.json")
    with open(out, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    print(f"wrote {out}")
    print(json.dumps(RESULTS["decomposition"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
