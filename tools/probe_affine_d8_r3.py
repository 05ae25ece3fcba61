"""Round-3 session-4 probe: in-kernel high3 affine + d8 upload wire.

Three measurements in one chip session (the compile service queues, so
consolidating beats separate processes):

1. d8 decode bit-parity on the real TPU: encode_d8(host) ->
   _decode_d8(device) must reproduce the i16 buffer bit for bit
   (pins the int8->int32/int16 bitcast byte order on the hardware).
2. Chunk-program device time (slope protocol) for the r941 production
   geometry with the NEW default (in-kernel block affine lowered as
   the manual 3-pass bf16x3 'high3' tier instead of the old HIGHEST
   clamp), plus a MATMUL_PRECISION=highest control that restores the
   6-pass affine.
3. End-to-end dispatch A/B through the tunnel: chunked i16 vs d8
   wires (and grouped G=3 variants), pipelined depth 8, best of 5
   epochs (the tunnel swings +-40%).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_affine_d8_r3.py
Writes docs/PROBE_affine_d8_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS: dict = {}


def part1_d8_decode_bitparity():
    import jax
    import jax.numpy as jnp

    from flappie_tpu.basecall import Basecaller, _decode_d8, encode_d8
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.preprocess import F32

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    B, T = 8, 4096
    rows = np.stack([adc[i * 101 : i * 101 + T] for i in range(B)])
    lengths = np.array([T, T - 1, T // 2, 7, T, T - 300, T, T - 33], np.int32)
    for j, L in enumerate(lengths):
        rows[j, L:] = 0
    scal = np.zeros((B, 4), np.float32)
    scal[:, 0] = F32(16.0)
    scal[:, 1] = F32(1373.41) / F32(8192.0)
    scal[:, 2] = 100.0
    scal[:, 3] = 7.0
    zeros = np.zeros(B, np.int32)
    buf16 = Basecaller.pack_chunk_inputs_i16(rows, lengths, zeros, zeros, scal)
    b8 = encode_d8(buf16)
    out = np.asarray(jax.jit(_decode_d8)(jnp.asarray(b8)))
    ok = bool(np.array_equal(out, buf16))
    RESULTS["d8_decode_bit_parity_on_tpu"] = ok
    print(f"d8 decode bit parity on TPU: {ok}", flush=True)
    if not ok:
        bad = np.nonzero(out != buf16)
        print("  first mismatches:", bad[0][:5], bad[1][:5],
              out[bad][:5], buf16[bad][:5], flush=True)


def part2_chunk_program(label, env=None):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.basecall import _device_basecall_chunk
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.params import init_synthetic
    import flappie_tpu.ops.precision as prec

    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    # precision module caches the env at import; re-apply explicitly
    prec.set_ff_precision(os.environ.get("FLAPPIE_TPU_MATMUL_PRECISION", "high"))

    try:
        chunk, CB = 12800, 128
        cfg = get_model_config("r941_native")
        params = jax.tree.map(jnp.asarray, init_synthetic(cfg, seed=0))
        key = jax.random.PRNGKey(0)
        sig = jax.random.normal(key, (CB, chunk), jnp.float32)
        lengths = jnp.full((CB,), chunk, jnp.int32)
        qlo = jnp.ones((CB,), jnp.int32)
        qhi = jnp.full((CB,), chunk // cfg.total_stride + 1, jnp.int32)
        inner = _device_basecall_chunk.__wrapped__

        @jax.jit
        def prog(params, sig, n):
            def body(i, acc):
                s = sig + acc * 1e-30
                score, path, qc, nb, _tr = inner(
                    params, s, lengths, qlo, qhi, cfg, 1.0, False, False,
                    "auto")
                return (jnp.sum(score)
                        + jnp.sum(path.astype(jnp.float32))) * 1e-30

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        np.asarray(prog(params, sig, 1))
        t_compile = time.perf_counter() - t0

        def run(n, reps=3):
            best = 1e30
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(prog(params, sig, n))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (run(5) - run(1)) / 4
        RESULTS[label] = {
            "ms": per * 1e3,
            "Msamples_per_s": CB * chunk / per / 1e6,
            "compile_s": t_compile,
        }
        print(f"{label:44s} {per*1e3:8.2f} ms  "
              f"{CB*chunk/per/1e6:7.2f} Ms/s  (compile {t_compile:.0f}s)",
              flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        prec.set_ff_precision(
            os.environ.get("FLAPPIE_TPU_MATMUL_PRECISION", "high"))


def part3_dispatch_ab():
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import CB, CHUNK, build_adc_batches, build_chunk_batches_i16
    from bench_common import pipelined

    from flappie_tpu.basecall import Basecaller, encode_d8

    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        viterbi_only=False, chunk=CHUNK, overlap=1600,
                        chunk_batch=CB)
    adc_batches = build_adc_batches(64, 65536)
    chunk_i16, samples = build_chunk_batches_i16(caller, adc_batches)
    chunk_d8 = [encode_d8(b) for b in chunk_i16]
    assert all(b is not None for b in chunk_d8)
    G = 3
    g_i16 = [np.concatenate(chunk_i16[o : o + G], axis=0)
             for o in range(0, len(chunk_i16) - G + 1, G)]
    g_d8 = [np.concatenate(chunk_d8[o : o + G], axis=0)
            for o in range(0, len(chunk_d8) - G + 1, G)]
    mb_i16 = sum(b.nbytes for b in chunk_i16) / 1e6
    mb_d8 = sum(b.nbytes for b in chunk_d8) / 1e6
    print(f"wire bytes per epoch: i16 {mb_i16:.1f} MB, d8 {mb_d8:.1f} MB "
          f"({mb_d8/mb_i16:.2f}x)", flush=True)
    RESULTS["wire_MB_i16"] = mb_i16
    RESULTS["wire_MB_d8"] = mb_d8

    # byte-identity of outputs on the chip, once
    o16 = np.asarray(caller.dispatch_packed_chunk_i16(chunk_i16[0]))
    od8 = np.asarray(caller.dispatch_packed_chunk_d8(chunk_d8[0]))
    RESULTS["d8_output_bytes_identical"] = bool(np.array_equal(o16, od8))
    print(f"d8 vs i16 output bytes identical: "
          f"{RESULTS['d8_output_bytes_identical']}", flush=True)

    paths = {
        "chunked_i16": (caller.dispatch_packed_chunk_i16, chunk_i16, samples),
        "chunked_d8": (caller.dispatch_packed_chunk_d8, chunk_d8, samples),
        "chunked_i16_g3": (
            lambda b: caller.dispatch_packed_chunk_i16_grouped(b, G),
            g_i16, samples * len(g_i16) * G // len(chunk_i16)),
        "chunked_d8_g3": (
            lambda b: caller.dispatch_packed_chunk_d8_grouped(b, G),
            g_d8, samples * len(g_d8) * G // len(chunk_d8)),
    }
    for name, (dispatch, bufs, n) in paths.items():
        _ = np.asarray(dispatch(bufs[0]))  # warm up
        es = [pipelined(dispatch, bufs, n, 3) for _ in range(5)]
        RESULTS[f"e2e_{name}_Msps"] = [round(e / 1e6, 2) for e in es]
        print(f"e2e {name:16s} epochs {[round(e/1e6,2) for e in es]} Ms/s",
              flush=True)


def main() -> int:
    part1_d8_decode_bitparity()
    part2_chunk_program("chunk program, high3 affine (new default)")
    part2_chunk_program("chunk program, HIGHEST affine (control)",
                        env={"FLAPPIE_TPU_MATMUL_PRECISION": "highest"})
    part3_dispatch_ab()
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROBE_affine_d8_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
