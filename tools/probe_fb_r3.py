"""Fused fwd||bwd decode-scan A/B on the real chip (slope-timed).

The fb posterior runs alpha (forward) and beta (backward) as two
serial Pallas passes; fwdbwd_states_pallas interleaves the two
independent chains in ONE kernel (bit-identical per-chain math).
Measures the fb decode chain at [128, 2560] and the full r941 chunk
program under FLAPPIE_TPU_SCANB_FB=fused vs split, plus output
byte-identity.  Writes docs/PROBE_fb_r3.json.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fb_r3.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS: dict = {}


def measure_decode(label):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.ops import crf as crf_mod

    B, T, nparam, nbase = 128, 2560, 40, 4
    key = jax.random.PRNGKey(0)
    trans = jax.random.uniform(key, (B, T, nparam), jnp.float32, -4.0, 4.0)
    nblocks = jnp.full((B,), T, jnp.int32)

    @jax.jit
    def prog(trans, n):
        def body(i, acc):
            t2 = trans + acc * 1e-30
            post = crf_mod.crf_transpost(t2, nblocks, nbase)
            score, path, qpath = crf_mod.crf_viterbi(post, nblocks, nbase)
            return (jnp.sum(score) + jnp.sum(path.astype(jnp.float32))) * 1e-30

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    np.asarray(prog(trans, 1))
    t_compile = time.perf_counter() - t0

    def run(n, reps=3):
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(prog(trans, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(5) - run(1)) / 4
    RESULTS[label] = {"ms": per * 1e3, "compile_s": t_compile}
    print(f"{label:44s} {per*1e3:8.2f} ms  (compile {t_compile:.0f}s)",
          flush=True)


def chunk_program(label):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.basecall import _device_basecall_chunk
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.params import init_synthetic

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
                params, s, lengths, qlo, qhi, cfg, 1.0, False, False, "auto")
            return (jnp.sum(score) + jnp.sum(path.astype(jnp.float32))) * 1e-30

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
    print(f"{label:44s} {per*1e3:8.2f} ms  {CB*chunk/per/1e6:7.2f} Ms/s  "
          f"(compile {t_compile:.0f}s)", flush=True)

    score, path, qc, nb, _tr = jax.jit(
        lambda p, s: inner(p, s, lengths, qlo, qhi, cfg, 1.0, False, False,
                           "auto")
    )(params, sig)
    return np.asarray(path), np.asarray(qc), np.asarray(score)


def main() -> int:
    os.environ["FLAPPIE_TPU_SCANB_FB"] = "split"
    measure_decode("fb decode chain, split fwd/bwd (control)")
    p0, q0, s0 = chunk_program("chunk program, split fwd/bwd (control)")
    os.environ["FLAPPIE_TPU_SCANB_FB"] = "fused"
    measure_decode("fb decode chain, fused fwd||bwd")
    p1, q1, s1 = chunk_program("chunk program, fused fwd||bwd")

    same = bool(np.array_equal(p0, p1) and np.array_equal(q0, q1)
                and np.array_equal(s0, s1))
    RESULTS["fused_split_chunk_outputs_identical"] = same
    print(f"fused/split chunk outputs identical: {same}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROBE_fb_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
