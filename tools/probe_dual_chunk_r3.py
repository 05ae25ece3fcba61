"""Chunk-program A/B for the dual-chain recurrence (slope-timed).

Measures the full r941 [128, 12800] chunk program with
FLAPPIE_TPU_RNN_DUAL=off vs on, plus byte-identity of the packed
output.  Appends to docs/PROBE_dual_r3.json.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dual_chunk_r3.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def chunk_program(label, results):
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
    results[label] = {
        "ms": per * 1e3,
        "Msamples_per_s": CB * chunk / per / 1e6,
        "compile_s": t_compile,
    }
    print(f"{label:44s} {per*1e3:8.2f} ms  {CB*chunk/per/1e6:7.2f} Ms/s  "
          f"(compile {t_compile:.0f}s)", flush=True)

    # one concrete output for byte-identity across variants
    score, path, qc, nb, _tr = jax.jit(
        lambda p, s: inner(p, s, lengths, qlo, qhi, cfg, 1.0, False, False,
                           "auto")
    )(params, sig)
    return np.asarray(path), np.asarray(qc), np.asarray(score)


def main() -> int:
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "PROBE_dual_r3.json")
    with open(out_path) as f:
        results = json.load(f)

    os.environ["FLAPPIE_TPU_RNN_DUAL"] = "off"
    p0, q0, s0 = chunk_program("chunk program, dual=off", results)
    os.environ["FLAPPIE_TPU_RNN_DUAL"] = "on"
    p1, q1, s1 = chunk_program("chunk program, dual=on", results)

    same = bool(np.array_equal(p0, p1) and np.array_equal(q0, q1)
                and np.array_equal(s0, s1))
    results["dual_chunk_outputs_identical"] = same
    print(f"dual on/off chunk outputs identical: {same}", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out_path)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
