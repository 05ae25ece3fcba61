"""Round-3 decode A/B on the real chip: CRF impls at the chunk shape.

The full decode chain (fb posterior: fwd+bwd scans, then Viterbi over
the posterior + traceback) is ~22 ms of the 83 ms chunk program
(docs/SWEEP_chunk_r3.json stages).  Per step the work is tiny
([B, S, S] log-semiring update), so the cost is loop/layout overhead -
this A/Bs the three implementations (scanb batch-minor lax.scan,
pallas VMEM-resident time-grid kernels, seg two-level segmented) plus
the scanb unroll block K, all with the slope protocol (N chained
iterations inside one jitted fori_loop so tunnel round trips cancel).

    python tools/bench_decode_r3.py
Writes docs/BENCH_decode_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RESULTS: dict = {}


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.ops import crf as crf_mod

    B, T = 128, 2560
    nbase = 4
    nparam = 40
    key = jax.random.PRNGKey(0)
    trans = jax.random.uniform(key, (B, T, nparam), jnp.float32, -4.0, 4.0)
    nblocks = jnp.full((B,), T, jnp.int32)

    def measure(label, impl, K=None, viterbi_only=False, n_lo=1, n_hi=5):
        os.environ["FLAPPIE_TPU_CRF_IMPL"] = impl
        oldK = crf_mod.CRF_TIME_BLOCK
        if K is not None:
            crf_mod.CRF_TIME_BLOCK = K

        @jax.jit
        def prog(trans, n):
            def body(i, acc):
                t = trans + acc * 1e-30
                score, path, qpath, _ = crf_mod.crf_decode_fused(
                    t, nblocks, nbase, viterbi_only, False
                )
                return (jnp.sum(score) + jnp.sum(qpath[:, 1:])) * 1e-30

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        try:
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

            per = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
            RESULTS[label] = {
                "ms": per * 1e3,
                "Msamples_per_s_at_stride5": B * T * 5 / per / 1e6,
                "compile_s": t_compile,
            }
            print(f"{label:36s} {per*1e3:8.2f} ms  (compile {t_compile:.0f}s)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 - record failures
            RESULTS[label] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{label:36s} FAILED: {exc}", flush=True)
        finally:
            crf_mod.CRF_TIME_BLOCK = oldK
            os.environ.pop("FLAPPIE_TPU_CRF_IMPL", None)

    measure("fb scanb K=16 (prod)", "scanb")
    measure("fb scanb K=32", "scanb", K=32)
    measure("fb scanb K=64", "scanb", K=64)
    measure("fb pallas", "pallas")
    measure("fb seg", "seg")
    measure("viterbi-only scanb K=16", "scanb", viterbi_only=True)
    measure("viterbi-only pallas", "pallas", viterbi_only=True)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "BENCH_decode_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
