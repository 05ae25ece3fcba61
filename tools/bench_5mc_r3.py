"""Round-3 5mC (stride-2 GRU-mod) device bench — VERDICT item 6.

The 5mC model (r941_5mC: stride 2, five GRU-mod layers, 40-state CRF)
emits one CRF block per 2 samples vs r941's 5, so at EQUAL per-block
cost its samples/s ceiling is 40% of r941's — that structural bound is
what this artifact documents, along with the measured per-block rate
for both models and a stride-2 chunk-geometry A/B.

Timed with the slope protocol (N iterations inside one jitted
fori_loop with forced data dependencies) so tunnel round trips cancel.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_5mc_r3.py
Writes docs/BENCH_5mc_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS: dict = {}


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.basecall import _device_basecall_chunk
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.params import init_synthetic

    key = jax.random.PRNGKey(0)

    def measure(label, model, chunk, CB, stream="f32", n_lo=1, n_hi=5):
        os.environ["FLAPPIE_TPU_RNN_STREAM"] = stream
        cfg = get_model_config(model)
        params = jax.tree.map(jnp.asarray, init_synthetic(cfg, seed=0))
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

        per = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
        blocks = CB * (chunk // cfg.total_stride)
        RESULTS[label] = {
            "ms": per * 1e3,
            "Msamples_per_s": CB * chunk / per / 1e6,
            "Mblocks_per_s": blocks / per / 1e6,
            "stride": cfg.total_stride,
            "compile_s": t_compile,
        }
        print(f"{label:44s} {per*1e3:8.2f} ms  "
              f"{CB*chunk/per/1e6:7.2f} Ms/s  {blocks/per/1e6:6.2f} Mblk/s"
              f"  (compile {t_compile:.0f}s)", flush=True)
        os.environ["FLAPPIE_TPU_RNN_STREAM"] = "f32"

    # r941 reference point (stride 5) and the 5mC grid (stride 2):
    # same 2,560 serial blocks per chunk at the default geometry.
    measure("r941  chunk=12800 CB=128 f32", "r941_native", 12800, 128)
    measure("5mC   chunk=5120  CB=128 f32 (default)", "r941_5mC", 5120, 128)
    measure("5mC   chunk=5120  CB=256 f32", "r941_5mC", 5120, 256)
    measure("5mC   chunk=10240 CB=128 f32", "r941_5mC", 10240, 128)
    measure("5mC   chunk=5120  CB=128 bf16", "r941_5mC", 5120, 128, stream="bf16")
    measure("5mC   chunk=10240 CB=128 bf16", "r941_5mC", 10240, 128, stream="bf16")

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "BENCH_5mc_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
