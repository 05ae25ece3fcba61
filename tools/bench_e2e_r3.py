"""Round-3 end-to-end A/B of the chunk program on the real chip.

Variants: conv impl (fast channels-major vs xla lax.conv — the conv
profiler shows lax.conv now wins 5x at chunk shapes), rnn stream
(f32 parity vs bf16 speed mode), chunk-batch size.  All timed with the
slope protocol (N iterations inside one jitted fori_loop, forced
data dependency between iterations) so tunnel round trips cancel.

    python tools/bench_e2e_r3.py
Writes docs/BENCH_e2e_r3.json.
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

    from flappie_tpu.basecall import (
        _device_basecall_chunk,
        _device_basecall_fwd,
        Basecaller,
    )
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.params import init_synthetic

    cfg = get_model_config("r941_native")
    params = jax.tree.map(jnp.asarray, init_synthetic(cfg, seed=0))
    CHUNK = 12800
    key = jax.random.PRNGKey(0)

    def measure(label, conv, stream, CB, fwd_only=False, n_lo=1, n_hi=5):
        os.environ["FLAPPIE_TPU_CONV_IMPL"] = conv
        os.environ["FLAPPIE_TPU_RNN_STREAM"] = stream
        sig = jax.random.normal(key, (CB, CHUNK), jnp.float32)
        lengths = jnp.full((CB,), CHUNK, jnp.int32)
        qlo = jnp.ones((CB,), jnp.int32)
        qhi = jnp.full((CB,), CHUNK // cfg.total_stride + 1, jnp.int32)
        inner_chunk = _device_basecall_chunk.__wrapped__
        inner_fwd = _device_basecall_fwd.__wrapped__

        @jax.jit
        def prog(params, sig, n):
            def body(i, acc):
                s = sig + acc * 1e-30  # force per-iteration dependency
                if fwd_only:
                    trans, nb = inner_fwd(params, s, lengths, cfg, 1.0, "auto")
                    return jnp.sum(trans) * 1e-30
                score, path, qc, nb, _tr = inner_chunk(
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
        ms_per_sample = per / (CB * CHUNK)
        RESULTS[label] = {
            "ms": per * 1e3,
            "Msamples_per_s": CB * CHUNK / per / 1e6,
            "compile_s": t_compile,
        }
        print(f"{label:44s} {per*1e3:8.2f} ms  "
              f"{CB*CHUNK/per/1e6:7.2f} Ms/s  (compile {t_compile:.0f}s)",
              flush=True)
        os.environ.pop("FLAPPIE_TPU_CONV_IMPL", None)
        os.environ["FLAPPIE_TPU_RNN_STREAM"] = "f32"
        return per

    measure("chunk CB128 conv=fast rnn=f32 (r2 prod)", "fast", "f32", 128)
    measure("chunk CB128 conv=xla rnn=f32", "xla", "f32", 128)
    measure("fwd   CB128 conv=xla rnn=f32", "xla", "f32", 128, fwd_only=True)
    measure("chunk CB128 conv=xla rnn=bf16", "xla", "bf16", 128)
    measure("chunk CB256 conv=xla rnn=f32", "xla", "f32", 256)
    measure("chunk CB256 conv=xla rnn=bf16", "xla", "bf16", 256)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "BENCH_e2e_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
