"""Consolidated round-2 TPU measurement: conv impls, decode impls,
chunk-program throughput -- one process, one compile session.

Env-var implementation switches are read at TRACE time, so each
variant gets a FRESH jax.jit wrapper created after setting the env
(reusing a cached jit would silently measure the old trace).

    python tools/bench_round2.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np


def time_it(label, fn, n=6):
    t0 = time.perf_counter()
    out = fn()
    _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn()
        _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main() -> int:
    import jax
    import jax.numpy as jnp

    from flappie_tpu.basecall import Basecaller, _device_basecall_chunk
    from flappie_tpu.models.network import conv_stack, transitions

    CB, CHUNK = 128, 12800
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, chunk_batch=CB)
    cfg, params = caller.cfg, caller.params

    key = jax.random.PRNGKey(0)
    sig = jax.block_until_ready(jax.random.normal(key, (CB, CHUNK), jnp.float32))
    lengths = jnp.full((CB,), CHUNK, jnp.int32)
    qlo = jnp.ones((CB,), jnp.int32)
    qhi = jnp.full((CB,), CHUNK // cfg.total_stride + 1, jnp.int32)

    results = {}

    # -- conv impls ----------------------------------------------------
    for impl in ("xla", "fast"):
        os.environ["FLAPPIE_TPU_CONV_IMPL"] = impl

        @jax.jit
        def conv_only(params, sig, lengths):
            y, nb = conv_stack(params, cfg, sig[..., None], lengths)
            return jnp.sum(y), nb

        results[f"conv_{impl}"] = time_it(f"conv stack [{impl}]",
                                          lambda f=conv_only: f(params, sig, lengths))

    # -- forward (fast conv + fused rnn + head) ------------------------
    os.environ["FLAPPIE_TPU_CONV_IMPL"] = "fast"

    @jax.jit
    def fwd_only(params, sig, lengths):
        trans, nb = transitions(params, cfg, sig, lengths, 1.0, "auto")
        return jnp.sum(trans), nb

    results["fwd"] = time_it("forward [conv=fast]",
                             lambda: fwd_only(params, sig, lengths))

    # -- full chunk program, decode impl A/B ---------------------------
    inner = _device_basecall_chunk.__wrapped__
    for impl in ("scan", "seg"):
        os.environ["FLAPPIE_TPU_CRF_IMPL"] = impl
        fn = jax.jit(
            partial(inner, cfg=cfg, temperature=1.0, viterbi_only=False,
                    compute_trace=False, rnn_impl="auto"),
        )
        results[f"full_{impl}"] = time_it(
            f"full chunk program [decode={impl}]",
            lambda f=fn: f(params, sig, lengths, qlo, qhi),
        )

    conv = results["conv_fast"]
    rnn = results["fwd"] - conv
    for impl in ("scan", "seg"):
        dec = results[f"full_{impl}"] - results["fwd"]
        print(f"[decode={impl}] conv {conv*1e3:.0f} + rnn/head {rnn*1e3:.0f} "
              f"+ decode {dec*1e3:.0f} ms = {results[f'full_{impl}']*1e3:.0f} ms "
              f"-> {CB*CHUNK/results[f'full_{impl}']/1e6:.1f} Ms/s chunk-level",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
