"""Round-2c TPU measurement: batch-minor decode + single-dot conv.

    python tools/bench_round2c.py
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

    from flappie_tpu.basecall import Basecaller, _device_basecall_chunk, _device_decode
    from flappie_tpu.models.network import conv_stack, transitions

    CB, CHUNK = 128, 12800
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, chunk_batch=CB)
    cfg, params = caller.cfg, caller.params
    T = CHUNK // cfg.total_stride

    sig = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (CB, CHUNK), jnp.float32))
    lengths = jnp.full((CB,), CHUNK, jnp.int32)
    qlo = jnp.ones((CB,), jnp.int32)
    qhi = jnp.full((CB,), T + 1, jnp.int32)
    trans = jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(1), (CB, T, 40), jnp.float32, -4.0, 4.0))
    nblocks = jnp.full((CB,), T, jnp.int32)

    # decode-only: scanb
    inner = _device_decode.__wrapped__
    os.environ["FLAPPIE_TPU_CRF_IMPL"] = "scanb"
    dec = jax.jit(partial(inner, nbase=4, nstate=8,
                          viterbi_only=False, compute_trace=False))
    time_it("decode-only [scanb]", lambda: dec(trans, nblocks))

    # conv: new single-dot fast vs xla
    for impl in ("fast", "xla"):
        os.environ["FLAPPIE_TPU_CONV_IMPL"] = impl

        @jax.jit
        def conv_only(params, sig, lengths):
            y, nb = conv_stack(params, cfg, sig[..., None], lengths)
            return jnp.sum(y), nb

        time_it(f"conv [{impl}]", lambda f=conv_only: f(params, sig, lengths))

    # full chunk program, auto everything (conv fast + scanb decode)
    os.environ["FLAPPIE_TPU_CONV_IMPL"] = "fast"
    full = jax.jit(partial(_device_basecall_chunk.__wrapped__,
                           cfg=cfg, temperature=1.0, viterbi_only=False,
                           compute_trace=False, rnn_impl="auto"))
    dt = time_it("full chunk [conv=fast decode=scanb]",
                 lambda: full(params, sig, lengths, qlo, qhi))
    print(f"-> {CB*CHUNK/dt/1e6:.1f} Ms/s chunk-level, "
          f"{CB*(CHUNK-1600)/dt/1e6:.1f} Ms/s read-level-ish", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
