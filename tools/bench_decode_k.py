"""Decode-only sweep at the chunk shape: scan unroll K and seg.

The chunk program's decode (fb posterior + Viterbi + traceback over
T=2560 blocks) is bound by per-iteration dispatch latency; this sweeps
the scan unroll factor and compares the segmented implementation.

    python tools/bench_decode_k.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from flappie_tpu.basecall import _device_decode
    from flappie_tpu.ops import crf

    CB, T = 128, 2560
    nbase, nstate = 4, 8
    nparam = nstate * (nbase + 1)
    trans = jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(0), (CB, T, nparam), jnp.float32, -4.0, 4.0))
    nblocks = jnp.full((CB,), T, jnp.int32)
    inner = _device_decode.__wrapped__

    def run(label, env, K=None):
        if K is not None:
            crf.CRF_TIME_BLOCK = K
        os.environ["FLAPPIE_TPU_CRF_IMPL"] = env
        fn = jax.jit(partial(
            inner, nbase=nbase, nstate=nstate,
            viterbi_only=False, compute_trace=False))
        out = [np.asarray(x) for x in fn(trans, nblocks)]
        t0 = time.perf_counter()
        for _ in range(6):
            out = [np.asarray(x) for x in fn(trans, nblocks)]
        dt = (time.perf_counter() - t0) / 6
        print(f"{label}: {dt*1e3:.1f} ms", flush=True)
        return dt

    for K in (16, 32, 64, 128):
        run(f"scan K={K}", "scan", K)
    run("seg L=128", "seg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
