"""Microbench: CRF decode (fb posterior + Viterbi + traceback) on TPU.

Times _device_decode at the production bench shape for a chosen
implementation:

    FLAPPIE_TPU_CRF_IMPL=scan python tools/bench_decode.py
    FLAPPIE_TPU_CRF_IMPL=seg  python tools/bench_decode.py

Inputs are generated on device (the axon tunnel uploads at
O(100 MB/s); a [64, 13107, 40] f32 batch is 134 MB).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from flappie_tpu.basecall import _device_decode

    B = int(os.environ.get("BENCH_B", "64"))
    T = int(os.environ.get("BENCH_T", "13107"))  # blocks (65536 samples / 5)
    nbase, nstate = 4, 8
    nparam = nstate * (nbase + 1)

    key = jax.random.PRNGKey(0)
    trans = jax.random.uniform(key, (B, T, nparam), jnp.float32, -4.0, 4.0)
    trans = jax.block_until_ready(trans)
    nblocks = jnp.full((B,), T, jnp.int32)

    impl = os.environ.get("FLAPPIE_TPU_CRF_IMPL", "auto")

    def run():
        out = _device_decode(trans, nblocks, nbase, nstate, False, False)
        # materialise the small outputs (block_until_ready is unreliable
        # through the axon relay)
        return [np.asarray(x) for x in out]

    t0 = time.perf_counter()
    run()
    print(f"impl={impl} B={B} T={T} compile+first: {time.perf_counter()-t0:.1f}s")

    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(f"impl={impl} decode: {dt*1e3:.1f} ms/batch "
          f"({B*T*5/dt/1e6:.1f} Msamples/s decode-only)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
