"""Chip-contention probe: time a known-cost matmul loop.

The bench chip is time-shared behind the axon tunnel; absolute
measurements are only comparable at similar contention.  This probe
times 100 chained [4096,4096] f32 matmuls (~13.7 TFLOP): on an idle
v5e (~90 TFLOP/s f32-via-bf16x3... measured idle reference ~0.16 s)
the loop is compute-bound, so elapsed/idle-reference estimates the
current contention factor.

    python tools/chip_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

IDLE_REF_S = None  # fill in once measured on a quiet chip


def main() -> int:
    import jax
    import jax.numpy as jnp

    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.float32))

    @jax.jit
    def loop(x):
        def body(i, a):
            return a @ x * 1e-3
        return jax.lax.fori_loop(0, 100, body, x).sum()

    _ = np.asarray(loop(x))  # compile
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(loop(x))
        times.append(time.perf_counter() - t0)
    best = min(times)
    tflops = 100 * 2 * 4096**3 / best / 1e12
    print(f"probe: {best*1e3:.0f} ms best-of-3 -> {tflops:.1f} TFLOP/s "
          f"(times {[round(t*1e3) for t in times]})")
    if IDLE_REF_S:
        print(f"contention factor ~ {best / IDLE_REF_S:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
