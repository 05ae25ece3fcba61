"""Shared benchmark methodology for bench.py and bench_scaling.py.

One implementation of fixture-derived batch construction and the
pipelined (materialise-one-behind) timed epoch, so the two benchmarks
stay comparable and timing fixes apply once.
"""

from __future__ import annotations

import time
from typing import Callable, List, Sequence, Tuple

import numpy as np

FIXTURE = "/root/reference/src/test/normalised_signal.crp"


def build_batches(
    B: int, T: int, n_batches: int = 3, seed: int = 0, max_trim: int = 5000
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Batches of real signal, tiled and jittered so no two batches are
    identical (device-side caching cannot shortcut the work)."""
    from flappie_tpu.io.crp import read_crp

    sig = read_crp(FIXTURE).reshape(-1)
    rng = np.random.default_rng(seed)
    row = np.tile(sig, int(np.ceil(T / sig.size)))[:T]
    batches = []
    for _ in range(n_batches):
        batch = np.tile(row, (B, 1)) + rng.normal(0, 0.05, size=(B, T)).astype(
            np.float32
        )
        lengths = (T - rng.integers(0, min(max_trim, T // 2), size=B)).astype(
            np.int32
        )
        batches.append((batch.astype(np.float32), lengths))
    return batches


def pipelined(
    dispatch: Callable, bufs: Sequence[np.ndarray], samples: int, reps: int,
    depth: int = 8, submit: Callable | None = None,
) -> float:
    """Deep-pipelined epoch over packed dispatch buffers, through the
    SAME machinery the production pipeline uses: the _Pipeline queue
    (collector thread resolves device waits + D2H off the caller
    thread) and, when ``submit`` is given (Basecaller._submit_dispatch),
    the upload pool for the blocking H2D round trips.  The round-5
    roofline (docs/PROFILE_r5.json) showed the caller thread's
    dispatch+materialise round trips costing more than the device time
    per batch -- a bench that serialises them measures the tunnel, not
    the product.  Returns samples/s."""
    from flappie_tpu.basecall import _Pipeline

    pipe = _Pipeline(lambda tag, out: None, depth=depth)
    t0 = time.perf_counter()
    for _ in range(reps):
        for buf in bufs:
            pipe.push(None, submit(dispatch, buf) if submit else dispatch(buf))
    pipe.drain()
    return samples * reps / (time.perf_counter() - t0)
