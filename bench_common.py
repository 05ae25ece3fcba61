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
    depth: int = 8,
) -> float:
    """Deep-pipelined epoch over packed dispatch buffers: keep `depth`
    batches in flight before materialising (a depth-1 queue stalls on
    the device-launch round trip, which through the axon tunnel reaches
    ~100+ ms per cycle).  Returns samples/s."""
    t0 = time.perf_counter()
    pending: list = []
    for _ in range(reps):
        for buf in bufs:
            pending.append(dispatch(buf))
            if len(pending) > depth:
                _ = np.asarray(pending.pop(0))
    for out in pending:
        _ = np.asarray(out)
    return samples * reps / (time.perf_counter() - t0)
