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


def pipelined_epoch(
    dispatch: Callable, batches: Sequence[Tuple[np.ndarray, np.ndarray]], iters: int,
    depth: int = 4,
) -> float:
    """Dispatch `depth` batches ahead of materialisation; returns
    samples/s.  A depth-1 queue stalls on the device-launch round trip
    (through the axon tunnel: ~100+ ms per cycle)."""
    t0 = time.perf_counter()
    total = 0
    pending = []
    for i in range(iters):
        batch, lengths = batches[i % len(batches)]
        pending.append(dispatch(batch, lengths))
        if len(pending) > depth:
            _ = [np.asarray(x) for x in pending.pop(0)]
        total += int(lengths.sum())
    for out in pending:
        _ = [np.asarray(x) for x in out]
    return total / (time.perf_counter() - t0)
