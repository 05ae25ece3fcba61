"""Chunked training data pipeline.

The reference has no training; its weights come from ONT's taiyaki,
whose data model is "mapped reads": raw signal plus a per-block
reference alignment.  This pipeline mirrors the *inference* chunk
geometry (parallel/chunking.py) on the training side: long
(signal, block-path) pairs are cut into fixed-size signal chunks with
their aligned target base sub-sequences, then shuffled into
static-shape batches for the jitted CTC step (train/ctc.py).

Chunk boundaries reset the flip/flop parity (each chunk's targets are
re-encoded independently with flipflop_encode) -- the standard chunked
CTC training setup for this model family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from .ctc import flipflop_encode

F32 = np.float32


def path_to_bases(path: np.ndarray, nblocks: int, nbase: int) -> np.ndarray:
    """Collapse a block state path into the base sequence it calls.

    Same semantics as the decoder's change_positions + base_lookup
    (src/decode.c:66-79, src/flappie.c:284-297): a base is emitted at
    every position in [1, nblocks) where the state changes, read as
    state % nbase.
    """
    p = np.asarray(path)[:nblocks]
    change = np.nonzero(p[1:] != p[:-1])[0] + 1
    return (p[change] % nbase).astype(np.int32)


@dataclass(frozen=True)
class ChunkExample:
    signal: np.ndarray  # [<=chunk] float32
    bases: np.ndarray  # [<=Lmax] int32 target bases


def chunk_examples(
    signal: np.ndarray,
    block_path: np.ndarray,
    stride: int,
    chunk: int,
    nbase: int = 4,
    min_bases: int = 2,
) -> List[ChunkExample]:
    """Cut one mapped read into non-overlapping training chunks."""
    chunk -= chunk % stride
    out = []
    n = signal.shape[0]
    for s in range(0, n, chunk):
        sig = np.asarray(signal[s : s + chunk], F32)
        nblk = -(-sig.shape[0] // stride)
        g0 = s // stride
        bases = path_to_bases(block_path[g0 : g0 + nblk + 1], nblk + 1, nbase)
        if bases.size >= min_bases and sig.size >= stride * min_bases:
            out.append(ChunkExample(sig, bases))
    return out


def batches(
    examples: Sequence[ChunkExample],
    chunk: int,
    batch: int,
    nbase: int = 4,
    seed: int = 0,
    epochs: int = 1,
    drop_last: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Shuffled static-shape batches: (signal [B, chunk], lengths [B],
    states [B, L] flip-flop codes, target_lengths [B]).

    L is fixed at the dataset-wide maximum so every batch compiles to
    one program shape.
    """
    if not examples:
        return
    L = max(e.bases.size for e in examples)
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng.permutation(len(examples))
        for ofs in range(0, len(order), batch):
            sel = order[ofs : ofs + batch]
            if drop_last and sel.size < batch:
                continue
            B = batch
            sig = np.zeros((B, chunk), F32)
            lengths = np.zeros(B, np.int32)
            targets = np.zeros((B, L), np.int32)
            tlen = np.ones(B, np.int32)  # padded rows: 1 dummy base
            for j, i in enumerate(sel):
                e = examples[i]
                sig[j, : e.signal.size] = e.signal
                lengths[j] = e.signal.size
                targets[j, : e.bases.size] = e.bases
                tlen[j] = e.bases.size
            states = flipflop_encode(targets, tlen, nbase)
            yield sig, lengths, states.astype(np.int32), tlen


def teacher_dataset(
    cfg,
    teacher_params,
    n_reads: int,
    read_len: int,
    chunk: int,
    seed: int = 0,
):
    """Synthetic-teacher mapped reads: random signals labelled by the
    teacher's own Viterbi paths (self-consistent targets a student can
    converge to).  Returns chunk examples."""
    import jax
    import jax.numpy as jnp

    from ..models.network import transitions
    from ..ops.crf import crf_viterbi

    rng = np.random.default_rng(seed)
    signals = rng.normal(size=(n_reads, read_len)).astype(F32)
    lengths = jnp.full((n_reads,), read_len, jnp.int32)
    trans, nblocks = transitions(
        teacher_params, cfg, jnp.asarray(signals), lengths, rnn_impl="scan"
    )
    _, path, _ = crf_viterbi(trans, nblocks, cfg.nbase)
    path = np.asarray(path)
    out = []
    for i in range(n_reads):
        out.extend(
            chunk_examples(signals[i], path[i], cfg.total_stride, chunk, cfg.nbase)
        )
    return out
