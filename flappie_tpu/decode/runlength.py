"""Run-length (runnie) decoding.

Reference semantics:
- decode_crf_runlength (src/decode.c:927-1011): Viterbi over the V2 RLE
  transition structure; path[t] = state after transition t (T entries,
  unlike flip-flop's T+1).
- transpost_crf_runlength (src/decode.c:1037-1159): transition
  "posterior" = alpha + trans + beta elementwise on the transition
  block, NOT normalised; shape/scale parameters are copied through.
- the .run emitter (src/runnie.c:277-311): per move block, emit base,
  shape, scale and dwell (1 + following stay blocks).
- dwmean / runlengths_mean (src/decode.c:552-601): discrete-Weibull
  mean estimate, kept for API completeness.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.crf import (
    crf_backward,
    crf_forward,
    crf_viterbi,
    rle_index,
)

BASES = "ACGT"


def rle_split(params, nbase: int):
    """[.., 2*nbase + 2*nbase^2] -> (shape, scale, trans) slices."""
    return (
        params[..., :nbase],
        params[..., nbase : 2 * nbase],
        params[..., 2 * nbase :],
    )


def rle_transpost(params, nblocks, nbase: int):
    """Batched transpost_crf_runlength: same layout as the input params,
    transitions replaced by alpha+trans+beta (unnormalised), shape/scale
    copied through."""
    idx = rle_index(nbase)
    shape, scale, trans = rle_split(params, nbase)
    alphas, _ = crf_forward(trans, nblocks, nbase, idx=idx)
    betas = crf_backward(trans, nblocks, nbase, idx=idx)
    fr = jnp.asarray(idx.from_state)
    to = jnp.asarray(idx.to_state)
    post = (
        jnp.take(alphas[:, :-1], fr, axis=-1)
        + trans
        + jnp.take(betas[:, 1:], to, axis=-1)
    )
    return jnp.concatenate([shape, scale, post], axis=-1)


def rle_viterbi(params, nblocks, nbase: int):
    """Batched decode_crf_runlength.

    Returns (score [B], path [B, T] int32) with the reference's path
    convention (state after each transition).
    """
    idx = rle_index(nbase)
    _, _, trans = rle_split(params, nbase)
    score, path, _ = crf_viterbi(trans, nblocks, nbase, idx=idx)
    return score, path[:, 1:]


class RunRecord(NamedTuple):
    base: str
    shape: float
    scale: float
    dwell: int


def runs_from_path(params: np.ndarray, path: np.ndarray, nblocks: int, nbase: int = 4) -> List[RunRecord]:
    """Emit per-base runs exactly as src/runnie.c:277-311.

    params: [T, nparam] (the decoded matrix - transpost output in fb
    mode, raw weights in viterbi mode); path: [T] states.
    """
    out: List[RunRecord] = []
    dwell = 1
    last_blk = -1
    for blk in range(nblocks):
        if path[blk] >= nbase:
            dwell += 1
            continue
        if last_blk >= 0:
            base = int(path[last_blk])
            out.append(
                RunRecord(
                    BASES[base],
                    float(params[last_blk, base]),
                    float(params[last_blk, nbase + base]),
                    dwell,
                )
            )
        last_blk = blk
        dwell = 1
    if last_blk >= 0:
        base = int(path[last_blk])
        out.append(
            RunRecord(
                BASES[base],
                float(params[last_blk, base]),
                float(params[last_blk, nbase + base]),
                dwell,
            )
        )
    return out


def runs_from_selected(
    path: np.ndarray,
    shape_sel: np.ndarray,
    scale_sel: np.ndarray,
    nblocks: int,
    nbase: int = 4,
) -> List[RunRecord]:
    """runs_from_path when only the path-selected shape/scale weights
    were brought to host (shape_sel[t] = params[t, path[t] % nbase],
    scale_sel[t] = params[t, nbase + path[t] % nbase], computed on
    device) -- 8 bytes/block instead of the full 4*nparam.  Emits the
    identical records (src/runnie.c:277-311)."""
    out: List[RunRecord] = []
    dwell = 1
    last_blk = -1
    for blk in range(nblocks):
        if path[blk] >= nbase:
            dwell += 1
            continue
        if last_blk >= 0:
            base = int(path[last_blk])
            out.append(
                RunRecord(
                    BASES[base],
                    float(shape_sel[last_blk]),
                    float(scale_sel[last_blk]),
                    dwell,
                )
            )
        last_blk = blk
        dwell = 1
    if last_blk >= 0:
        base = int(path[last_blk])
        out.append(
            RunRecord(
                BASES[base],
                float(shape_sel[last_blk]),
                float(scale_sel[last_blk]),
                dwell,
            )
        )
    return out


def dwmean(shape: float, scale: float, maxval: int = 100) -> float:
    """Approximate mean of a discrete Weibull (src/decode.c:552-561)."""
    i = np.arange(1, maxval + 1, dtype=np.float64)
    return float(np.exp(-np.power(i / scale, shape)).sum())


def runlengths_mean(params: np.ndarray, path: np.ndarray, nbase: int = 4) -> np.ndarray:
    """Expected run length per block; 0 for stays (src/decode.c:574-601).

    path convention here: -1 (or >= nbase) for stay.
    """
    nblk = path.shape[0]
    runs = np.zeros(nblk, dtype=np.int64)
    for blk in range(nblk):
        s = path[blk]
        if s < 0 or s >= nbase:
            continue
        shp = params[blk, s]
        scl = params[blk, nbase + s]
        runs[blk] = 1 + round(dwmean(float(shp), float(scl), 100))
    return runs


def runlength_to_basecall(path: np.ndarray, runlength: np.ndarray, nbase: int = 4) -> str:
    """src/decode.c:643-667."""
    out = []
    for s, r in zip(path, runlength):
        if s < 0 or s >= nbase:
            continue
        out.append(BASES[int(s)] * int(r))
    return "".join(out)
