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
from jax.scipy.special import logsumexp as jax_logsumexp

from ..ops.crf import (
    TransIndex,
    crf_backward,
    crf_forward,
    crf_viterbi,
    rle_index,
)

BASES = "ACGT"


# ---------------------------------------------------------------------------
# V1 run-length model (reference decode_runlength / posterior_runlength,
# src/decode.c:692-892).  The V1 chain has nbase states (one per base);
# a block either MOVES to a different base (weight depends only on the
# destination) or STAYS in the same base.  Parameter layout per block
# (src/decode.c:688-691): [shape x nbase, scale x nbase, move x nbase,
# stay x nbase].
# ---------------------------------------------------------------------------


def rle_v1_index(nbase: int) -> TransIndex:
    """TransIndex for the V1 chain so the generic batched CRF scans
    apply: dense[from=b2, to=b1] = move[b1] if b2 != b1 else stay[b1].

    Viterbi tie order (src/decode.c:720-747): the move winner is the
    first argmax over origins (lowest b2 wins ties) and the stay
    replaces it only on strictly greater score -- rank = b2 for moves,
    nbase for the stay.  from_state/to_state are left empty (a V1
    param serves several origins, so per-param gathers are undefined;
    the V1 posterior has its own formulation below).
    """
    nparam = 4 * nbase
    param_idx = np.full((nbase, nbase), -1, dtype=np.int32)
    tie_rank = np.full((nbase, nbase), 10**6, dtype=np.int32)
    for b2 in range(nbase):
        for b1 in range(nbase):
            param_idx[b2, b1] = (3 * nbase + b1) if b2 == b1 else (2 * nbase + b1)
            tie_rank[b2, b1] = nbase if b2 == b1 else b2
    allowed = np.ones((nbase, nbase), dtype=bool)
    empty = np.zeros(0, dtype=np.int32)
    return TransIndex(nbase, nbase, nparam, empty, empty, param_idx, allowed, tie_rank)


def rle_v1_viterbi(params, nblocks, nbase: int = 4):
    """Batched decode_runlength (src/decode.c:692-770).

    params: [B, T, 4*nbase]; returns (score [B], path [B, T] int32)
    with the reference convention: path[t] = base moved into at block
    t, or -1 when block t is a stay.
    """
    idx = rle_v1_index(nbase)
    score, states, _ = crf_viterbi(params, nblocks, nbase, idx=idx)
    # states: [B, T+1]; a V1 transition is a stay iff the state repeats
    # (a move to the same base is not representable in the chain)
    prev, curr = states[:, :-1], states[:, 1:]
    path = jnp.where(curr != prev, curr, -1)
    T = params.shape[1]
    valid = jnp.arange(T)[None, :] < jnp.asarray(nblocks)[:, None]
    return score, jnp.where(valid, path, -1)


def rle_v1_posterior(params, nblocks, nbase: int = 4):
    """Batched posterior_runlength (src/decode.c:795-892).

    Returns [B, T, 4*nbase] with the move/stay slots holding the
    UNNORMALISED log posterior (alpha/beta products, exactly the
    reference's quantities) and the shape/scale slots zero (the
    reference leaves those rows untouched in its output matrix).

    post[move b1, t]  = lse_{b2 != b1}(alpha_t[b2]) + move_t[b1] + beta_{t+1}[b1]
    post[stay b,  t]  = alpha_t[b] + stay_t[b] + beta_{t+1}[b]
    """
    idx = rle_v1_index(nbase)
    move = params[..., 2 * nbase : 3 * nbase]
    stay = params[..., 3 * nbase :]
    alphas, _ = crf_forward(params, nblocks, nbase, idx=idx)  # [B, T+1, nbase]
    betas = crf_backward(params, nblocks, nbase, idx=idx)
    a, b = alphas[:, :-1], betas[:, 1:]
    # lse over origins b2 != b1: total minus own term, computed stably
    total = jnp.asarray(
        jax_logsumexp(a, axis=-1, keepdims=True), params.dtype
    )
    excl = total + jnp.log1p(
        -jnp.clip(jnp.exp(a - total), None, 1.0 - 1e-7)
    )
    post_move = excl + move + b
    post_stay = a + stay + b
    zeros = jnp.zeros_like(params[..., : 2 * nbase])
    return jnp.concatenate([zeros, post_move, post_stay], axis=-1)


def runlengths_unit(path: np.ndarray, nbase: int = 4) -> np.ndarray:
    """Unit run length per move block; 0 for stays (src/decode.c:610-632)."""
    s = np.asarray(path)
    return ((s >= 0) & (s < nbase)).astype(np.int64)


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
