"""Batch-minor (lanes = batch) CRF decode: the TPU fast path.

Measured on v5e, the [B, T, S, S] sequential decode scans cost ~170 ms
at B=128, T=2560 REGARDLESS of scan unroll: each step's operands are
[B, 8, 8] with the tiny state dims minor, so every VPU op pads the
8-lane axis to 128 and wastes 15/16 of each register and HBM beat over
thousands of steps.  Putting the BATCH on the lane axis makes every
step fully dense: state [S, B], step matrices [S, S, B] -- an [8, 8,
128] tile is exactly (sublanes, lanes) shaped.

The whole decode stays time-major batch-minor end to end (forward,
backward + fused transition posterior, Viterbi, traceback); only the
byte-sized outputs transpose back at the end.  The arithmetic per
element and its ordering match the [B, T, ...] sequential scans in
ops/crf.py (same formulation, same reduction axis lengths); tests pin
max-plus results bit-exactly on dyadic inputs and the sum-semiring to
reassociation tolerance.

Reference semantics: src/decode.c:119-204 (Viterbi), :377-498
(forward/backward transition posterior), src/layers.c:1035 (partition).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .crf import NEG_BIG, RANK_BIG, TransIndex, _scan_blocked, flipflop_index


def _lse(x, axis):
    return jax.scipy.special.logsumexp(x, axis=axis)


def _use_kernels() -> bool:
    """FLAPPIE_TPU_SCANB_KERNELS: run the four decode scans as Pallas
    kernels (ops/crf_bm_pallas.py) instead of blocked lax.scan.
    ``auto`` (default) = on when the backend is TPU: measured 2x at
    the chunk shape (fb decode 15.05 -> 7.47 ms, viterbi-only 11.02 ->
    6.34 ms at [128, 2560], docs/BENCH_decode_r3.json "kernels" rows);
    ``off`` forces the scans (the formulation reference, and what CPU
    golden/parity suites run).  Max-plus passes are bit-identical
    either way; the sum semiring agrees to reassociation tolerance."""
    import os

    v = os.environ.get("FLAPPIE_TPU_SCANB_KERNELS", "auto")
    if v == "auto":
        return jax.default_backend() == "tpu"
    return v in ("1", "on", "true")


def _use_fused_fb() -> bool:
    """FLAPPIE_TPU_SCANB_FB=fused runs the posterior's alpha and beta
    scans as ONE kernel with the two independent chains interleaved
    (crf_bm_pallas.fwdbwd_states_pallas — bit-identical per-chain
    math).  MEASURED SLOWER on chip and kept opt-in: the dense blocks
    must stream twice (forward- and reverse-mapped), and the doubled
    DMA outweighs the halved serial pass count — fb decode chain 3.19
    vs 2.82 ms at [128, 2560], chunk program a wash
    (docs/PROBE_fb_r3.json).  Default: split kernels."""
    import os

    return os.environ.get("FLAPPIE_TPU_SCANB_FB", "split") == "fused"


def _dense_tm(trans_tm, idx: TransIndex):
    """[T, P, B] -> [T, S, S, B] (from, to); forbidden = NEG_BIG."""
    T, P, B = trans_tm.shape
    S = idx.nstate
    gathered = jnp.take(
        trans_tm, jnp.asarray(np.maximum(idx.param_idx, 0).reshape(-1)), axis=1
    ).reshape(T, S, S, B)
    return jnp.where(jnp.asarray(idx.allowed)[None, :, :, None], gathered, NEG_BIG)


def _fwd_states_tm(dense_tm, tvalid_tm):
    """alphas [T+1, S, B] of the sum-semiring forward scan."""
    T, S, _, B = dense_tm.shape
    a0 = jnp.zeros((S, B), dense_tm.dtype)

    if _use_kernels():
        from .crf_bm_pallas import fwd_states_pallas

        return fwd_states_pallas(dense_tm, tvalid_tm)

    def step(alpha, inp):
        m, valid = inp  # [S, S, B], [B]
        nxt = _lse(alpha[:, None, :] + m, axis=0)
        alpha = jnp.where(valid[None, :], nxt, alpha)
        return alpha, alpha

    _, alphas = _scan_blocked(step, a0, (dense_tm, tvalid_tm))
    return jnp.concatenate([a0[None], alphas], axis=0)


def _bwd_states_tm(dense_tm, tvalid_tm):
    """betas [T+1, S, B]: beta[T]=0, beta[t]=lse_j m[t,i,j]+beta[t+1,j]."""
    T, S, _, B = dense_tm.shape
    b_end = jnp.zeros((S, B), dense_tm.dtype)

    if _use_kernels():
        from .crf_bm_pallas import bwd_states_pallas

        return bwd_states_pallas(dense_tm, tvalid_tm)

    def step(beta, inp):
        m, valid = inp
        nxt = _lse(m + beta[None, :, :], axis=1)
        beta = jnp.where(valid[None, :], nxt, beta)
        return beta, beta

    _, betas_rev = _scan_blocked(step, b_end, (dense_tm[::-1], tvalid_tm[::-1]))
    return jnp.concatenate([b_end[None], betas_rev], axis=0)[::-1]


def _transpost_tm(trans_tm, tvalid_tm, idx: TransIndex):
    """Per-block transition posteriors [T, P, B], log-normalised per
    block (log_row_normalise, src/flappie_matrix.c:450-467)."""
    dense = _dense_tm(trans_tm, idx)
    if _use_kernels() and _use_fused_fb():
        from .crf_bm_pallas import fwdbwd_states_pallas

        alphas, betas = fwdbwd_states_pallas(dense, tvalid_tm)
    else:
        alphas = _fwd_states_tm(dense, tvalid_tm)
        betas = _bwd_states_tm(dense, tvalid_tm)
    fr = jnp.asarray(idx.from_state)
    to = jnp.asarray(idx.to_state)
    tpost = (
        jnp.take(alphas[:-1], fr, axis=1)
        + trans_tm
        + jnp.take(betas[1:], to, axis=1)
    )
    return tpost - _lse(tpost, axis=1)[:, None, :]


def _viterbi_fwd_tm(dense_tm, tvalid_tm, idx: TransIndex):
    """Max-plus forward: (score [B], last_state [B], backptr [T,S,B])."""
    T, S, _, B = dense_tm.shape
    a0 = jnp.zeros((S, B), dense_tm.dtype)
    rank = jnp.asarray(idx.tie_rank)[:, :, None]  # [from, to, 1]
    ident = jnp.arange(S, dtype=jnp.int8)[:, None]  # [S, 1]

    def step(alpha, inp):
        m, valid = inp
        scores = alpha[:, None, :] + m  # [from, to, B]
        best = jnp.max(scores, axis=0)
        masked_rank = jnp.where(scores == best[None], rank, RANK_BIG)
        bp = jnp.argmin(masked_rank, axis=0).astype(jnp.int8)  # [to, B]
        alpha_next = jnp.where(valid[None, :], best, alpha)
        bp = jnp.where(valid[None, :], bp, ident)
        return alpha_next, bp

    if _use_kernels():
        from .crf_bm_pallas import viterbi_fwd_pallas

        alpha, bps = viterbi_fwd_pallas(dense_tm, tvalid_tm, idx.tie_rank)
    else:
        alpha, bps = _scan_blocked(step, a0, (dense_tm, tvalid_tm))
    score = jnp.max(alpha, axis=0)
    last_state = jnp.argmax(alpha, axis=0).astype(jnp.int32)
    return score, last_state, bps


def _traceback_tm(backptr_tm, last_state, tvalid_tm):
    """path [T+1, B] int32 from [T, S, B] backpointers."""
    T, S, B = backptr_tm.shape

    def step(state, inp):
        bp_t, valid = inp  # [S, B], [B]
        prev = jnp.take_along_axis(
            bp_t, state[None, :].astype(jnp.int32), axis=0
        )[0].astype(jnp.int32)
        state = jnp.where(valid, prev, state)
        return state, state

    if _use_kernels():
        from .crf_bm_pallas import traceback_pallas

        return traceback_pallas(backptr_tm, tvalid_tm, last_state)

    _, states_rev = _scan_blocked(
        step, last_state, (backptr_tm[::-1], tvalid_tm[::-1])
    )
    return jnp.concatenate([last_state[None], states_rev], axis=0)[::-1]


def decode_bm(
    trans,
    nblocks,
    nbase: int,
    viterbi_only: bool,
    compute_trace: bool,
    idx: TransIndex | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full decode of [B, T, P] transition weights, batch-minor inside.

    Returns (score [B], path [B, T+1] int32, qpath [B, T+1] f32,
    trace [B, T+1, S] uint8 or a [B, 1, S] dummy) -- the same contract
    as composing crf_transpost + crf_viterbi + trace_from_posterior.
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    B, T, P = trans.shape
    S = idx.nstate

    trans_tm = trans.transpose(1, 2, 0)  # [T, P, B]
    tvalid_tm = jnp.arange(T)[:, None] < nblocks[None, :]

    if viterbi_only:
        mat_tm = trans_tm
    else:
        mat_tm = _transpost_tm(trans_tm, tvalid_tm, idx)

    dense = _dense_tm(mat_tm, idx)
    score, last_state, backptr = _viterbi_fwd_tm(dense, tvalid_tm, idx)
    path_tm = _traceback_tm(backptr, last_state, tvalid_tm)  # [T+1, B]

    # qpath[t] = mat[t-1, pidx[path[t-1], path[t]]]; qpath[0] = NaN
    pidx = jnp.asarray(np.maximum(idx.param_idx, 0))
    sel = pidx[path_tm[:-1], path_tm[1:]]  # [T, B]
    q = jnp.take_along_axis(mat_tm, sel[:, None, :], axis=1)[:, 0]  # [T, B]
    nan = jnp.full((1, B), jnp.nan, trans.dtype)
    qpath_tm = jnp.concatenate([nan, q], axis=0)

    if compute_trace:
        from_onehot = jnp.asarray(np.eye(S, dtype=np.float32)[idx.from_state])
        to_onehot = jnp.asarray(np.eye(S, dtype=np.float32)[idx.to_state])
        ep = jnp.exp(mat_tm)  # [T, P, B]
        first = jnp.einsum("pb,ps->sb", ep[0], from_onehot)
        rest = jnp.einsum("tpb,ps->tsb", ep, to_onehot)
        occ = jnp.concatenate([first[None], rest], axis=0)  # [T+1, S, B]
        trace = jnp.clip(jnp.floor(255.0 * occ + 0.5), 0.0, 255.0).astype(
            jnp.uint8
        ).transpose(2, 0, 1)
    else:
        trace = jnp.zeros((B, 1, S), jnp.uint8)

    return score, path_tm.transpose(1, 0), qpath_tm.transpose(1, 0), trace
