"""Flip-flop CRF operations: partition, forward-backward, Viterbi.

The flip-flop CRF over ``nbase`` bases has ``nstate = 2*nbase`` states
(flip 0..nbase-1, flop nbase..2nbase-1) and per-block parameter vectors
of length ``nparam = nstate*(nbase+1)`` laid out as (reference:
src/decode.c:104-114, src/layers.c:1035-1079):

- ``p[to*nstate + from]``            for ``to < nbase`` (into flip, any from)
- ``p[nbase*nstate + b]``            flip b  -> flop nbase+b (move)
- ``p[nbase*nstate + nbase + b]``    flop    -> flop (stay)

All ops here run batched on device over ``[B, T, nparam]`` tensors in
log space, with per-read valid lengths ``nblocks [B]`` masked inside the
scans (padded blocks apply the semiring identity).  The structure is
captured once as static index vectors (from-state, to-state per
parameter), so forward/backward/posterior are pure gather + logsumexp
reductions - VPU-friendly, no data-dependent shapes.

Numerical note: the reference accumulates the partition function in
float64 (src/layers.c:1041) and the decode scans in float32 with
pairwise sequential logsumexp; we use float32 throughout with fused
reductions, which agrees to ~1e-4 relative over tens of kiloblocks
(validated against a float64 oracle in tests).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG_BIG = -3.0e38  # effectively -inf in float32 without nan arithmetic


RANK_BIG = 10**6  # tie_rank for forbidden transitions


class TransIndex(NamedTuple):
    """Static sparse-transition structure of a CRF (flip-flop or RLE)."""

    nbase: int
    nstate: int
    nparam: int
    from_state: np.ndarray  # [nparam] int32
    to_state: np.ndarray  # [nparam] int32
    param_idx: np.ndarray  # [nstate, nstate] int32, -1 where forbidden
    allowed: np.ndarray  # [nstate, nstate] bool
    tie_rank: np.ndarray  # [nstate, nstate] int32: Viterbi tie preference
    # (lower wins on equal scores), transcribing each reference decode
    # loop's candidate iteration order and strict-> comparisons


@lru_cache(maxsize=None)
def flipflop_index(nbase: int) -> TransIndex:
    nstate = 2 * nbase
    nparam = nstate * (nbase + 1)
    from_state = np.empty(nparam, dtype=np.int32)
    to_state = np.empty(nparam, dtype=np.int32)
    param_idx = np.full((nstate, nstate), -1, dtype=np.int32)
    for to in range(nbase):
        for frm in range(nstate):
            p = to * nstate + frm
            from_state[p] = frm
            to_state[p] = to
            param_idx[frm, to] = p
    off = nbase * nstate
    for b in range(nbase):
        # flip b -> flop nbase+b
        from_state[off + b] = b
        to_state[off + b] = nbase + b
        param_idx[b, nbase + b] = off + b
        # flop stay
        from_state[off + nbase + b] = nbase + b
        to_state[off + nbase + b] = nbase + b
        param_idx[nbase + b, nbase + b] = off + nbase + b
    allowed = param_idx >= 0
    # Viterbi tie order (decode.c:153-180): flip destinations iterate
    # from-state 0..nstate-1 with strict >, so the lowest from wins
    # ties; flop destinations initialise with the stay and only take
    # the flip->flop move on strict >, so the stay wins ties.
    tie_rank = np.full((nstate, nstate), RANK_BIG, dtype=np.int32)
    for to in range(nbase):
        for frm in range(nstate):
            tie_rank[frm, to] = frm
    for b in range(nbase):
        tie_rank[nbase + b, nbase + b] = 0  # stay preferred
        tie_rank[b, nbase + b] = 1
    return TransIndex(
        nbase, nstate, nparam, from_state, to_state, param_idx, allowed, tie_rank
    )


@lru_cache(maxsize=None)
def rle_index(nbase: int) -> TransIndex:
    """Transition structure of the CRF run-length model (V2).

    Reference: rle_trans_lookup (src/decode.c:907-921, layers.c:1241-1246):
    ``idx = base_to * 2*nbase + base_from + (stay_from ? nbase : 0)``,
    relative to the 2*nbase offset where transitions start in the param
    vector.  States: move 0..nbase-1, stay nbase..2nbase-1.  A move to a
    different base lands in that base's move state; a "move" to the same
    base is the stay transition into the stay state.  Moving to the same
    base's move state is forbidden.
    """
    nstate = 2 * nbase
    nparam = 2 * nbase * nbase
    from_state = np.empty(nparam, dtype=np.int32)
    to_state = np.empty(nparam, dtype=np.int32)
    param_idx = np.full((nstate, nstate), -1, dtype=np.int32)
    for p in range(nparam):
        bt = p // nstate
        rem = p % nstate
        bf = rem % nbase
        to = bt if bt != bf else nbase + bt
        from_state[p] = rem
        to_state[p] = to
        param_idx[rem, to] = p
    allowed = param_idx >= 0
    # Viterbi tie order (decode.c:960-995): move destinations iterate
    # b2 ascending trying move then stay, all strict >, so priority is
    # (move b2, stay b2) pairs in b2 order; stay destinations compare
    # `stay > move`, so the MOVE wins ties.
    tie_rank = np.full((nstate, nstate), RANK_BIG, dtype=np.int32)
    for b1 in range(nbase):
        for b2 in range(nbase):
            if b1 == b2:
                continue
            tie_rank[b2, b1] = 2 * b2
            tie_rank[nbase + b2, b1] = 2 * b2 + 1
    for b in range(nbase):
        tie_rank[b, nbase + b] = 0  # move preferred
        tie_rank[nbase + b, nbase + b] = 1
    return TransIndex(
        nbase, nstate, nparam, from_state, to_state, param_idx, allowed, tie_rank
    )


def dense_from_params(p, idx: TransIndex):
    """[..., nparam] -> [..., nstate, nstate] (from, to); forbidden = NEG_BIG."""
    gathered = jnp.take(p, jnp.asarray(np.maximum(idx.param_idx, 0)), axis=-1)
    return jnp.where(jnp.asarray(idx.allowed), gathered, NEG_BIG)


def _lse(x, axis):
    return jax.scipy.special.logsumexp(x, axis=axis)


# Optional hard override of the scan unroll block (sweep/measurement
# knob); None = resolve per backend at call time, see _time_block().
CRF_TIME_BLOCK = None


def _time_block() -> int:
    """Scan unroll block K.  Swept on v5e at the chunk shape
    (docs/BENCH_decode_r3.json + K sweep: 17.8 ms @16, 14.7 @64,
    16.4 @96, 18.7 @128 for the fb decode chain) -> 64 on TPU;
    16 elsewhere (CPU parity/CI, where larger unrolls only slow
    compile).  FLAPPIE_TPU_CRF_K overrides."""
    if CRF_TIME_BLOCK is not None:
        return CRF_TIME_BLOCK
    import os

    env = os.environ.get("FLAPPIE_TPU_CRF_K")
    if env:
        return int(env)
    return 64 if jax.default_backend() == "tpu" else 16


def _impl() -> str:
    """CRF scan implementation (FLAPPIE_TPU_CRF_IMPL):

    - ``scan`` - sequential blocked lax.scan over [B, T, ...]: the
      parity/numerical reference (bit-matches the C oracle's
      formulation order).
    - ``scanb`` - the same sequential formulation in batch-minor
      layout (ops/crf_bm.py): B rides the 128-lane axis so the tiny
      [S, S] state tiles stop wasting 15/16 of every register.  The
      production fast path (~8x decode speedup measured on v5e).
    - ``seg``  - two-level segmented scans (ops/crf_seg.py): serial
      depth L + T/L instead of T.  Measured SLOWER than scanb at chunk
      shapes (its parallel phases stream large prefix tensors); kept
      for very long single reads.
    - ``pallas`` - opt-in time-scan kernels (ops/crf_pallas.py).
    - ``auto`` (default) - ``scanb`` on TPU, ``scan`` elsewhere (CPU
      CI and the golden suites exercise the parity path; real hardware
      gets the fast path).
    """
    import os

    v = os.environ.get("FLAPPIE_TPU_CRF_IMPL", "auto")
    if v == "auto":
        return "scanb" if jax.default_backend() == "tpu" else "scan"
    return v


def _use_pallas() -> bool:
    return _impl() == "pallas"


def _scan_blocked(step, init, xs, K: int | None = None):
    """lax.scan with K steps unrolled per iteration.

    The CRF state is tiny ([B, nstate]), so a plain per-block scan is
    dominated by TPU loop overhead (~10us/step); unrolling K steps per
    scan iteration cuts that K-fold.  The per-step maths and order are
    unchanged, so results are bit-identical to the plain scan.  Time is
    padded to a multiple of K; every step fn here freezes its carry
    when the step's `valid` input is False, and padded validity is
    False (jnp.pad zero-fills), so padding is inert.

    K defaults to the module constant at CALL time (so sweeps can
    retune it per trace); it trades per-iteration dispatch latency
    against unrolled-body size.
    """
    if K is None:
        K = _time_block()
    T = jax.tree.leaves(xs)[0].shape[0]
    Tp = -(-T // K) * K
    if Tp != T:
        xs = jax.tree.map(
            lambda a: jnp.pad(a, [(0, Tp - T)] + [(0, 0)] * (a.ndim - 1)), xs
        )
    xs = jax.tree.map(lambda a: a.reshape((Tp // K, K) + a.shape[1:]), xs)

    def blk(carry, xk):
        outs = []
        for k in range(K):
            carry, y = step(carry, jax.tree.map(lambda a: a[k], xk))
            outs.append(y)
        return carry, jnp.stack(outs)

    carry, ys = lax.scan(blk, init, xs)
    ys = ys.reshape((Tp,) + ys.shape[2:])[:T]
    return carry, ys


# ---------------------------------------------------------------------------
# Forward / partition
# ---------------------------------------------------------------------------


def crf_forward(trans, nblocks, nbase: int, idx: TransIndex | None = None,
                impl: str | None = None):
    """Forward pass of the flip-flop CRF.

    trans: [B, T, nparam] log-space transition weights
    nblocks: [B] number of valid blocks per read

    Returns (alphas [B, T+1, nstate], logZ [B]).  alpha[:, 0] = 0
    (reference initialises the forward vector with zeros,
    src/layers.c:1042-1047 calloc).  Padded blocks leave alpha
    unchanged; logZ is the logsumexp of alpha at each read's own final
    block.

    ``impl`` overrides FLAPPIE_TPU_CRF_IMPL for this call; training
    losses pass ``"scan"`` because the Pallas decode kernels are
    inference-only (no JVP rule) and would otherwise be selected on
    TPU, breaking jax.grad through the head's partition function.
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    impl = impl if impl is not None else _impl()
    B, T, _ = trans.shape
    nstate = idx.nstate
    a0 = jnp.zeros((B, nstate), trans.dtype)
    dense = dense_from_params(trans, idx)  # [B, T, S, S]

    def step(alpha, inp):
        m, valid = inp  # m: [B, S, S], valid: [B]
        nxt = _lse(alpha[:, :, None] + m, axis=1)
        alpha = jnp.where(valid[:, None], nxt, alpha)
        return alpha, alpha

    tvalid = jnp.arange(T)[None, :] < nblocks[:, None]  # [B, T]
    if impl == "scanb":
        from .crf_bm import _fwd_states_tm

        alphas_tm = _fwd_states_tm(
            dense.transpose(1, 2, 3, 0), jnp.swapaxes(tvalid, 0, 1)
        )
        alphas = alphas_tm.transpose(2, 0, 1)  # [B, T+1, S]
    elif impl == "seg":
        from .crf_seg import seg_forward_states

        alphas = seg_forward_states(dense, nblocks)
    elif impl == "pallas":
        from .crf_pallas import fwd_scan_pallas

        alphas = fwd_scan_pallas(
            jnp.swapaxes(dense, 0, 1), jnp.swapaxes(tvalid, 0, 1)
        )
        alphas = jnp.concatenate([a0[:, None], jnp.swapaxes(alphas, 0, 1)], axis=1)
    else:
        _, alphas = _scan_blocked(
            step, a0, (jnp.swapaxes(dense, 0, 1), jnp.swapaxes(tvalid, 0, 1))
        )
        alphas = jnp.concatenate([a0[:, None], jnp.swapaxes(alphas, 0, 1)], axis=1)
    final = jnp.take_along_axis(
        alphas, nblocks[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logZ = _lse(final, axis=-1)
    return alphas, logZ


def crf_partition(trans, nblocks, nbase: int, idx: TransIndex | None = None,
                  impl: str | None = None):
    """log partition function (reference src/layers.c:1035-1079)."""
    _, logZ = crf_forward(trans, nblocks, nbase, idx=idx, impl=impl)
    return logZ


def crf_backward(trans, nblocks, nbase: int, idx: TransIndex | None = None):
    """Backward pass: betas [B, T+1, nstate]; beta at the final valid
    block is 0 (and stays 0 through the padded tail)."""
    idx = idx if idx is not None else flipflop_index(nbase)
    B, T, _ = trans.shape
    nstate = idx.nstate
    b_end = jnp.zeros((B, nstate), trans.dtype)
    dense = dense_from_params(trans, idx)

    def step(beta, inp):
        m, valid = inp
        nxt = _lse(m + beta[:, None, :], axis=2)
        beta = jnp.where(valid[:, None], nxt, beta)
        return beta, beta

    tvalid = jnp.arange(T)[None, :] < nblocks[:, None]
    if _impl() == "seg":
        from .crf_seg import seg_backward_states

        return seg_backward_states(dense, nblocks)
    # scan over reversed time
    if _use_pallas():
        from .crf_pallas import fwd_scan_pallas

        # the backward update lse(m + beta, axis=to) is the forward
        # update on the transposed transition matrices
        betas_rev = fwd_scan_pallas(
            jnp.swapaxes(dense, 0, 1)[::-1].swapaxes(-1, -2),
            jnp.swapaxes(tvalid, 0, 1)[::-1],
        )
    else:
        _, betas_rev = _scan_blocked(
            step,
            b_end,
            (
                jnp.swapaxes(dense, 0, 1)[::-1],
                jnp.swapaxes(tvalid, 0, 1)[::-1],
            ),
        )
    betas = jnp.concatenate(
        [b_end[:, None], jnp.swapaxes(betas_rev, 0, 1)], axis=1
    )[:, ::-1]
    return betas


# ---------------------------------------------------------------------------
# Transition posterior (reference transpost_crf_flipflop, decode.c:377-498)
# ---------------------------------------------------------------------------


def crf_transpost(trans, nblocks, nbase: int, return_log: bool = True, idx: TransIndex | None = None):
    """Per-block transition posteriors, normalised per block.

    tpost[b, t, p] = alpha_t[from(p)] + trans[t, p] + beta_{t+1}[to(p)],
    then each block column is logsumexp-normalised
    (log_row_normalise_inplace, src/flappie_matrix.c:450-467).
    Padded blocks are normalised garbage; callers slice to nblocks.
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    alphas = crf_forward(trans, nblocks, nbase, idx=idx)[0]
    betas = crf_backward(trans, nblocks, nbase, idx=idx)
    fr = jnp.asarray(idx.from_state)
    to = jnp.asarray(idx.to_state)
    tpost = (
        jnp.take(alphas[:, :-1], fr, axis=-1)
        + trans
        + jnp.take(betas[:, 1:], to, axis=-1)
    )
    tpost = tpost - _lse(tpost, axis=-1)[..., None]
    if not return_log:
        tpost = jnp.exp(tpost)
    return tpost


# ---------------------------------------------------------------------------
# Viterbi (reference decode_crf_flipflop, decode.c:119-204)
# ---------------------------------------------------------------------------


def crf_viterbi_forward(trans, nblocks, nbase: int, idx: TransIndex | None = None):
    """Max-plus forward pass.

    Returns (score [B], last_state [B], backptr [B, T, nstate] int8).
    Ties are broken exactly as the reference decode loops do
    (idx.tie_rank): lowest from-state for flip destinations, the stay
    for flop destinations (decode.c:153-180), and the RLE orders for
    the run-length model (decode.c:960-995).
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    B, T, _ = trans.shape
    nstate = idx.nstate
    a0 = jnp.zeros((B, nstate), trans.dtype)
    dense = dense_from_params(trans, idx)
    rank = jnp.asarray(idx.tie_rank)  # [from, to]

    def step(alpha, inp):
        m, valid = inp
        scores = alpha[:, :, None] + m  # [B, from, to]
        best = jnp.max(scores, axis=1)
        masked_rank = jnp.where(
            scores == best[:, None, :], rank[None], RANK_BIG
        )
        bp = jnp.argmin(masked_rank, axis=1).astype(jnp.int8)
        alpha_next = jnp.where(valid[:, None], best, alpha)
        # backpointer for padded blocks: stay in place (identity)
        bp = jnp.where(
            valid[:, None], bp, jnp.arange(nstate, dtype=jnp.int8)[None, :]
        )
        return alpha_next, bp

    tvalid = jnp.arange(T)[None, :] < nblocks[:, None]
    if _impl() == "seg":
        from .crf_seg import seg_backptr, seg_viterbi_states

        alphas = seg_viterbi_states(dense, nblocks)
        backptr = seg_backptr(alphas, dense, nblocks, idx.tie_rank, RANK_BIG)
        final = alphas[:, -1]  # frozen at each read's own nblocks
        score = jnp.max(final, axis=-1)
        last_state = jnp.argmax(final, axis=-1).astype(jnp.int32)
        return score, last_state, backptr
    if _use_pallas():
        from .crf_pallas import viterbi_scan_pallas

        alphas, bps = viterbi_scan_pallas(
            jnp.swapaxes(dense, 0, 1), jnp.swapaxes(tvalid, 0, 1),
            tie_rank=idx.tie_rank,
        )
        # the state freezes on padded steps, so the last row equals the
        # scan path's final carry
        alpha = alphas[-1]
    else:
        alpha, bps = _scan_blocked(
            step, a0, (jnp.swapaxes(dense, 0, 1), jnp.swapaxes(tvalid, 0, 1))
        )
    backptr = jnp.swapaxes(bps, 0, 1)  # [B, T, nstate]
    score = jnp.max(alpha, axis=-1)
    last_state = jnp.argmax(alpha, axis=-1).astype(jnp.int32)
    return score, last_state, backptr


def viterbi_traceback(backptr, last_state, nblocks):
    """Walk backpointers on device: returns path [B, T+1] int32.

    path[b, nblocks[b]] = last_state[b]; path[b, t] =
    backptr[b, t, path[b, t+1]] for t < nblocks; tail beyond nblocks is
    filled with last_state (harmless - callers slice to nblocks+1).
    """
    B, T, nstate = backptr.shape

    def step(state, inp):
        bp_t, valid = inp  # [B, nstate], [B]
        prev = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0].astype(
            jnp.int32
        )
        state = jnp.where(valid, prev, state)
        return state, state

    tvalid = jnp.arange(T)[None, :] < nblocks[:, None]
    if _impl() == "seg":
        from .crf_seg import seg_traceback

        # backptr is the identity map at invalid steps (both producers
        # guarantee it), so no separate valid gating is needed
        return seg_traceback(backptr, last_state.astype(jnp.int32), nblocks)
    if _use_pallas():
        from .crf_pallas import traceback_pallas

        states_rev = traceback_pallas(
            jnp.swapaxes(backptr, 0, 1)[::-1],
            jnp.swapaxes(tvalid, 0, 1)[::-1],
            last_state,
        )
    else:
        _, states_rev = _scan_blocked(
            step,
            last_state,
            (jnp.swapaxes(backptr, 0, 1)[::-1], jnp.swapaxes(tvalid, 0, 1)[::-1]),
        )
    path = jnp.concatenate(
        [last_state[:, None], jnp.swapaxes(states_rev, 0, 1)], axis=1
    )[:, ::-1]
    return path


def qpath_from_path(trans, path, nbase: int, idx: TransIndex | None = None):
    """Per-block transition weight along a path (decode.c:188-193).

    qpath[b, t+1] = trans[b, t, param_idx[path[t], path[t+1]]];
    qpath[b, 0] = NaN (reference quirk).
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    pidx = jnp.asarray(np.maximum(idx.param_idx, 0))
    sel = pidx[path[:, :-1], path[:, 1:]]  # [B, T]
    q = jnp.take_along_axis(trans, sel[..., None], axis=-1)[..., 0]
    nan = jnp.full((path.shape[0], 1), jnp.nan, trans.dtype)
    return jnp.concatenate([nan, q], axis=1)


def path_score(trans, path, nblocks, nbase: int, idx: TransIndex | None = None):
    """Total log-weight of a block path: sum over valid blocks of
    trans[t, param_idx[path[t], path[t+1]]].

    With globally-normalised transition weights this is the path
    log-probability, so ``-path_score/nblocks`` is a per-block CRF NLL
    (the training objective for supervised block paths).
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    pidx = jnp.asarray(np.maximum(idx.param_idx, 0))
    sel = pidx[path[:, :-1], path[:, 1:]]  # [B, T]
    q = jnp.take_along_axis(trans, sel[..., None], axis=-1)[..., 0]
    T = trans.shape[1]
    valid = jnp.arange(T)[None, :] < nblocks[:, None]
    return jnp.sum(jnp.where(valid, q, 0.0), axis=1)


def crf_viterbi(trans, nblocks, nbase: int, idx: TransIndex | None = None):
    """Full Viterbi decode: (score [B], path [B, T+1], qpath [B, T+1])."""
    if _impl() == "scanb":
        from .crf_bm import decode_bm

        score, path, qpath, _ = decode_bm(
            trans, nblocks, nbase, viterbi_only=True, compute_trace=False,
            idx=idx,
        )
        return score, path, qpath
    score, last_state, backptr = crf_viterbi_forward(trans, nblocks, nbase, idx=idx)
    path = viterbi_traceback(backptr, last_state, nblocks)
    qpath = qpath_from_path(trans, path, nbase, idx=idx)
    return score, path, qpath


def crf_decode_fused(trans, nblocks, nbase: int, viterbi_only: bool, compute_trace: bool, idx: TransIndex | None = None):
    """One-call decode: (score, path [B,T+1] i32, qpath f32, trace u8).

    In fb mode the Viterbi runs over the per-block-normalised
    transition posterior (src/flappie.c:276-300 semantics); the trace
    is built from exp() of whichever matrix was decoded.  Dispatches
    the whole chain to the batch-minor fast path when selected.
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    if _impl() == "scanb":
        from .crf_bm import decode_bm

        return decode_bm(trans, nblocks, nbase, viterbi_only, compute_trace, idx=idx)
    mat = trans if viterbi_only else crf_transpost(
        trans, nblocks, nbase, return_log=True, idx=idx
    )
    score, path, qpath = crf_viterbi(mat, nblocks, nbase, idx=idx)
    if compute_trace:
        trace = trace_from_posterior(jnp.exp(mat), nbase, idx=idx)
    else:
        trace = jnp.zeros((trans.shape[0], 1, idx.nstate), jnp.uint8)
    return score, path, qpath, trace


M_LOG10E = 0.43429448190325182765  # glibc math.h
# The reference multiplies log1pf(-p) by the *double* -10*M_LOG10E
# (src/util.h:288) and rounds once to float; emulate that without f64
# via a hi/lo split of the constant (double-single product).
_QC = -10.0 * M_LOG10E
_QC_HI = np.float32(_QC)
_QC_LO = np.float32(_QC - float(_QC_HI))


def phred_from_qpath(qpath):
    """Per-block Phred+33 quality bytes from transition log-weights.

    Device version of qscoref/phredf (src/util.h:286-304): p = exp(q)
    clipped at 0.99999, Q = -10*log10(1-p), chr(round(33+Q)) capped at
    126.  Matches decode.seq.phred_chars including its double-precision
    constant multiply (verified over a dense sweep); computing this on
    device shrinks the device->host transfer to one byte per block.
    qpath[0] is NaN (reference quirk); its byte is never consumed
    (change_positions indices start at 1).
    """
    p = jnp.exp(qpath.astype(jnp.float32))
    p = jnp.minimum(p, jnp.float32(0.99999))
    l1p = jnp.log1p(-p)
    q = _QC_HI * l1p + _QC_LO * l1p
    ph = jnp.floor(jnp.float32(33.0) + q + jnp.float32(0.5))
    ph = jnp.where(jnp.isnan(ph), 33.0, ph)
    return jnp.minimum(ph, 126.0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Trace matrix (reference trace_from_posterior, decode.c:499-543)
# ---------------------------------------------------------------------------


def trace_from_posterior(tpost, nbase: int, idx: TransIndex | None = None):
    """exp'd transition posterior [B, T, nparam] -> [B, T+1, nstate]
    uint8 trace (state occupancy probabilities x 255, rounded).
    """
    idx = idx if idx is not None else flipflop_index(nbase)
    nparam, nstate = idx.nparam, idx.nstate
    from_onehot = jnp.asarray(
        np.eye(nstate, dtype=np.float32)[idx.from_state]
    )  # [nparam, nstate]
    to_onehot = jnp.asarray(np.eye(nstate, dtype=np.float32)[idx.to_state])
    first = tpost[:, 0] @ from_onehot  # occupancy before block 0
    rest = tpost @ to_onehot  # occupancy after each block
    occ = jnp.concatenate([first[:, None], rest], axis=1)
    # roundf = half away from zero for the non-negative occupancies
    # (jnp.round is half-to-even and would flip exact .5 bytes);
    # clipped because viterbi-mode traces exponentiate unnormalised
    # weights, where the C stores the int unclamped in an int matrix
    return jnp.clip(jnp.floor(255.0 * occ + 0.5), 0.0, 255.0).astype(jnp.uint8)
