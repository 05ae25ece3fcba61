"""Segmented (two-level) CRF scans: the latency-escape for decode.

The sequential decode scans in ops/crf.py advance a tiny [B, nstate]
state one block at a time: at tens of kiloblocks they are bound by TPU
loop latency (~10s of ms for a full fb+viterbi decode), not by compute
or bandwidth.  Both semirings involved are associative:

- forward/backward:  (+, logsumexp)  over [S, S] transition matrices
- Viterbi:           (+, max)        over the same matrices
- traceback:         composition of maps  [S] -> [S]

so the prefix state vectors can be computed with the classic two-level
segmented scan: split time into G groups of L steps, (A) scan the
group-local prefix *matrix* products in parallel over all groups -- L
serial steps on [B, S, S, G] operands instead of T serial steps on
[B, S] -- then (B) combine the G group-final matrices serially (G ~=
T/L tiny steps), and (C) recover every per-step state vector with one
fully parallel vector x prefix-matrix product.  Serial depth drops
from T to L + T/L.

Layout note (the perf-critical choice): the state dims are tiny (S=8
or 10), so tensors ending in [..., S, S] waste 15/16 of every VPU
register (the minor dim pads to the 128-lane width).  All hot
intermediates here therefore keep the *group* axis G minor --
[B, S, S, G] -- so lanes are fully populated and the S-dim broadcasts
live on sublanes.

Per-read validity is folded in by replacing invalid steps' transition
matrices with the semiring identity (0 diagonal, -inf off-diagonal),
which freezes the running state exactly like the sequential masks.

Numerics: the semirings are associative in exact arithmetic but
float32 reassociation shifts results by ~1e-6 relative per level, so
this path is NOT bit-identical to the sequential scans; the sequential
implementation remains the parity/golden reference
(FLAPPIE_TPU_CRF_IMPL=scan).  Viterbi *tie-breaking* is unaffected
structurally: backpointers are recovered elementwise from the alpha
vectors with the same tie_rank argmin as the sequential step, so any
sequence difference comes only from value ulps, not from tie order.

Reference semantics being accelerated: src/decode.c:119-204 (Viterbi),
:377-498 (forward/backward transition posterior), src/layers.c:1035
(partition function).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG_BIG = -3.0e38

# Group length: serial depth of phase A.  T=16k blocks -> G=128 groups;
# phases A and B are then both ~128 serial steps.
SEG_L = 128


def _lse(x, axis):
    return jax.scipy.special.logsumexp(x, axis=axis)


def _identity_mat(S, dtype):
    return jnp.where(jnp.eye(S, dtype=bool), 0.0, NEG_BIG).astype(dtype)


def _masked_dense(dense, nblocks):
    """Replace invalid steps' matrices with the semiring identity.

    dense: [B, T, S, S]; nblocks: [B].  Works for both semirings (the
    identity is the same).
    """
    B, T, S, _ = dense.shape
    valid = (jnp.arange(T)[None, :] < nblocks[:, None])[..., None, None]
    return jnp.where(valid, dense, _identity_mat(S, dense.dtype))


def _scan_unrolled(step, init, xs, K: int = 8):
    """lax.scan with K-step unroll (xs leading dim must divide by K)."""
    T = jax.tree.leaves(xs)[0].shape[0]
    assert T % K == 0
    xs = jax.tree.map(lambda a: a.reshape((T // K, K) + a.shape[1:]), xs)

    def blk(carry, xk):
        outs = []
        for k in range(K):
            carry, y = step(carry, jax.tree.map(lambda a: a[k], xk))
            outs.append(y)
        return carry, jnp.stack(outs)

    carry, ys = lax.scan(blk, init, xs)
    return carry, ys.reshape((T,) + ys.shape[2:])


# -- semiring ops in lanes-minor layout [..., S, S, G] / [..., S, G] ------


def _mm_lse(a, b):
    # out[..., i, j, g] = lse_k a[..., i, k, g] + b[..., k, j, g]
    return _lse(a[..., :, :, None, :] + b[..., None, :, :, :], axis=-3)


def _vm_lse(v, m):
    # out[..., j, g] = lse_k v[..., k, g] + m[..., k, j, g]
    return _lse(v[..., :, None, :] + m, axis=-3)


def _mm_max(a, b):
    return jnp.max(a[..., :, :, None, :] + b[..., None, :, :, :], axis=-3)


def _vm_max(v, m):
    return jnp.max(v[..., :, None, :] + m, axis=-3)


def _prefix_vectors(dense_masked, v0, mm, vm, vv, L: int = SEG_L):
    """All prefix state vectors of an associative semiring scan.

    dense_masked: [B, T, S, S] step matrices (identity at invalid steps)
    v0: [B, S] initial vector
    mm(a, b): semiring matmul in [..., S, S, G] layout
    vm(v, m): semiring vec-mat, [..., S, G] x [..., S, S, G]
    vv(v, m): semiring vec-mat on plain [B, S] x [B, S, S] (phase B)

    Returns states [B, T, S] where states[:, t] is the vector after
    applying steps 0..t.
    """
    B, T, S, _ = dense_masked.shape
    G = -(-T // L)
    Tp = G * L
    if Tp != T:
        pad = jnp.broadcast_to(
            _identity_mat(S, dense_masked.dtype), (B, Tp - T, S, S)
        )
        dense_masked = jnp.concatenate([dense_masked, pad], axis=1)

    # [L, B, S, S, G]: scan over the within-group step index, G on lanes
    m = dense_masked.reshape(B, G, L, S, S).transpose(2, 0, 3, 4, 1)

    # Phase A: group-local prefix matrices, L serial steps over [B, G]
    def stepA(carry, mt):
        nxt = mm(carry, mt)
        return nxt, nxt

    ident = jnp.broadcast_to(
        _identity_mat(S, m.dtype)[None, :, :, None], (B, S, S, G)
    )
    finals, prefixes = _scan_unrolled(stepA, ident, m)  # [L, B, S, S, G]

    # Phase B: start vector of each group, G serial steps on [B, S]
    def stepB(v, f):
        return vv(v, f), v  # emit the vector *before* applying group g

    fg = finals.transpose(3, 0, 1, 2)  # [G, B, S, S]
    _, starts = _scan_unrolled(stepB, v0, fg, K=1)  # [G, B, S]

    # Phase C: fully parallel vector x prefix-matrix products
    sv = starts.transpose(1, 2, 0)[None]  # [1, B, S, G]
    states = vm(sv, prefixes)  # [L, B, S, G]
    states = states.transpose(1, 3, 0, 2).reshape(B, Tp, S)[:, :T]
    return states


def _vv_lse(v, m):
    # v: [B, S], m: [B, S, S] -> [B, S]
    return _lse(v[:, :, None] + m, axis=1)


def _vv_max(v, m):
    return jnp.max(v[:, :, None] + m, axis=1)


def seg_forward_states(dense, nblocks):
    """alphas [B, T+1, S] of the sum-semiring forward scan (alpha[0]=0)."""
    B, T, S, _ = dense.shape
    md = _masked_dense(dense, nblocks)
    v0 = jnp.zeros((B, S), dense.dtype)
    states = _prefix_vectors(md, v0, _mm_lse, _vm_lse, _vv_lse)
    return jnp.concatenate([v0[:, None], states], axis=1)


def seg_backward_states(dense, nblocks):
    """betas [B, T+1, S]: beta[T]=0, beta[t] = lse_j(m[t][i,j]+beta[t+1][j]).

    Computed as a forward scan over reversed time on transposed
    matrices (the same trick the sequential path uses).
    """
    B, T, S, _ = dense.shape
    md = _masked_dense(dense, nblocks)
    md_rev = jnp.flip(md, axis=1).swapaxes(-1, -2)
    v0 = jnp.zeros((B, S), dense.dtype)
    states = _prefix_vectors(md_rev, v0, _mm_lse, _vm_lse, _vv_lse)
    return jnp.concatenate([v0[:, None], states], axis=1)[:, ::-1]


def seg_viterbi_states(dense, nblocks):
    """Max-plus alphas [B, T+1, S] (alpha[0] = 0)."""
    B, T, S, _ = dense.shape
    md = _masked_dense(dense, nblocks)
    v0 = jnp.zeros((B, S), dense.dtype)
    states = _prefix_vectors(md, v0, _mm_max, _vm_max, _vv_max)
    return jnp.concatenate([v0[:, None], states], axis=1)


def seg_backptr(alphas, dense, nblocks, tie_rank, RANK_BIG=10**6):
    """Backpointers recovered elementwise from max-plus prefix vectors.

    bp[b, t, to] = argmin-tie_rank over {from : alpha[t][from] +
    m[t][from, to] == max}, the exact formula of the sequential Viterbi
    step (so tie ORDER is identical; only value ulps can differ).
    Computed in the lanes-minor [B, S, S, T] layout.
    """
    B, T, S, _ = dense.shape
    md = _masked_dense(dense, nblocks)
    md_t = md.transpose(0, 2, 3, 1)  # [B, from, to, T]
    a_t = alphas[:, :-1].transpose(0, 2, 1)  # [B, from, T]
    scores = a_t[:, :, None, :] + md_t  # [B, from, to, T]
    best = jnp.max(scores, axis=1)  # [B, to, T]
    rank = jnp.asarray(tie_rank)[None, :, :, None]
    masked_rank = jnp.where(scores == best[:, None], rank, RANK_BIG)
    bp = jnp.argmin(masked_rank, axis=1)  # [B, to, T] int32
    bp = bp.transpose(0, 2, 1).astype(jnp.int8)  # [B, T, to]
    # Invalid steps: identity, set explicitly (the rank argmin cannot
    # recover it when tie_rank[to, to] is unset, e.g. RLE move states)
    valid = (jnp.arange(T)[None, :] < nblocks[:, None])[..., None]
    return jnp.where(valid, bp, jnp.arange(S, dtype=jnp.int8)[None, None, :])


def seg_traceback(backptr, last_state, nblocks, L: int = SEG_L):
    """Path [B, T+1] via segmented composition of the int maps.

    Sequential recurrence: path[T] = last_state, path[t] =
    backptr[t][path[t+1]].  Map composition is associative, so the same
    two-level structure applies with gathers instead of matmuls.
    backptr at invalid steps must be the identity map (guaranteed by
    seg_backptr / the sequential step's masking).
    """
    B, T, S = backptr.shape
    g = jnp.flip(backptr, axis=1)  # g[i] = backptr[T-1-i], maps s_i -> s_{i+1}
    G = -(-T // L)
    Tp = G * L
    if Tp != T:
        pad = jnp.broadcast_to(
            jnp.arange(S, dtype=backptr.dtype)[None, None], (B, Tp - T, S)
        )
        g = jnp.concatenate([g, pad], axis=1)
    m = g.reshape(B, G, L, S).transpose(2, 0, 1, 3)  # [L, B, G, S]

    def compose(a, b):
        # (b after a): s -> b[a[s]]
        return jnp.take_along_axis(b, a.astype(jnp.int32), axis=-1).astype(a.dtype)

    # Phase A: within-group prefix maps P[l] = g_l o ... o g_0
    def stepA(carry, gt):
        nxt = compose(carry, gt)
        return nxt, nxt

    ident = jnp.broadcast_to(
        jnp.arange(S, dtype=backptr.dtype)[None, None], (B, G, S)
    )
    finals, prefixes = _scan_unrolled(stepA, ident, m)  # [L, B, G, S]

    # Phase B: start STATE of each group (walk last_state through the
    # group-final maps serially; G tiny steps on [B])
    def stepB(state, f):
        nxt = jnp.take_along_axis(f, state[:, None].astype(jnp.int32), axis=1)[
            :, 0
        ].astype(jnp.int32)
        return nxt, state  # emit the state *before* applying group g

    _, starts = _scan_unrolled(
        stepB, last_state.astype(jnp.int32), finals.transpose(1, 0, 2), K=1
    )  # [G, B]

    # Phase C: states[l, b, g] = P[l, b, g][ starts[g, b] ]
    idx = starts.transpose(1, 0)[None, :, :, None]  # [1, B, G, 1]
    states = jnp.take_along_axis(
        prefixes, jnp.broadcast_to(idx, prefixes.shape[:-1] + (1,)).astype(jnp.int32), axis=-1
    )[..., 0]  # [L, B, G]
    states = states.transpose(1, 2, 0).reshape(B, Tp)[:, :T]
    # states[:, i] is path[T-1-i]; append last_state at the end and flip
    path = jnp.concatenate(
        [last_state[:, None].astype(states.dtype), states], axis=1
    )[:, ::-1]
    return path.astype(jnp.int32)
