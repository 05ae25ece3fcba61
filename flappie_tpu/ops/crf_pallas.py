"""Pallas TPU kernels for the CRF time scans.

The CRF decode state is tiny ([B, nstate]), so even the blocked
lax.scan spends most of its time in loop machinery and HBM round-trips
of the carried state.  These kernels mirror ops/rnn_pallas.py: the
state lives in VMEM scratch across a time-blocked grid, the dense
transition blocks stream through the pipeline, and each step applies
the same masked log-semiring update as the scan implementations in
ops/crf.py (the scan path remains the CPU/parity implementation and the
numerical reference).

Layout note: TPU VMEM tiles the two minor dims to (8, 128), so a
[K, B, S, S] block with S=8 pads its last dim 16x and blows the scoped
VMEM budget.  The transition blocks are therefore streamed flat as
[K, B, S*S] and the per-step reduction over the 'from' state is a
statically unrolled loop over S row slices.

Three kernels: sum-semiring forward (also used, reversed and
transposed, for the backward pass), max-plus forward with int8
backpointers (Viterbi), and the serial traceback walk.  Validity masks
are int32 (Mosaic has no i1 vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_slices(m_flat, S):
    """[B, S*S] (from-major) -> list of S arrays [B, S], one per from."""
    return [m_flat[:, f * S : (f + 1) * S] for f in range(S)]


def _fwd_kernel(S, x_ref, v_ref, out_ref, a_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    K = x_ref.shape[0]

    def step(k, a):
        rows = _row_slices(x_ref[k], S)
        zs = [a[:, f][:, None] + rows[f] for f in range(S)]
        mx = zs[0]
        for z in zs[1:]:
            mx = jnp.maximum(mx, z)
        acc = jnp.exp(zs[0] - mx)
        for z in zs[1:]:
            acc = acc + jnp.exp(z - mx)
        nxt = mx + jnp.log(acc)
        # arithmetic blend: Mosaic cannot relayout broadcast i1 masks
        vf = v_ref[k][:, None].astype(jnp.float32)
        a = vf * nxt + (1.0 - vf) * a
        out_ref[k] = a
        return a

    a_ref[:] = lax.fori_loop(0, K, step, a_ref[:], unroll=True)


def _viterbi_kernel(S, x_ref, v_ref, rank_ref, alpha_out, bp_out, a_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    from .crf import RANK_BIG

    K = x_ref.shape[0]
    rank_rows = [rank_ref[f][None, :] for f in range(S)]

    def step(k, a):
        rows = _row_slices(x_ref[k], S)
        zs = [a[:, f][:, None] + rows[f] for f in range(S)]
        best = zs[0]
        for z in zs[1:]:
            best = jnp.maximum(best, z)
        # backpointer = from-state whose score equals best with the
        # lowest tie_rank, matching the reference decode loops' strict->
        # candidate orders (see crf.TransIndex.tie_rank); tracked int32
        # (int8 vregs tile (32, 128) and Mosaic cannot relayout the
        # f32-tiled i1 compare mask onto them)
        minrank = jnp.full(best.shape, RANK_BIG, jnp.int32)
        bp = jnp.zeros(best.shape, dtype=jnp.int32)
        for f in range(S):
            rf = jnp.where(zs[f] == best, rank_rows[f], RANK_BIG)
            better = rf < minrank
            minrank = jnp.where(better, rf, minrank)
            bp = jnp.where(better, f, bp)
        vf = v_ref[k][:, None].astype(jnp.float32)
        a = vf * best + (1.0 - vf) * a
        vi = v_ref[k][:, None]  # int32 0/1
        iota = lax.broadcasted_iota(jnp.int32, bp.shape, 1)
        bp = vi * bp + (1 - vi) * iota
        alpha_out[k] = a
        bp_out[k] = bp
        return a

    a_ref[:] = lax.fori_loop(0, K, step, a_ref[:], unroll=True)


def _traceback_kernel(bp_ref, v_ref, last_state_ref, out_ref, s_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        s_ref[:] = last_state_ref[:]

    K, B, S = bp_ref.shape

    def step(k, s):
        # bp_ref[k]: [B, S] int32 backpointers; s: [B, 1] int32.
        # Select bp[b, s[b]] without a gather (Mosaic's gather rule is
        # restrictive): one-hot against an iota, arithmetic reduce.
        onehot = (lax.broadcasted_iota(jnp.int32, (B, S), 1) == s).astype(
            jnp.int32
        )
        prev = jnp.sum(onehot * bp_ref[k], axis=1, keepdims=True)
        vi = v_ref[k][:, None]  # int32 0/1
        s = vi * prev + (1 - vi) * s
        out_ref[k] = s
        return s

    s_ref[:] = lax.fori_loop(0, K, step, s_ref[:], unroll=True)


TIME_BLOCK = 32


def _pad_time(arrs, K):
    T = arrs[0].shape[0]
    Tp = -(-T // K) * K
    if Tp != T:
        arrs = [
            jnp.pad(a, [(0, Tp - T)] + [(0, 0)] * (a.ndim - 1)) for a in arrs
        ]
    return arrs, T, Tp


def fwd_scan_pallas(dense_tm, valid_tm, interpret=None):
    """dense_tm: [T, B, S, S], valid_tm: [T, B] bool -> alphas [T, B, S]
    (the running state AFTER each block; caller prepends alpha_0 = 0)."""
    if interpret is None:
        interpret = _use_interpret()
    K = TIME_BLOCK
    T0, B, S, _ = dense_tm.shape
    dense_tm = dense_tm.reshape(T0, B, S * S)
    valid_tm = valid_tm.astype(jnp.int32)  # Mosaic has no i1 vectors
    (dense_tm, valid_tm), T, Tp = _pad_time([dense_tm, valid_tm], K)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, S),
        grid=(Tp // K,),
        in_specs=[
            pl.BlockSpec((K, B, S * S), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, B, S), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(dense_tm, valid_tm)
    return out[:T]


def viterbi_scan_pallas(dense_tm, valid_tm, tie_rank=None, interpret=None):
    """Max-plus forward: returns (alphas [T, B, S], backptr [T, B, S] int8).

    tie_rank: [S, S] int array (see crf.TransIndex.tie_rank); defaults
    to lowest-from-index priority.  Note: only alphas[-1] is consumed
    by the caller; emitting the full array costs an extra [T, B, S]
    HBM stream that a final-carry-only output would avoid."""
    if interpret is None:
        interpret = _use_interpret()
    K = TIME_BLOCK
    T0, B, S, _ = dense_tm.shape
    if tie_rank is None:
        tie_rank = np.tile(np.arange(S, dtype=np.int32)[:, None], (1, S))
    dense_tm = dense_tm.reshape(T0, B, S * S)
    valid_tm = valid_tm.astype(jnp.int32)
    (dense_tm, valid_tm), T, Tp = _pad_time([dense_tm, valid_tm], K)
    rank_arr = jnp.asarray(np.asarray(tie_rank, dtype=np.int32))
    alphas, bps = pl.pallas_call(
        functools.partial(_viterbi_kernel, S),
        grid=(Tp // K,),
        in_specs=[
            pl.BlockSpec((K, B, S * S), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, B, S), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B, S), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, S), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, S), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(dense_tm, valid_tm, rank_arr)
    return alphas[:T], bps[:T].astype(jnp.int8)


def traceback_pallas(backptr_rev_tm, valid_rev_tm, last_state, interpret=None):
    """Walk backpointers (already time-reversed): backptr_rev_tm
    [T, B, S] int backpointers, valid_rev_tm [T, B], last_state [B]
    int32 -> states [T, B] int32 (reversed order, state BEFORE each
    block)."""
    if interpret is None:
        interpret = _use_interpret()
    K = TIME_BLOCK
    backptr_rev_tm = backptr_rev_tm.astype(jnp.int32)  # no int8 in-kernel
    valid_rev_tm = valid_rev_tm.astype(jnp.int32)
    (bp, valid), T, Tp = _pad_time([backptr_rev_tm, valid_rev_tm], K)
    _, B, S = bp.shape
    out = pl.pallas_call(
        _traceback_kernel,
        grid=(Tp // K,),
        in_specs=[
            pl.BlockSpec((K, B, S), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, B, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.int32)],
        interpret=interpret,
    )(bp, valid, last_state[:, None].astype(jnp.int32))
    return out[:T, :, 0]
