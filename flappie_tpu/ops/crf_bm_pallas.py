"""Pallas kernels for the batch-minor CRF decode scans.

ops/crf_bm.py already fixed the LAYOUT (batch on the 128-lane axis, so
every [S, S, B] step tile is dense); what remains is LOOP overhead:
the blocked lax.scan costs ~14.7 ms for the fb decode chain at
[128, 2560] (docs/BENCH_decode_r3.json) while the per-step arithmetic
is ~30 VPU ops on 32 KB of VMEM.  These kernels mirror
ops/rnn_pallas.py: the carried state ([S, B], one f32 tile) lives in
VMEM scratch across a time-blocked grid, the dense transition blocks
stream through the automatic pipeline, K steps run unrolled per grid
step, and backward scans walk the grid in reverse (no time-reversed
copies in HBM).

Step formulations are the same as crf_bm's scan bodies (same reduction
axes and masking blends); max-plus results are bit-exact vs the scan,
the sum semiring agrees to reassociation tolerance (the CPU parity /
golden suites keep running the scan implementations; these kernels are
the TPU fast path, certified on hardware by the fixture parity +
accuracy artifacts).
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


TIME_BLOCK = 64  # sweep optimum at S=8, B=128 (BENCH_decode_r3)
VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16M scoped limit


def _time_block(per_step_bytes: int) -> int:
    """Largest power-of-two K <= TIME_BLOCK whose double-buffered
    pipeline working set fits VMEM (the 5mC model's S=10 states at
    CB=256 overflow the scoped limit at a fixed K=64)."""
    K = TIME_BLOCK
    while K > 1 and K * per_step_bytes > VMEM_BUDGET:
        K //= 2
    return K


def _pad_time(arrs, K):
    T = arrs[0].shape[0]
    Tp = -(-T // K) * K
    if Tp != T:
        arrs = [
            jnp.pad(a, [(0, Tp - T)] + [(0, 0)] * (a.ndim - 1)) for a in arrs
        ]
    return arrs, T, Tp


def _lse_over(z, axis):
    """max + log-sum-exp over one S axis (finite inputs: forbidden
    transitions are NEG_BIG, not -inf)."""
    mx = jnp.max(z, axis=axis)
    return mx + jnp.log(jnp.sum(jnp.exp(z - jnp.expand_dims(mx, axis)), axis=axis))


def _sum_kernel(backward, x_ref, v_ref, out_ref, a_ref):
    """Sum-semiring scan: forward (alpha) or backward (beta) depending
    on the reduction axis; grid+block order reversed when backward."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    K = x_ref.shape[0]

    def step(k, a):
        kk = (K - 1 - k) if backward else k
        m = x_ref[kk]  # [S, S, B] (from, to, B)
        if backward:
            nxt = _lse_over(m + a[None, :, :], axis=1)
        else:
            nxt = _lse_over(a[:, None, :] + m, axis=0)
        vf = v_ref[kk][None, :].astype(jnp.float32)  # [1, B]
        a = vf * nxt + (1.0 - vf) * a
        out_ref[kk] = a
        return a

    a_ref[:] = lax.fori_loop(0, K, step, a_ref[:], unroll=True)


def _fwdbwd_kernel(xf_ref, vf_ref, xb_ref, vb_ref, aout_ref, bout_ref,
                   a_ref, b_ref):
    """Alpha (forward) and beta (backward) chains interleaved in one
    kernel.  The chains are independent (they meet only in the
    posterior, computed outside), so interleaving halves the serial
    pass count over T; per-chain op order is identical to _sum_kernel,
    hence bit-identical outputs.  The dense blocks stream twice (one
    forward-mapped, one reverse-mapped input spec over the same
    array)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    K = xf_ref.shape[0]

    def step(k, carry):
        a, bv = carry
        kk = K - 1 - k
        # forward chain: block k of the forward stream
        mf = xf_ref[k]
        nf = _lse_over(a[:, None, :] + mf, axis=0)
        vf = vf_ref[k][None, :].astype(jnp.float32)
        a = vf * nf + (1.0 - vf) * a
        # backward chain: block kk of the reverse stream
        mb = xb_ref[kk]
        nb = _lse_over(mb + bv[None, :, :], axis=1)
        vb = vb_ref[kk][None, :].astype(jnp.float32)
        bv = vb * nb + (1.0 - vb) * bv
        aout_ref[k] = a
        bout_ref[kk] = bv
        return a, bv

    a, bv = lax.fori_loop(0, K, step, (a_ref[:], b_ref[:]), unroll=True)
    a_ref[:] = a
    b_ref[:] = bv


def _viterbi_kernel(S, x_ref, v_ref, rank_ref, alpha_out, bp_out, a_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    from .crf import RANK_BIG

    K = x_ref.shape[0]
    rank = rank_ref[:][:, :, None]  # [from, to, 1] (2-D+ values for Mosaic)

    def step(k, a):
        m = x_ref[k]  # [S, S, B]
        z = a[:, None, :] + m
        best = jnp.max(z, axis=0)  # [S, B]
        minrank = jnp.full(best.shape, RANK_BIG, jnp.int32)
        bp = jnp.zeros(best.shape, jnp.int32)
        for f in range(S):
            rf = jnp.where(z[f] == best, rank[f], RANK_BIG)
            better = rf < minrank
            minrank = jnp.where(better, rf, minrank)
            bp = jnp.where(better, f, bp)
        vf = v_ref[k][None, :].astype(jnp.float32)
        a = vf * best + (1.0 - vf) * a
        vi = v_ref[k][None, :]  # int32 0/1
        iota = lax.broadcasted_iota(jnp.int32, bp.shape, 0)
        bp = vi * bp + (1 - vi) * iota
        alpha_out[k] = a
        bp_out[k] = bp
        return a

    a_ref[:] = lax.fori_loop(0, K, step, a_ref[:], unroll=True)


def _traceback_kernel(bp_ref, v_ref, last_ref, out_ref, s_ref):
    """Backward walk: grid and in-block order reversed; state [1, B]."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        s_ref[:] = last_ref[:]

    K, S, B = bp_ref.shape

    def step(k, s):
        kk = K - 1 - k
        onehot = (lax.broadcasted_iota(jnp.int32, (S, B), 0) == s).astype(
            jnp.int32
        )
        prev = jnp.sum(onehot * bp_ref[kk], axis=0, keepdims=True)
        vi = v_ref[kk][None, :]
        s = vi * prev + (1 - vi) * s
        out_ref[kk] = s
        return s

    s_ref[:] = lax.fori_loop(0, K, step, s_ref[:], unroll=True)


def fwd_states_pallas(dense_tm, tvalid_tm, interpret=None):
    """[T, S, S, B], [T, B] -> alphas [T+1, S, B] (a0 = 0 prepended)."""
    if interpret is None:
        interpret = _use_interpret()
    T0, S, _, B = dense_tm.shape
    K = _time_block(2 * 4 * S * B * (S + 1))
    valid = tvalid_tm.astype(jnp.int32)
    (dense, valid), T, Tp = _pad_time([dense_tm, valid], K)
    out = pl.pallas_call(
        functools.partial(_sum_kernel, False),
        grid=(Tp // K,),
        in_specs=[
            pl.BlockSpec((K, S, S, B), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, S, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(dense, valid)
    a0 = jnp.zeros((1, S, B), dense_tm.dtype)
    return jnp.concatenate([a0, out[:T]], axis=0)


def bwd_states_pallas(dense_tm, tvalid_tm, interpret=None):
    """[T, S, S, B], [T, B] -> betas [T+1, S, B] (beta[T] = 0).

    The kernel walks the grid (and in-block steps) from the sequence
    end; out[t] = beta_t, the state BEFORE block t in natural order.
    """
    if interpret is None:
        interpret = _use_interpret()
    T0, S, _, B = dense_tm.shape
    K = _time_block(2 * 4 * S * B * (S + 1))
    valid = tvalid_tm.astype(jnp.int32)
    (dense, valid), T, Tp = _pad_time([dense_tm, valid], K)
    N = Tp // K
    rmap = lambda t: (N - 1 - t, 0, 0, 0)
    out = pl.pallas_call(
        functools.partial(_sum_kernel, True),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((K, S, S, B), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (N - 1 - t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, S, B), lambda t: (N - 1 - t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(dense, valid)
    # out[t] = state after processing block t walking backwards = beta_t;
    # beta_{T..Tp} = 0 (padded blocks are invalid -> state frozen at 0
    # until the first valid block from the end)
    b_end = jnp.zeros((1, S, B), dense_tm.dtype)
    return jnp.concatenate([out[:T], b_end], axis=0)


def fwdbwd_states_pallas(dense_tm, tvalid_tm, interpret=None):
    """One fused pallas_call computing BOTH scans of the posterior:
    (alphas [T+1, S, B], betas [T+1, S, B]).  Bit-identical to
    fwd_states_pallas + bwd_states_pallas (same per-chain op order).
    Opt-in (FLAPPIE_TPU_SCANB_FB=fused) — measured SLOWER than the
    split kernels on chip (3.19 vs 2.82 ms fb chain at [128, 2560],
    docs/PROBE_fb_r3.json): the dense blocks stream twice, and the
    doubled DMA costs more than the halved serial pass count saves."""
    if interpret is None:
        interpret = _use_interpret()
    T0, S, _, B = dense_tm.shape
    # two double-buffered dense streams + two outs + two valid streams
    K = _time_block(2 * 2 * 4 * S * B * (S + 1))
    valid = tvalid_tm.astype(jnp.int32)
    (dense, valid), T, Tp = _pad_time([dense_tm, valid], K)
    N = Tp // K
    fmap4 = lambda t: (t, 0, 0, 0)
    rmap4 = lambda t: (N - 1 - t, 0, 0, 0)
    alphas, betas = pl.pallas_call(
        _fwdbwd_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((K, S, S, B), fmap4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, S, S, B), rmap4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (N - 1 - t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, S, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, S, B), lambda t: (N - 1 - t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, S, B), jnp.float32),
            jax.ShapeDtypeStruct((Tp, S, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, B), jnp.float32),
            pltpu.VMEM((S, B), jnp.float32),
        ],
        interpret=interpret,
    )(dense, valid, dense, valid)
    a0 = jnp.zeros((1, S, B), dense_tm.dtype)
    b_end = jnp.zeros((1, S, B), dense_tm.dtype)
    return (
        jnp.concatenate([a0, alphas[:T]], axis=0),
        jnp.concatenate([betas[:T], b_end], axis=0),
    )


def viterbi_fwd_pallas(dense_tm, tvalid_tm, tie_rank, interpret=None):
    """Max-plus forward: (alpha_final [S, B], backptr [T, S, B] int32)."""
    if interpret is None:
        interpret = _use_interpret()
    T0, S, _, B = dense_tm.shape
    K = _time_block(2 * 4 * S * B * (S + 2))
    valid = tvalid_tm.astype(jnp.int32)
    (dense, valid), T, Tp = _pad_time([dense_tm, valid], K)
    rank = jnp.asarray(np.asarray(tie_rank, np.int32))
    alphas, bps = pl.pallas_call(
        functools.partial(_viterbi_kernel, S),
        grid=(Tp // K,),
        in_specs=[
            pl.BlockSpec((K, S, S, B), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, S, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, S, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, S, B), jnp.float32),
            jax.ShapeDtypeStruct((Tp, S, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(dense, valid, rank)
    # invalid steps freeze the carry per lane, so the last row holds
    # every lane's final alpha regardless of its own nblocks
    return alphas[-1], bps[:T]


def traceback_pallas(backptr_tm, tvalid_tm, last_state, interpret=None):
    """[T, S, B] int backptr, [T, B] valid, [B] last -> path [T+1, B]."""
    if interpret is None:
        interpret = _use_interpret()
    T0, S, B = backptr_tm.shape
    K = _time_block(2 * 4 * B * (S + 1))
    bp = backptr_tm.astype(jnp.int32)
    valid = tvalid_tm.astype(jnp.int32)
    (bp, valid), T, Tp = _pad_time([bp, valid], K)
    N = Tp // K
    out = pl.pallas_call(
        _traceback_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((K, S, B), lambda t: (N - 1 - t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, B), lambda t: (N - 1 - t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1, B), lambda t: (N - 1 - t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, 1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
        interpret=interpret,
    )(bp, valid, last_state[None, :].astype(jnp.int32))
    # out[t] = state BEFORE block t; append last_state (state after the
    # final block -- identical at frozen padded tails)
    return jnp.concatenate([out[:T, 0], last_state[None, :].astype(jnp.int32)], axis=0)
