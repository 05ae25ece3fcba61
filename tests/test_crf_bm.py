"""Batch-minor CRF decode (ops/crf_bm.py) vs the sequential reference.

Same contract as the segmented-scan tests: sum-semiring within
float32 reassociation tolerance, max-plus (Viterbi) EXACT on dyadic
inputs including tie order, traceback exact; plus the fused decode
entry against the composed reference chain.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from flappie_tpu.ops import crf
from flappie_tpu.ops.crf import flipflop_index, rle_index


def _with_impl(monkeypatch, impl, fn, *args, **kw):
    monkeypatch.setenv("FLAPPIE_TPU_CRF_IMPL", impl)
    out = fn(*args, **kw)
    monkeypatch.delenv("FLAPPIE_TPU_CRF_IMPL")
    return out


def _random_trans(B, T, nparam, seed=0, dyadic=False):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-4, 4, size=(B, T, nparam)).astype(np.float32)
    if dyadic:
        x = np.round(x * 8.0) / 8.0
    return jnp.asarray(x)


LENGTH_SETS = [
    (3, 300, np.array([300, 257, 123], np.int32)),
    (2, 48, np.array([48, 17], np.int32)),
]


@pytest.mark.parametrize("B,T,nblocks", LENGTH_SETS)
def test_bm_forward_matches_scan(monkeypatch, B, T, nblocks):
    trans = _random_trans(B, T, 40, seed=B * T)
    nb = jnp.asarray(nblocks)
    a_scan, z_scan = _with_impl(monkeypatch, "scan", crf.crf_forward, trans, nb, 4)
    a_bm, z_bm = _with_impl(monkeypatch, "scanb", crf.crf_forward, trans, nb, 4)
    np.testing.assert_allclose(np.asarray(z_bm), np.asarray(z_scan), rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_bm), np.asarray(a_scan), rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("B,T,nblocks", LENGTH_SETS)
@pytest.mark.parametrize("nbase,index_fn", [(4, flipflop_index), (4, rle_index), (5, flipflop_index)])
def test_bm_viterbi_exact_on_dyadic(monkeypatch, B, T, nblocks, nbase, index_fn):
    idx = index_fn(nbase)
    trans = _random_trans(B, T, idx.nparam, seed=T + nbase, dyadic=True)
    nb = jnp.asarray(nblocks)
    s_scan, p_scan, q_scan = _with_impl(
        monkeypatch, "scan", crf.crf_viterbi, trans, nb, nbase, idx=idx)
    s_bm, p_bm, q_bm = _with_impl(
        monkeypatch, "scanb", crf.crf_viterbi, trans, nb, nbase, idx=idx)
    np.testing.assert_array_equal(np.asarray(s_bm), np.asarray(s_scan))
    for b in range(B):
        nbk = int(nblocks[b])
        np.testing.assert_array_equal(
            np.asarray(p_bm)[b, : nbk + 1], np.asarray(p_scan)[b, : nbk + 1]
        )
        np.testing.assert_array_equal(
            np.asarray(q_bm)[b, 1 : nbk + 1], np.asarray(q_scan)[b, 1 : nbk + 1]
        )


@pytest.mark.parametrize("viterbi_only", [False, True])
@pytest.mark.parametrize("compute_trace", [False, True])
def test_bm_fused_decode_matches_composed(monkeypatch, viterbi_only, compute_trace):
    """decode_bm's one-call chain vs the composed scan-path chain:
    paths/traces may differ only where float ulps flip a posterior
    tie; on this fixture they match exactly except a tiny trace band."""
    B, T = 3, 200
    nblocks = np.array([200, 160, 57], np.int32)
    trans = _random_trans(B, T, 40, seed=11)
    nb = jnp.asarray(nblocks)

    s_ref, p_ref, q_ref, tr_ref = _with_impl(
        monkeypatch, "scan", crf.crf_decode_fused, trans, nb, 4,
        viterbi_only, compute_trace)
    s_bm, p_bm, q_bm, tr_bm = _with_impl(
        monkeypatch, "scanb", crf.crf_decode_fused, trans, nb, 4,
        viterbi_only, compute_trace)

    np.testing.assert_allclose(np.asarray(s_bm), np.asarray(s_ref), rtol=2e-5, atol=2e-3)
    for b in range(B):
        nbk = int(nblocks[b])
        np.testing.assert_array_equal(
            np.asarray(p_bm)[b, : nbk + 1], np.asarray(p_ref)[b, : nbk + 1])
        qa = np.asarray(q_ref)[b, 1 : nbk + 1]
        qb = np.asarray(q_bm)[b, 1 : nbk + 1]
        np.testing.assert_allclose(qb, qa, rtol=2e-5, atol=2e-3)
        if compute_trace:
            ta = np.asarray(tr_ref)[b, : nbk + 1].astype(int)
            tb = np.asarray(tr_bm)[b, : nbk + 1].astype(int)
            assert np.abs(ta - tb).max() <= 1


import pytest


@pytest.mark.parametrize("nbase,T", [(4, 75), (5, 40)])
def test_bm_pallas_kernels_match_scans(monkeypatch, nbase, T):
    """The Pallas decode kernels (interpret mode off-TPU) must match
    the blocked-scan batch-minor implementations: max-plus passes
    (viterbi alphas/backpointers, traceback) bit-exactly, sum-semiring
    states to reassociation tolerance, and the full decode_bm chain's
    sequence/path bytes exactly on this input.  nbase=5 covers the 5mC
    model's S=10 state space (odd sublane count)."""
    import numpy as np
    import jax.numpy as jnp

    from flappie_tpu.ops import crf_bm
    from flappie_tpu.ops.crf import flipflop_index

    rng = np.random.default_rng(5)
    B = 8
    idx = flipflop_index(nbase)
    trans = rng.normal(0, 2, size=(B, T, idx.nparam)).astype(np.float32)
    trans[:, 9] = trans[:, 8]  # exact repeats to probe tie order
    nblocks = np.minimum(np.array([T, 60, 1, T, 33, T, 2, 17], np.int32), T)

    trans_tm = jnp.asarray(trans).transpose(1, 2, 0)
    tvalid = jnp.arange(T)[:, None] < jnp.asarray(nblocks)[None, :]
    dense = crf_bm._dense_tm(trans_tm, idx)

    def both(fn, *args):
        monkeypatch.setenv("FLAPPIE_TPU_SCANB_KERNELS", "off")
        a = np.asarray(fn(*args))
        monkeypatch.setenv("FLAPPIE_TPU_SCANB_KERNELS", "on")
        b = np.asarray(fn(*args))
        return a, b

    a, b = both(crf_bm._fwd_states_tm, dense, tvalid)
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-5)
    a, b = both(crf_bm._bwd_states_tm, dense, tvalid)
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-5)

    monkeypatch.setenv("FLAPPIE_TPU_SCANB_KERNELS", "off")
    s_a, l_a, bp_a = (np.asarray(x) for x in crf_bm._viterbi_fwd_tm(dense, tvalid, idx))
    path_a = np.asarray(crf_bm._traceback_tm(jnp.asarray(bp_a), jnp.asarray(l_a), tvalid))
    monkeypatch.setenv("FLAPPIE_TPU_SCANB_KERNELS", "on")
    s_b, l_b, bp_b = (np.asarray(x) for x in crf_bm._viterbi_fwd_tm(dense, tvalid, idx))
    path_b = np.asarray(crf_bm._traceback_tm(jnp.asarray(bp_b), jnp.asarray(l_b), tvalid))
    np.testing.assert_array_equal(s_a, s_b)
    np.testing.assert_array_equal(l_a, l_b)
    np.testing.assert_array_equal(bp_a.astype(np.int32), bp_b.astype(np.int32))
    np.testing.assert_array_equal(path_a, path_b)

    # full chain: identical path/sequence bytes, posterior within band
    monkeypatch.setenv("FLAPPIE_TPU_SCANB_KERNELS", "off")
    score_a, p_a, q_a, tr_a = (np.asarray(x) for x in crf_bm.decode_bm(
        jnp.asarray(trans), jnp.asarray(nblocks), nbase, False, True))
    monkeypatch.setenv("FLAPPIE_TPU_SCANB_KERNELS", "on")
    score_b, p_b, q_b, tr_b = (np.asarray(x) for x in crf_bm.decode_bm(
        jnp.asarray(trans), jnp.asarray(nblocks), nbase, False, True))
    np.testing.assert_array_equal(p_a, p_b)
    np.testing.assert_allclose(score_a, score_b, rtol=0, atol=1e-4)
    assert np.abs(tr_a.astype(int) - tr_b.astype(int)).max() <= 1


@pytest.mark.parametrize("nbase,T", [(4, 75), (5, 40)])
def test_bm_fused_fwdbwd_kernel_bitexact_vs_split(monkeypatch, nbase, T):
    """fwdbwd_states_pallas (alpha and beta chains interleaved in ONE
    kernel) is bit-identical to the separate fwd/bwd kernels: per-chain
    op order is unchanged, only the issue interleaving differs."""
    import numpy as np
    import jax.numpy as jnp

    from flappie_tpu.ops import crf_bm
    from flappie_tpu.ops.crf import flipflop_index
    from flappie_tpu.ops.crf_bm_pallas import (
        bwd_states_pallas,
        fwd_states_pallas,
        fwdbwd_states_pallas,
    )

    rng = np.random.default_rng(7)
    B = 8
    idx = flipflop_index(nbase)
    trans = rng.normal(0, 2, size=(B, T, idx.nparam)).astype(np.float32)
    nblocks = np.minimum(np.array([T, 60, 1, T, 33, T, 2, 17], np.int32), T)

    trans_tm = jnp.asarray(trans).transpose(1, 2, 0)
    tvalid = jnp.arange(T)[:, None] < jnp.asarray(nblocks)[None, :]
    dense = crf_bm._dense_tm(trans_tm, idx)

    # small time block: interpret mode unrolls K steps into the traced
    # graph, and compile time dominates at the default K=64
    from flappie_tpu.ops import crf_bm_pallas

    monkeypatch.setattr(crf_bm_pallas, "TIME_BLOCK", 8)

    a_split = np.asarray(fwd_states_pallas(dense, tvalid, interpret=True))
    b_split = np.asarray(bwd_states_pallas(dense, tvalid, interpret=True))
    a_fused, b_fused = fwdbwd_states_pallas(dense, tvalid, interpret=True)
    np.testing.assert_array_equal(a_split, np.asarray(a_fused))
    np.testing.assert_array_equal(b_split, np.asarray(b_fused))

    # the transpost assembled through the fused path == split path
    monkeypatch.setenv("FLAPPIE_TPU_SCANB_KERNELS", "on")
    monkeypatch.setenv("FLAPPIE_TPU_SCANB_FB", "split")
    tp_split = np.asarray(crf_bm._transpost_tm(trans_tm, tvalid, idx))
    monkeypatch.setenv("FLAPPIE_TPU_SCANB_FB", "fused")
    tp_fused = np.asarray(crf_bm._transpost_tm(trans_tm, tvalid, idx))
    np.testing.assert_array_equal(tp_split, tp_fused)
