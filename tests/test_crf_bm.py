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
