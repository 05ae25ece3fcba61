"""Segmented CRF scans (ops/crf_seg.py) vs the sequential reference.

The sequential blocked scans in ops/crf.py are the parity
implementation (golden-tested against the C oracle); these tests pin
the segmented fast path to them:

- sum-semiring (forward/backward/transpost): equal within float32
  reassociation tolerance;
- max-plus (Viterbi): with dyadic inputs (multiples of 1/8) every sum
  is exact in float32 regardless of association, so scores, paths and
  tie-breaking must match EXACTLY;
- traceback composition: pure integer ops, exact for any backptr.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from flappie_tpu.ops import crf
from flappie_tpu.ops.crf import flipflop_index, rle_index

SEG = {"FLAPPIE_TPU_CRF_IMPL": "seg"}
SCAN = {"FLAPPIE_TPU_CRF_IMPL": "scan"}


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
    (3, 300, np.array([300, 257, 123], np.int32)),   # T not a multiple of L
    (2, 256, np.array([256, 200], np.int32)),        # T == 2*L exactly
    (2, 50, np.array([50, 17], np.int32)),           # T < L
]


@pytest.mark.parametrize("B,T,nblocks", LENGTH_SETS)
def test_seg_forward_backward_match_scan(monkeypatch, B, T, nblocks):
    idx = flipflop_index(4)
    trans = _random_trans(B, T, idx.nparam, seed=B * T)
    nb = jnp.asarray(nblocks)

    a_scan, z_scan = _with_impl(monkeypatch, "scan", crf.crf_forward, trans, nb, 4)
    a_seg, z_seg = _with_impl(monkeypatch, "seg", crf.crf_forward, trans, nb, 4)
    np.testing.assert_allclose(np.asarray(z_seg), np.asarray(z_scan), rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_seg), np.asarray(a_scan), rtol=2e-5, atol=2e-3)

    b_scan = _with_impl(monkeypatch, "scan", crf.crf_backward, trans, nb, 4)
    b_seg = _with_impl(monkeypatch, "seg", crf.crf_backward, trans, nb, 4)
    np.testing.assert_allclose(np.asarray(b_seg), np.asarray(b_scan), rtol=2e-5, atol=2e-3)

    # the frozen tail: alphas beyond each read's nblocks stay constant
    a = np.asarray(a_seg)
    for b in range(B):
        nbk = int(nblocks[b])
        np.testing.assert_array_equal(
            a[b, nbk:], np.broadcast_to(a[b, nbk], a[b, nbk:].shape)
        )


@pytest.mark.parametrize("B,T,nblocks", LENGTH_SETS)
def test_seg_transpost_matches_scan(monkeypatch, B, T, nblocks):
    idx = flipflop_index(4)
    trans = _random_trans(B, T, idx.nparam, seed=7)
    nb = jnp.asarray(nblocks)
    p_scan = _with_impl(monkeypatch, "scan", crf.crf_transpost, trans, nb, 4)
    p_seg = _with_impl(monkeypatch, "seg", crf.crf_transpost, trans, nb, 4)
    for b in range(B):
        nbk = int(nblocks[b])
        np.testing.assert_allclose(
            np.asarray(p_seg)[b, :nbk], np.asarray(p_scan)[b, :nbk],
            rtol=2e-5, atol=2e-3,
        )


@pytest.mark.parametrize("B,T,nblocks", LENGTH_SETS)
@pytest.mark.parametrize("nbase,index_fn", [(4, flipflop_index), (4, rle_index), (5, flipflop_index)])
def test_seg_viterbi_exact_on_dyadic(monkeypatch, B, T, nblocks, nbase, index_fn):
    """Dyadic transition weights make every max-plus sum exact, so the
    segmented Viterbi must reproduce scores, paths AND tie order
    bit-for-bit (dyadic grids produce frequent engineered ties)."""
    idx = index_fn(nbase)
    trans = _random_trans(B, T, idx.nparam, seed=T + nbase, dyadic=True)
    nb = jnp.asarray(nblocks)

    s_scan, p_scan, q_scan = _with_impl(
        monkeypatch, "scan", crf.crf_viterbi, trans, nb, nbase, idx=idx)
    s_seg, p_seg, q_seg = _with_impl(
        monkeypatch, "seg", crf.crf_viterbi, trans, nb, nbase, idx=idx)

    np.testing.assert_array_equal(np.asarray(s_seg), np.asarray(s_scan))
    for b in range(B):
        nbk = int(nblocks[b])
        np.testing.assert_array_equal(
            np.asarray(p_seg)[b, : nbk + 1], np.asarray(p_scan)[b, : nbk + 1]
        )
        np.testing.assert_array_equal(
            np.asarray(q_seg)[b, 1 : nbk + 1], np.asarray(q_scan)[b, 1 : nbk + 1]
        )


def test_seg_traceback_exact_any_backptr(monkeypatch):
    """Composition traceback is pure int gathers: exact vs sequential."""
    rng = np.random.default_rng(3)
    B, T, S = 4, 415, 8
    backptr = rng.integers(0, S, size=(B, T, S)).astype(np.int8)
    nblocks = np.array([415, 301, 128, 1], np.int32)
    # invalid steps must hold the identity map (the producers' contract)
    ident = np.arange(S, dtype=np.int8)
    for b in range(B):
        backptr[b, nblocks[b]:] = ident
    last = np.array([3, 7, 0, 5], np.int32)

    p_scan = _with_impl(monkeypatch, "scan", crf.viterbi_traceback,
                        jnp.asarray(backptr), jnp.asarray(last), jnp.asarray(nblocks))
    p_seg = _with_impl(monkeypatch, "seg", crf.viterbi_traceback,
                       jnp.asarray(backptr), jnp.asarray(last), jnp.asarray(nblocks))
    np.testing.assert_array_equal(np.asarray(p_seg), np.asarray(p_scan))
