"""Property-based tests (hypothesis) for parity-critical primitives.

The golden suites pin one real signal; these sweep randomised inputs
over the invariants that byte-parity depends on: float32-exact stats,
bit-stable fixture IO, conv edge-map containment, and chunk/stitch
consistency.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from flappie_tpu.signal import preprocess as pp

f32 = np.float32

signals = st.lists(
    st.floats(-1000, 1000, allow_nan=False, width=32), min_size=5, max_size=400
).map(lambda xs: np.asarray(xs, f32))


@given(signals, st.floats(0, 1))
@settings(max_examples=200, deadline=None)
def test_quantile_matches_c_formulation(x, p):
    """quantile_f32 must equal the reference's qsort-based formulation
    (util.c:100-138): float32 index/remainder, then the interpolation
    (1-rem)*lo + rem*hi with double intermediates, stored to float32.
    The model here mirrors that formulation exactly, so equality is
    exact (a one-sided f32 lerp model differs by catastrophic
    cancellation near zero and is the wrong side)."""
    got = pp.quantile_f32(x, p)
    xs = np.sort(x.copy())
    prod = f32(p) * f32(x.size - 1)
    idx = int(prod)
    rem = np.float64(prod - f32(idx))
    if idx < x.size - 1:
        want = f32(
            (np.float64(1.0) - rem) * np.float64(xs[idx])
            + rem * np.float64(xs[idx + 1])
        )
    else:
        want = xs[idx]
    assert got == want


@given(signals)
@settings(max_examples=100, deadline=None)
def test_medmad_normalise_properties(x):
    """After med-MAD normalisation the median is ~0 and the MAD*1.4826
    is ~1 (unless the MAD is zero, where the C divides by zero too)."""
    mad = pp.mad_f32(x)
    y = x.copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        pp.medmad_normalise(y)  # zero-MAD divides, as the C does
    if mad > 1e-6:
        assert abs(pp.median_f32(y)) < 1e-3
        assert abs(pp.mad_f32(y) - 1.0) < 1e-3


@given(
    st.integers(2, 24).map(lambda w: w),
    st.integers(1, 7),
    st.integers(30, 200),
)
@settings(max_examples=150, deadline=None)
def test_conv_tapmap_covers_every_column_once(winlen, stride, n):
    """The reference conv's three BLAS regions never double-write a
    column, and every deviation from the mathematical same-conv is in
    the trailing ceil(winlen/stride)+1 columns."""
    import oracle

    ncol, contribs = oracle.conv_tapmap(n, winlen, stride)
    assert ncol == -(-n // stride)
    for c, entries in contribs.items():
        assert 0 <= c < ncol
        assert len(entries) == 1, f"col {c} written {len(entries)} times"
    nstepC = -(-winlen // stride)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 2))
    W = rng.normal(size=(winlen, 2, 3))
    b = rng.normal(size=3)
    ref = oracle.conv_same(x, W, b, stride)
    math = oracle.conv_same_math(x, W, b, stride)
    dev = np.nonzero(np.abs(ref - math).max(axis=1) > 1e-9)[0]
    if dev.size:
        assert dev.min() >= ncol - (nstepC + 1)


@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False, width=32), min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_crp_roundtrip_bitexact(vals):
    """Hex-float .crp serialisation is bit-stable for any float32."""
    import tempfile

    from flappie_tpu.io.crp import read_crp, write_crp

    arr = np.asarray(vals, f32).reshape(1, -1)
    with tempfile.NamedTemporaryFile(suffix=".crp", mode="w", delete=False) as fh:
        path = fh.name
    write_crp(path, arr)
    back = read_crp(path)
    np.testing.assert_array_equal(arr, back.reshape(arr.shape))


@given(
    st.integers(6000, 40000),
    st.integers(4000, 12000),
    st.integers(500, 2000),
)
@settings(max_examples=20, deadline=None)
def test_chunk_plan_covers_read_exactly(nsample, chunk, overlap):
    """Chunk plans tile the read: cut points are increasing, start at
    0, end at the full block count, and each chunk's kept range lies
    within the chunk."""
    from flappie_tpu.parallel.chunking import plan_chunks

    stride = 5
    plan = plan_chunks(nsample, stride, chunk, overlap)
    nblocks = -(-nsample // stride)
    cuts = list(plan.cuts)
    assert cuts[0] == 0 and cuts[-1] == nblocks
    assert all(a < b for a, b in zip(cuts, cuts[1:]))
    for i, s in enumerate(plan.starts):
        lo, hi = cuts[i], cuts[i + 1]
        first_block = s // stride
        nblk_chunk = -(-(min(s + plan.chunk, nsample) - s) // stride)
        assert first_block <= lo
        assert hi - first_block <= nblk_chunk
