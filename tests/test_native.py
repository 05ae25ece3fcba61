"""Native C++ host runtime vs the numpy reference implementation."""

import numpy as np
import pytest

from flappie_tpu import native
from flappie_tpu.io.crp import read_crp
from flappie_tpu.signal.preprocess import (
    RawTable,
    medmad_normalise,
    normalise_signal,
    trim_and_segment,
)

FIX = "/root/reference/src/test"

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def raw_pA():
    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    unit = np.float32(1373.41) / np.float32(8192.0)
    return (raw + np.float32(16.0)) * unit


def test_native_matches_numpy_bitexact(raw_pA):
    rt = RawTable("u", raw_pA.size, 0, raw_pA.size, raw_pA.copy())
    want = trim_and_segment(rt, 200, 10, 100, 0.0)
    normalise_signal(want)

    rt2 = RawTable("u", raw_pA.size, 0, raw_pA.size, raw_pA.copy())
    got = native.preprocess_batch([rt2])[0]
    assert got is not None
    assert (got.start, got.end) == (want.start, want.end)
    np.testing.assert_array_equal(got.active(), want.active())


def test_native_matches_golden(raw_pA):
    golden = read_crp(f"{FIX}/normalised_signal.crp").reshape(-1)
    rt = RawTable("u", raw_pA.size, 0, raw_pA.size, raw_pA.copy())
    got = native.preprocess_batch([rt])[0]
    assert np.max(np.abs(got.active() - golden)) <= 1e-5


def test_native_batch_with_failures(raw_pA):
    reads = [
        RawTable("a", raw_pA.size, 0, raw_pA.size, raw_pA.copy()),
        RawTable("none", 0, 0, 0, None),
        RawTable("tiny", 50, 0, 50, np.ones(50, np.float32)),
        RawTable("b", 15000, 0, 15000, raw_pA[:15000].copy()),
    ]
    out = native.preprocess_batch(reads, nthreads=4)
    assert out[0] is not None and out[3] is not None
    assert out[1] is None and out[2] is None
    assert out[0].uuid == "a" and out[3].uuid == "b"


def test_native_delta_mode(raw_pA):
    rt = RawTable("u", raw_pA.size, 0, raw_pA.size, raw_pA.copy())
    want = trim_and_segment(rt, 200, 10, 100, 0.0)
    normalise_signal(want, delta=1.5)
    rt2 = RawTable("u", raw_pA.size, 0, raw_pA.size, raw_pA.copy())
    got = native.preprocess_batch([rt2], delta=1.5)[0]
    np.testing.assert_array_equal(got.active(), want.active())


def test_preprocess_batch_does_not_mutate_inputs_and_honours_window():
    """Both paths must leave the caller's arrays untouched and process
    only the read's [start, end) window, with identical absolute
    results."""
    import flappie_tpu.native as native
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.preprocess import RawTable

    raw = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    unit = np.float32(1373.41) / np.float32(8192.0)
    pa = ((raw + np.float32(16.0)) * unit).astype(np.float32)
    # pre-windowed read: only [5000, 20000) is active
    rt = RawTable("w", pa.size, 5000, 20000, pa.copy())
    orig = pa.copy()

    results = {}
    for tag, force_numpy in (("native", False), ("numpy", True)):
        if force_numpy:
            saved = native._lib, native._tried
            native._lib, native._tried = None, True
        try:
            got = native.preprocess_batch([RawTable("w", pa.size, 5000, 20000, pa.copy())])[0]
        finally:
            if force_numpy:
                native._lib, native._tried = saved
        if tag == "native" and not native.available():
            return  # library unavailable: numpy-only environment
        results[tag] = got

    np.testing.assert_array_equal(pa, orig)  # inputs untouched
    a, b = results["native"], results["numpy"]
    assert (a.n, a.start, a.end) == (b.n, b.start, b.end)
    assert 5000 <= a.start < a.end <= 20000
    np.testing.assert_array_equal(a.active(), b.active())


def test_native_encode_d8_bit_identical_and_fallback():
    """ft_encode_d8 == the numpy reference encoder bit for bit on real
    fixture ADC at several widths (exceptions included), and both agree
    on the budget-blown -> None fallback."""
    import numpy as np

    from flappie_tpu import native
    from flappie_tpu.basecall import Basecaller, _encode_d8_np

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    from flappie_tpu.io.crp import read_crp

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    z4 = np.array([16.0, 0.17, 100.0, 7.0], np.float32)
    for W in (2048, 4096, 12800):
        B = 7
        rows = np.stack([np.tile(adc, 8)[i * 131 : i * 131 + W] for i in range(B)])
        lengths = np.array([W, W - 1, W // 2, 5, W, W - 300, 17], np.int32)
        for j, L in enumerate(lengths):
            rows[j, L:] = 0
        z = np.zeros(B, np.int32)
        buf = Basecaller.pack_chunk_inputs_i16(
            rows, lengths, z, z, np.tile(z4, (B, 1))
        )
        a = _encode_d8_np(buf)
        b = native.encode_d8(buf)
        assert a is not None and b is not None
        assert a.shape == b.shape and (a == b).all(), f"W={W}"
        hostile = rows.astype(np.int32)
        hostile[0] += np.where((np.arange(W) // 4) % 2 == 0, 200, -200)
        bufh = Basecaller.pack_chunk_inputs_i16(
            hostile.astype(np.int16), lengths, z, z, np.tile(z4, (B, 1))
        )
        assert _encode_d8_np(bufh) is None and native.encode_d8(bufh) is None
