"""The delta-int8 ("d8") upload wire format.

encode_d8 turns the i16 packed buffer into int8 deltas plus a
width-scaled capacity of (index, correction) exception pairs;
_decode_d8 on device
reconstructs the *bit-exact* int16 buffer and runs the unchanged i16
program, so d8 outputs are equal to i16 outputs by construction on any
backend.  Rows needing more than d8_exc_slots(W) exceptions make
encode_d8 return None and the batch falls back to the i16 wire.
"""

import numpy as np
import pytest

from flappie_tpu.basecall import (
    Basecaller,
    _decode_d8,
    d8_exc_slots,
    encode_d8,
)
from flappie_tpu.io.crp import read_crp
from flappie_tpu.models.params import init_synthetic
from flappie_tpu.signal.preprocess import F32, RawTable

from tests.ref_harness.parity_models import _shrink

FIXTURE = "/root/reference/src/test/raw_signal.crp"

OFFSET, RAW_UNIT = F32(16.0), F32(1373.41) / F32(8192.0)


@pytest.fixture(scope="module")
def adc():
    return read_crp(FIXTURE).reshape(-1).astype(np.int16)


@pytest.fixture(scope="module")
def cfg_params():
    cfg = _shrink("r941_native")
    return cfg, init_synthetic(cfg, seed=1234)


def _adc_read(adc, T, uuid="d8-read"):
    """An i16-capable RawTable: tiled fixture ADC + its pA signal."""
    row = np.tile(adc, int(np.ceil(T / adc.size)))[:T]
    raw = (row.astype(F32) + OFFSET) * RAW_UNIT
    return RawTable(
        uuid=uuid, n=T, start=0, end=T, raw=raw,
        adc=row.copy(), cal=(OFFSET, RAW_UNIT),
    )


def _pack(adc_rows, lengths):
    B = adc_rows.shape[0]
    scal = np.zeros((B, 4), np.float32)
    scal[:, 0] = OFFSET
    scal[:, 1] = RAW_UNIT
    scal[:, 2] = 100.0
    scal[:, 3] = 7.0
    zeros = np.zeros(B, np.int32)
    return Basecaller.pack_chunk_inputs_i16(adc_rows, lengths, zeros, zeros, scal)


def test_encode_decode_roundtrip_real_signal(adc):
    """Real fixture ADC (0.46% of deltas exceed int8): the decoded
    buffer equals the i16 buffer bit for bit."""
    import jax

    B, T = 6, 4096
    rows = np.stack([adc[i * 97 : i * 97 + T] for i in range(B)])
    lengths = np.array([T, T - 1, T // 2, 5, T, T - 300], np.int32)
    rows = rows.copy()
    for j, L in enumerate(lengths):
        rows[j, L:] = 0  # pad region, as the real pack does
    buf16 = _pack(rows, lengths)
    b8 = encode_d8(buf16)
    assert b8 is not None and b8.dtype == np.int8
    assert b8.shape == (B, T + 6 * d8_exc_slots(T) + 32)
    # the wire really is smaller; the width-scaled exception budget
    # keeps the ratio ~0.55x at any width
    assert b8.nbytes < 0.6 * buf16.nbytes
    for W in (2048, 12800, 65536):
        assert (W + 6 * d8_exc_slots(W) + 32) / (2 * (W + 16)) < 0.57
    out = np.asarray(jax.jit(_decode_d8)(b8))
    assert out.dtype == np.int16
    assert np.array_equal(out, buf16)


def test_d8_width_inversion():
    """_d8_widths uniquely inverts the wire width for every payload
    width (chunk multiples of stride, power-of-two buckets, odd
    sizes)."""
    from flappie_tpu.basecall import _d8_widths

    for W in (1, 5, 63, 64, 2048, 5120, 10000, 12800, 65536, 131072):
        exc = d8_exc_slots(W)
        assert _d8_widths(W + 6 * exc + 32) == (W, exc)
    with pytest.raises(ValueError):
        _d8_widths(12800 + 6 * d8_exc_slots(12800) + 33)


def test_encode_decode_roundtrip_fullread_width(adc):
    """The width-scaled exception budget covers full-read buckets: the
    64k tiled fixture (~290 exceptions per row, over the old fixed-256
    cap) encodes and round-trips bit-exactly."""
    import jax

    B, T = 2, 65536
    rows = np.stack([np.tile(adc, int(np.ceil(T / adc.size)))[:T]
                     for _ in range(B)])
    lengths = np.array([T, T - 123], np.int32)
    rows[1, T - 123 :] = 0
    buf16 = _pack(rows, lengths)
    b8 = encode_d8(buf16)
    assert b8 is not None
    out = np.asarray(jax.jit(_decode_d8)(b8))
    assert np.array_equal(out, buf16)


def test_encode_decode_roundtrip_hostile_values():
    """Extreme int16 jumps (still within per-row capacity) round-trip:
    corrections span most of the int16 range."""
    import jax

    rng = np.random.default_rng(3)
    B, T = 4, 4096  # capacity ceil(T/64) = 64 slots; ~40 used per row
    rows = rng.integers(-50, 50, size=(B, T)).astype(np.int16)
    for j in range(B):
        pos = rng.choice(np.arange(1, T), size=20, replace=False)
        rows[j, pos] = rng.integers(-16000, 16000, size=20).astype(np.int16)
    lengths = np.full(B, T, np.int32)
    buf16 = _pack(rows, lengths)
    b8 = encode_d8(buf16)
    assert b8 is not None
    out = np.asarray(jax.jit(_decode_d8)(b8))
    assert np.array_equal(out, buf16)


def test_encode_overflow_returns_none():
    """A row alternating +-200 needs an exception at every step --
    beyond the ceil(T/64) capacity -> fallback signal (None)."""
    T = 1024
    row = np.zeros((1, T), np.int16)
    row[0, ::2] = 200
    buf16 = _pack(row, np.array([T], np.int32))
    assert encode_d8(buf16) is None


def test_encode_correction_overflow_returns_none():
    """A -32768 -> 32767 jump needs a correction beyond int16 -> None
    (lossless or bust)."""
    row = np.array([[-32768, 32767, 0, 0]], np.int16)
    buf16 = _pack(row, np.array([4], np.int32))
    assert encode_d8(buf16) is None


@pytest.mark.parametrize("chunked", [False, True])
def test_d8_path_byte_identical(cfg_params, adc, monkeypatch, chunked):
    """Full basecall through the d8 wire == the i16 wire, byte for
    byte, on both product paths (chunked production + bucketed)."""
    cfg, params = cfg_params
    kw = {} if chunked else {"chunk": 0}
    reads = lambda: [_adc_read(adc, 30000)]

    monkeypatch.setenv("FLAPPIE_TPU_UPLOAD", "i16")
    bc = Basecaller(cfg, params=params, compute_trace=True, **kw)
    res_i16 = bc.basecall_raw_tables(reads())[0]

    monkeypatch.setenv("FLAPPIE_TPU_UPLOAD", "d8")
    bc = Basecaller(cfg, params=params, compute_trace=True, **kw)
    used = []
    for name in ("dispatch_packed_chunk_d8", "dispatch_packed_batch_d8"):
        orig = getattr(bc, name)

        def spy(buf, _orig=orig):
            used.append(1)
            return _orig(buf)

        setattr(bc, name, spy)
    res_d8 = bc.basecall_raw_tables(reads())[0]

    assert used, "d8 dispatch was not taken"
    assert res_i16 is not None and res_d8 is not None
    assert res_d8.basecall == res_i16.basecall
    assert res_d8.quality == res_i16.quality
    assert res_d8.score == res_i16.score
    assert np.array_equal(res_d8.trace, res_i16.trace)


def test_d8_grouped_program_equals_per_batch(cfg_params, adc):
    """The grouped d8 programs (lax.map over G sub-batches) return
    exactly the concatenation of per-batch outputs, chunk and bucket."""
    cfg, params = cfg_params
    caller = Basecaller(cfg, params=params, chunk=0, compute_trace=False)
    B, T, G = 4, 2048, 3
    bufs = []
    for g in range(G):
        rows = np.stack(
            [adc[(g * B + j) * 53 : (g * B + j) * 53 + T] for j in range(B)]
        )
        lengths = np.array([T, T - 50, T // 2, 300], np.int32)
        b8 = encode_d8(_pack(rows, lengths))
        assert b8 is not None
        bufs.append(b8)
    per = [np.asarray(caller.dispatch_packed_batch_d8(b)) for b in bufs]
    grp = np.asarray(
        caller.dispatch_packed_batch_d8_grouped(np.concatenate(bufs, axis=0), G)
    )
    assert np.array_equal(grp, np.concatenate(per, axis=0))


def test_d8_grouped_chunk_dispatch_taken(cfg_params, adc, monkeypatch):
    """End to end with FLAPPIE_TPU_DISPATCH_GROUP=2: the grouped d8
    chunk dispatch runs and results match ungrouped byte for byte."""
    cfg, params = cfg_params
    monkeypatch.setenv("FLAPPIE_TPU_UPLOAD", "d8")
    reads = lambda: [_adc_read(adc, 30000 + 2000 * k, uuid=f"g{k}")
                     for k in range(3)]
    mk = lambda: Basecaller(cfg, params=params, chunk=12800, overlap=1600,
                            compute_trace=False, chunk_batch=8)
    base = mk().basecall_raw_tables(reads())
    monkeypatch.setenv("FLAPPIE_TPU_DISPATCH_GROUP", "2")
    bc = mk()
    used = []
    orig = bc.dispatch_packed_chunk_d8_grouped

    def spy(buf, G, _orig=orig):
        used.append(G)
        return _orig(buf, G)

    bc.dispatch_packed_chunk_d8_grouped = spy
    grp = bc.basecall_raw_tables(reads())
    assert used, "grouped d8 dispatch was not taken"
    for a, b in zip(base, grp):
        assert b.basecall == a.basecall
        assert b.quality == a.quality
        assert b.score == a.score
