"""The halved-bytes int16-ADC upload path.

Reads from fast5 carry their original int16 ADC counts plus the
(offset, raw_unit) calibration and (med, mad) normalisation scalars;
the device rebuilds the normalised f32 signal on chip
(basecall._unpack_i16), halving host->device upload bytes.  On XLA:CPU
the rebuild is bit-identical to the host pipeline, so every output of
the i16 path must equal the f32 path byte for byte.  (On TPU, f32
division is 1-ulp-inexact; the measured effect on outputs -- sequence
and quality bytes unchanged, trace within the existing +-1 band -- is
recorded by tools/devnorm_parity_check.py.)
"""

import os

import numpy as np
import pytest

from flappie_tpu.basecall import Basecaller, _i16_capable, _unpack_i16
from flappie_tpu.io.crp import read_crp
from flappie_tpu.signal.fast5 import write_single_read_fast5, read_raw
from flappie_tpu.signal.preprocess import F32

FIXTURE = "/root/reference/src/test/raw_signal.crp"


@pytest.fixture(scope="module")
def adc():
    return read_crp(FIXTURE).reshape(-1).astype(np.int16)


@pytest.fixture(scope="module")
def fast5_read(tmp_path_factory, adc):
    path = tmp_path_factory.mktemp("i16") / "read.fast5"
    write_single_read_fast5(str(path), adc, "0f776a08-0000-4000-8000-0000000000aa")
    return read_raw(str(path))


def test_fast5_reader_carries_adc_and_cal(fast5_read, adc):
    rt = fast5_read
    assert rt.adc is not None and rt.adc.dtype == np.int16
    assert np.array_equal(rt.adc, adc)
    offset, raw_unit = rt.cal
    assert offset == F32(16.0)
    assert raw_unit == F32(1373.41) / F32(8192.0)
    # pA signal is (adc + offset) * raw_unit, f32-exact
    assert np.array_equal(rt.raw, (adc.astype(F32) + offset) * raw_unit)


def test_preprocess_records_norm_scalars(fast5_read):
    from flappie_tpu import native
    from flappie_tpu.signal.preprocess import (
        mad_f32,
        median_f32,
        trim_and_segment,
    )
    from dataclasses import replace

    rt0 = trim_and_segment(replace(fast5_read, raw=fast5_read.raw.copy()))
    seg = rt0.active().copy()
    med, mad = median_f32(seg), mad_f32(seg)

    out = native.preprocess_batch([fast5_read])[0]
    assert out is not None and _i16_capable(out)
    assert out.norm == (med, mad)
    assert out.adc is fast5_read.adc and out.cal == fast5_read.cal

    # the numpy fallback path records the same scalars
    import flappie_tpu.native as nat

    lib, tried = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        out_np = nat.preprocess_batch([fast5_read])[0]
    finally:
        nat._lib, nat._tried = lib, tried
    assert out_np.norm == (med, mad)
    assert np.array_equal(out_np.raw, out.raw)


def test_unpack_i16_bit_exact_vs_host():
    """Device prologue == host pipeline, bit for bit, on XLA:CPU
    (including the FMA-contraction guard: the mask select sits between
    the pA multiply and the med subtract)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    B, T = 8, 512
    adc = rng.integers(-3000, 3000, size=(B, T)).astype(np.int16)
    lengths = rng.integers(1, T + 1, size=B).astype(np.int32)
    qlo = rng.integers(0, 5, size=B).astype(np.int32)
    qhi = rng.integers(5, 99, size=B).astype(np.int32)
    offset, ru = F32(16.0), F32(1373.41) / F32(8192.0)
    scal = np.zeros((B, 4), np.float32)
    scal[:, 0] = offset
    scal[:, 1] = ru
    scal[:, 2] = rng.normal(100, 5, B).astype(np.float32)
    scal[:, 3] = rng.uniform(5, 20, B).astype(np.float32)

    buf = Basecaller.pack_chunk_inputs_i16(adc, lengths, qlo, qhi, scal)
    assert buf.dtype == np.int16 and buf.shape == (B, T + 16)
    sig, L, lo, hi = jax.jit(_unpack_i16)(jnp.asarray(buf))
    assert np.array_equal(np.asarray(L), lengths)
    assert np.array_equal(np.asarray(lo), qlo)
    assert np.array_equal(np.asarray(hi), qhi)

    ref = np.zeros((B, T), np.float32)
    for j in range(B):
        x = adc[j].astype(F32)
        x = (x + offset) * ru
        x = x - scal[j, 2]
        x = x / scal[j, 3]
        ref[j, : lengths[j]] = x[: lengths[j]]
    assert np.array_equal(np.asarray(sig).view(np.int32), ref.view(np.int32))


def _strip_adc(rt):
    from dataclasses import replace

    return replace(rt, raw=rt.raw.copy(), adc=None, cal=None)


@pytest.mark.parametrize("chunked", [False, True])
def test_i16_path_byte_identical_to_f32(fast5_read, chunked):
    """Full basecall through the i16 upload == f32 upload, byte for
    byte, on both product paths (chunked production path and the
    bucketed short-read path)."""
    kw = {} if chunked else {"chunk": 0}
    bc = Basecaller("r941_native", seed=0, **kw)
    if chunked:
        assert (fast5_read.end - fast5_read.start) > bc.chunk

    res_i16 = bc.basecall_raw_tables([fast5_read])[0]
    res_f32 = bc.basecall_raw_tables([_strip_adc(fast5_read)])[0]
    assert res_i16 is not None and res_f32 is not None
    assert res_i16.basecall == res_f32.basecall
    assert res_i16.quality == res_f32.quality
    assert res_i16.score == res_f32.score
    assert np.array_equal(res_i16.trace, res_f32.trace)


def test_upload_mode_f32_forces_fallback(fast5_read, monkeypatch):
    monkeypatch.setenv("FLAPPIE_TPU_UPLOAD", "f32")
    bc = Basecaller("r941_native", seed=0)
    called = []
    orig = bc.dispatch_packed_chunk_i16

    def spy(buf):
        called.append(1)
        return orig(buf)

    bc.dispatch_packed_chunk_i16 = spy
    res = bc.basecall_raw_tables([fast5_read])[0]
    assert res is not None and not called


def test_chaos_nan_corruption_reaches_device_via_i16(fast5_read, monkeypatch):
    """The NaN chaos corruption invalidates the ADC sidecar so the
    corrupt signal (not the pristine ADC) is what the device sees."""
    monkeypatch.setenv("FLAPPIE_TPU_CHAOS_DEVICE", "1.0")
    from flappie_tpu import basecall as bcmod

    monkeypatch.setattr(bcmod, "_chaos_counter", [0])
    bc = Basecaller("r941_native", seed=0)
    res = bc.basecall_raw_tables([fast5_read])[0]
    # NaN signal must not produce a confident basecall; the read is
    # dropped or decodes to garbage-free empty output
    assert res is None or not np.isfinite(res.score)
