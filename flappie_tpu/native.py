"""ctypes bindings for the native host runtime (native/libflappie_host.so).

The C++ library implements the hot host-side path - per-read trimming
and normalisation on a thread pool - with bit-identical float semantics
to flappie_tpu.signal.preprocess (both match the reference C).  If the
shared library is missing it is built on demand with make; failing
that, callers fall back to the numpy implementation transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from .signal.preprocess import RawTable

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libflappie_host.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        _build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not hasattr(lib, "ft_encode_d8"):
        # stale pre-v3 build on disk: rebuild and reload once
        del lib
        if not (_build() and os.path.exists(_LIB_PATH)):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not hasattr(lib, "ft_encode_d8"):
            return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ft_medmad_normalise.argtypes = [f32p, ctypes.c_int64]
    lib.ft_difference_scale.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float]
    lib.ft_trim_and_segment.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, i64p, i64p,
    ]
    lib.ft_preprocess_batch.argtypes = [
        f32p, i64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, i64p, i64p, ctypes.c_int32,
    ]
    lib.ft_preprocess_batch2.argtypes = [
        f32p, i64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, i64p, i64p, f32p, f32p, ctypes.c_int32,
    ]
    lib.ft_scale_to_pA.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.ft_encode_d8.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int32,
    ]
    lib.ft_encode_d8.restype = ctypes.c_int32
    lib.ft_version.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def preprocess_batch(
    reads: Sequence[RawTable],
    trim_start: int = 200,
    trim_end: int = 10,
    varseg_chunk: int = 100,
    varseg_thresh: float = 0.0,
    delta: float = 0.0,
    nthreads: int = 0,
) -> List[Optional[RawTable]]:
    """Trim + normalise a batch of reads on the native thread pool.

    The input RawTables are never mutated: each read's [start, end)
    window is copied, trimmed and normalised, and a fresh RawTable is
    returned with the same ``n`` and absolute start/end indices (both
    paths agree exactly; the numpy fallback is the bit-identical
    reference implementation).  None per read where trimming consumed
    the read.
    """
    from dataclasses import replace

    from .signal.preprocess import normalise_signal, trim_and_segment

    lib = load()
    if lib is None:
        out: List[Optional[RawTable]] = []
        for rt in reads:
            if rt.raw is None:
                out.append(None)
                continue
            rt = replace(rt, raw=rt.raw.copy())  # callers keep their data
            rt = trim_and_segment(rt, trim_start, trim_end, varseg_chunk, varseg_thresh)
            out.append(normalise_signal(rt, delta) if rt.valid else None)
        return out

    valid_idx = [i for i, rt in enumerate(reads) if rt.raw is not None]
    offsets = np.zeros(len(valid_idx) + 1, dtype=np.int64)
    bufs = []
    for j, i in enumerate(valid_idx):
        # the native path processes each read's active window, like the
        # numpy path's window-aware trim
        win = np.ascontiguousarray(reads[i].active(), dtype=np.float32)
        bufs.append(win)
        offsets[j + 1] = offsets[j] + win.size
    signals = np.concatenate(bufs) if bufs else np.zeros(0, np.float32)
    starts = np.zeros(len(valid_idx), dtype=np.int64)
    ends = np.zeros(len(valid_idx), dtype=np.int64)
    meds = np.zeros(len(valid_idx), dtype=np.float32)
    mads = np.zeros(len(valid_idx), dtype=np.float32)

    lib.ft_preprocess_batch2(
        _f32p(signals), _i64p(offsets), len(valid_idx),
        trim_start, trim_end, varseg_chunk, ctypes.c_float(varseg_thresh),
        ctypes.c_float(delta), _i64p(starts), _i64p(ends),
        _f32p(meds), _f32p(mads), nthreads,
    )

    out: List[Optional[RawTable]] = [None] * len(reads)
    for j, i in enumerate(valid_idx):
        if starts[j] >= ends[j]:
            continue
        rt = reads[i]
        # rebuild a full-length buffer with the processed window, so
        # start/end stay absolute indices like the numpy path's
        full = np.asarray(rt.raw, dtype=np.float32).copy()
        full[rt.start : rt.end] = signals[offsets[j] : offsets[j + 1]]
        out[i] = RawTable(
            uuid=rt.uuid,
            n=rt.n,
            start=rt.start + int(starts[j]),
            end=rt.start + int(ends[j]),
            raw=full,
            adc=rt.adc,
            cal=rt.cal,
            norm=(meds[j], mads[j]) if delta == 0.0 and mads[j] != 0.0 else None,
        )
    return out


def encode_d8(buf_i16: np.ndarray, nthreads: int = 0):
    """Native d8 wire encode (ft_encode_d8): bit-identical to
    basecall._encode_d8_np, rows in parallel on the thread pool.

    Returns the [B, W + 6*exc + 32] int8 wire buffer, or None when any
    row blows the exception budget (caller falls back to the i16 wire).
    Raises RuntimeError if the native library is unavailable -- callers
    gate on available() or use basecall.encode_d8 (which falls back to
    the numpy encoder transparently).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.ascontiguousarray(buf_i16, np.int16)
    B, Wt = buf.shape
    W = Wt - 16
    exc = (W + 63) // 64
    out = np.empty((B, W + 6 * exc + 32), np.int8)
    rc = lib.ft_encode_d8(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(B), ctypes.c_int64(Wt),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_int32(nthreads),
    )
    return None if rc else out
