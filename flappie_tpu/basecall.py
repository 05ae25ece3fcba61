"""End-to-end basecalling: raw reads -> BasecallResult.

The TPU-native replacement for the reference per-read driver
(calculate_post, src/flappie.c:245-316): reads are preprocessed on
host, bucketed to static shapes, and batched through one jitted device
program that runs the network forward, the CRF forward-backward (unless
viterbi-only) and the Viterbi decode with on-device traceback.  Host
code only converts paths to strings and formats output.

Decode-mode semantics (src/flappie.c:276-300):
- default (fb): Viterbi runs over the *normalised log posterior* from
  transpost_crf_flipflop, so qualities are posterior-derived;
- --viterbi: Viterbi runs over the raw transition weights;
- the trace matrix is built from exp() of whichever matrix was decoded.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import timing
from .decode.seq import path_to_basecall
from .io.fastx import BasecallResult
from .models.config import ModelConfig, get_model_config
from .models.network import transitions
from .models.params import init_synthetic, load_npz, validate
from .ops.crf import phred_from_qpath
from .signal.preprocess import RawTable, normalise_signal, trim_and_segment

F32 = np.float32

MIN_BUCKET = 2048


def bucket_length(n: int, min_bucket: int = MIN_BUCKET) -> int:
    """Pad target: next power-of-two bucket (bounds jit recompiles)."""
    b = min_bucket
    while b < n:
        b *= 2
    return b


# In-flight device batches kept queued before materialising results.
# JAX async dispatch hides device-launch latency only while the queue
# is non-empty at materialisation time; through a remote/tunneled
# device EVERY host<->device call is a blocking round trip (measured
# ~20-100 ms each through the axon tunnel), so a depth-1 queue (the
# classic materialise-one-behind) stalls every batch.  Depth ~8 plus
# one-array-in / one-array-out batches (see the packed chunk program)
# overlaps the round trips with compute; per-batch outputs are bytes,
# so the queue costs almost nothing.
PIPELINE_DEPTH = 8


def _collect_threaded() -> bool:
    """FLAPPIE_TPU_COLLECT_THREAD (default 1): resolve queued device
    outputs on ONE background collector thread instead of the caller
    thread.  The round-4 phase ledger showed collect_wait -- the
    blocking D2H materialise through the tunnel -- serialising ~2.8 s
    of every 512-read run against pack/encode/dispatch on the caller
    thread (docs/SOAK_r4.json); a single ordered collector overlaps it
    the same way FLAPPIE_TPU_UPLOAD_THREADS overlaps the H2D side.
    One thread, FIFO, so collects still land in push order and outputs
    are byte-identical.  0 restores caller-thread collection."""
    import os

    v = os.environ.get("FLAPPIE_TPU_COLLECT_THREAD")
    return v != "0" if v is not None else True


class _Pipeline:
    """Dispatch-ahead queue: push (tag, device_out) pairs, collect
    materialised (tag, numpy_outs) once the queue exceeds depth.

    Collection (the blocking device wait + D2H + host assembly) runs
    on one background collector thread by default (see
    _collect_threaded) so it overlaps the caller's pack/encode/dispatch
    of later batches; the queue depth still bounds in-flight device
    outputs by making the caller wait for the oldest collect once more
    than ``depth`` are pending.  A single FIFO thread preserves push
    order, so results are byte-identical to caller-thread collection.

    ``on_error(tag, exc)``, when given, absorbs materialise/collect
    failures so one bad batch degrades to its own reads instead of
    killing the whole run (reference NULL-propagation style,
    src/flappie_stdlib.h:37-45).  Without it, a collect failure
    re-raises on the caller thread at the next push/drain."""

    def __init__(self, collect, depth: int = PIPELINE_DEPTH, on_error=None):
        self._collect = collect
        self._depth = depth
        self._on_error = on_error
        self._q: list = []
        self._pool = None
        if _collect_threaded():
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                1, thread_name_prefix="flappie-collect"
            )

    def _run(self, tag, out) -> None:
        try:
            if hasattr(out, "result"):  # threaded-upload future
                with timing.phase("upload_wait"):
                    out = out.result()
            with timing.phase("collect_wait"):  # device wait + D2H bytes
                out = jax.tree.map(np.asarray, out)
            with timing.phase("collect_host"):  # unpack + assemble
                self._collect(tag, out)
        except Exception as exc:  # noqa: BLE001 - per-batch isolation
            if self._on_error is None:
                raise
            self._on_error(tag, exc)

    def push(self, tag, out) -> None:
        if self._pool is not None:
            self._q.append(self._pool.submit(self._run, tag, out))
            if len(self._q) > self._depth:
                with timing.phase("collect_bound_wait"):
                    self._q.pop(0).result()
            return
        self._q.append((tag, out))
        if len(self._q) > self._depth:
            self._run(*self._q.pop(0))

    def drain(self) -> None:
        if self._pool is not None:
            try:
                for fut in self._q:
                    fut.result()
            finally:
                self._q.clear()
                self._pool.shutdown(wait=True)
                self._pool = None
            return
        for tag, out in self._q:
            self._run(tag, out)
        self._q.clear()


# -- fault injection inside the batched device paths ------------------------
#
# The reference's CHAOSMONKEY makes every allocation a failure point
# (src/flappie_stdlib.h:18-35); the analogous failure points of the
# batched TPU pipeline are corrupt reads INSIDE a packed batch and
# failed dispatches.  FLAPPIE_TPU_CHAOS_DEVICE=p corrupts each
# preprocessed read with probability p (alternating NaN signal /
# zero-length); FLAPPIE_TPU_CHAOS_DISPATCH=p fails each device dispatch
# with probability p.  Both degrade to "No basecall returned" for the
# affected reads while the rest of the batch/run continues.

_chaos_counter = [0]


def _chaos_p(var: str) -> float:
    import os

    v = os.environ.get(var)
    return float(v) if v else 0.0


def _chaos_corrupt_reads(processed) -> None:
    p = _chaos_p("FLAPPIE_TPU_CHAOS_DEVICE")
    if not p:
        return
    rng = np.random.default_rng()
    for rt in processed:
        if rt is None or rng.random() >= p:
            continue
        _chaos_counter[0] += 1
        if _chaos_counter[0] % 2 == 1 and rt.end > rt.start:
            rt.raw[rt.start : rt.end] = np.nan
            rt.adc = None  # corruption must reach the device either way
        else:
            rt.end = rt.start  # zero-length active window


def _upload_mode() -> str:
    """FLAPPIE_TPU_UPLOAD: auto (the d8 wire on TPU, i16 elsewhere --
    when the reads carry ADC), f32 (always upload the host-normalised
    signal), i16 (the plain int16-ADC wire), d8 (delta-int8 wire,
    ~0.55x the i16 bytes; per-batch fallback to i16 when a row's deltas
    need more than d8_exc_slots(W) exception slots).  Outputs are identical in
    every mode (d8 reconstructs the i16 buffer bit-exactly on device,
    docs/PROBE_affine_d8_r3.json)."""
    import os

    return os.environ.get("FLAPPIE_TPU_UPLOAD", "auto")


def _prefer_d8() -> bool:
    """d8 is the default wire on TPU: through the tunnel it measured
    ~2x the grouped-i16 end-to-end rate under contention (0.56x the
    bytes, docs/PROBE_affine_d8_r3.json).  Elsewhere there is no
    transfer bottleneck to amortise and the decode prologue is pure
    extra work, so auto keeps the plain i16 wire."""
    mode = _upload_mode()
    return mode == "d8" or (
        mode == "auto" and jax.default_backend() == "tpu"
    )


def _i16_capable(rt) -> bool:
    return rt.adc is not None and rt.cal is not None and rt.norm is not None


def _dispatch_group() -> int:
    """Chunk batches shipped per device round trip.

    FLAPPIE_TPU_DISPATCH_GROUP overrides; default 4 on TPU (measured
    +24% end-to-end at CB=128 chunk batches, docs/PROBE_group_r3.json:
    the fixed per-dispatch round-trip floor is paid once per G
    batches), 1 elsewhere (no tunnel to amortise; keeps CPU CI on the
    single-batch program).  Outputs are byte-identical either way."""
    import os

    v = os.environ.get("FLAPPIE_TPU_DISPATCH_GROUP")
    if v:
        return max(1, int(v))
    return 4 if jax.default_backend() == "tpu" else 1


def _chaos_maybe_fail_dispatch() -> None:
    p = _chaos_p("FLAPPIE_TPU_CHAOS_DISPATCH")
    if p and np.random.default_rng().random() < p:
        raise RuntimeError("chaos: injected dispatch failure")


def _upload_threads() -> int:
    """FLAPPIE_TPU_UPLOAD_THREADS: run device dispatches on a
    background pool of this many threads, so the tunnel's BLOCKING
    host->device round trip (the device_put inside each dispatch,
    ~31.5 ms floor + payload at ~40-75 MB/s, docs/PROBE_dispatch_r3)
    overlaps the next batch's pack/encode instead of serialising with
    it.  Default 1 on TPU (the round-5 roofline, docs/PROFILE_r5.json,
    showed the caller thread serialising dispatch AND materialise
    round trips -- together they cost more host time per batch than
    the batch's device time; one upload thread plus the collector
    thread moves both off the critical path), 0 elsewhere (no tunnel
    to hide).  One thread preserves dispatch order; outputs are
    identical either way (ordering is preserved by the dispatch
    pipeline's queue).  Probe: tools/probe_upload_overlap.py."""
    import os

    v = os.environ.get("FLAPPIE_TPU_UPLOAD_THREADS")
    if v:
        return max(0, int(v))
    return 1 if jax.default_backend() == "tpu" else 0


def _preprocess_wave() -> int:
    """FLAPPIE_TPU_PREPROCESS_WAVE: reads per preprocessing wave.

    basecall_raw_tables preprocesses this many reads at a time on a
    background thread while the previous wave's chunks pack/dispatch,
    so host preprocessing (the largest single warm-CLI phase in
    docs/SOAK_r4.json) overlaps the device round trips instead of
    serialising ahead of the first dispatch.  0 disables (one-shot
    preprocess, the pre-round-4 behaviour); outputs are identical
    either way -- waves change only when work happens, never how
    batches are packed."""
    import os

    v = os.environ.get("FLAPPIE_TPU_PREPROCESS_WAVE")
    return max(0, int(v)) if v else 64


@partial(jax.jit, static_argnames=("nbase", "nstate", "viterbi_only", "compute_trace"))
def _device_decode(trans, nblocks, nbase: int, nstate: int, viterbi_only: bool, compute_trace: bool):
    """CRF decode of transition weights (fb posterior unless viterbi).

    Returns (score f32 [B], path int8 [B, T+1], qchar uint8 [B, T+1],
    trace uint8): everything the host needs, one byte per block, so the
    device->host transfer stays small.
    """
    from .ops.crf import crf_decode_fused

    score, path, qpath, trace = crf_decode_fused(
        trans, nblocks, nbase, viterbi_only, compute_trace
    )
    return score, path.astype(jnp.int8), phred_from_qpath(qpath), trace


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall(params, signal, lengths, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str = "auto"):
    trans, nblocks = transitions(params, cfg, signal, lengths, temperature, rnn_impl)
    score, path, qpath, trace = _device_decode(
        trans, nblocks, cfg.nbase, cfg.nstate, viterbi_only, compute_trace
    )
    return score, path, qpath, nblocks, trace


@partial(jax.jit, static_argnames=("cfg", "temperature", "rnn_impl"))
def _device_basecall_fwd(params, signal, lengths, cfg: ModelConfig, temperature: float, rnn_impl: str):
    return transitions(params, cfg, signal, lengths, temperature, rnn_impl)


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_packed(params, buf, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str = "auto"):
    """Packed-I/O bucket program (the short-read path): one
    [B, bucket+4] f32 array in (signal + float-encoded length; the
    other metadata slots are unused here), one byte matrix out in the
    same layout the chunked program uses -- every transfer through a
    tunneled device is a blocking round trip, so both paths ship one
    array each way."""
    sig = buf[:, :-4]
    lengths = buf[:, -4].astype(jnp.int32)
    score, path, qchar, nblocks, trace = _device_basecall(
        params, sig, lengths, cfg, temperature, viterbi_only, compute_trace,
        rnn_impl,
    )
    B = path.shape[0]
    parts = [path.astype(jnp.uint8), qchar]
    if compute_trace:
        parts.append(trace.reshape(B, -1))
    parts.append(jax.lax.bitcast_convert_type(score, jnp.uint8).reshape(B, 4))
    parts.append(jax.lax.bitcast_convert_type(nblocks.astype(jnp.int32), jnp.uint8).reshape(B, 4))
    return jnp.concatenate(parts, axis=1)


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_chunk(params, signal, lengths, qlo, qhi, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str = "auto"):
    """Fused forward + decode for the chunked production path.

    Identical to _device_basecall except the returned score is the
    masked sum of qpath over each chunk's OWNED local range [qlo, qhi)
    -- its contribution to the read's path score -- so chunk scores sum
    to the full-read score and nothing bigger than bytes ever leaves
    the device.
    """
    from .ops.crf import crf_decode_fused

    if viterbi_only:
        # Exact cross-chunk score: the viterbi-only score sums raw path
        # weights minus the read's logZ; per-chunk shifted qpath sums
        # drift because each chunk subtracts its OWN logZ/nblk.  Undo
        # the chunk shift over the owned range and subtract the owned
        # partition increments instead (washout-local, so they stitch
        # the full-read logZ); the alpha0 log(nstate) constant lands on
        # the first chunk (qlo == 1).
        trans, nblocks, shift, incs = transitions(
            params, cfg, signal, lengths, temperature, rnn_impl,
            return_norm=True,
        )
    else:
        trans, nblocks = transitions(
            params, cfg, signal, lengths, temperature, rnn_impl
        )
    _, path, qpath, trace = crf_decode_fused(
        trans, nblocks, cfg.nbase, viterbi_only, compute_trace
    )
    t = jnp.arange(qpath.shape[1])[None, :]
    keep = (t >= qlo[:, None]) & (t < qhi[:, None])
    score_part = jnp.sum(jnp.where(keep, qpath, 0.0), axis=1)
    if viterbi_only:
        cnt = (qhi - qlo).astype(trans.dtype)
        tr = jnp.arange(incs.shape[1])[None, :]
        keep_inc = (tr >= qlo[:, None] - 1) & (tr < qhi[:, None] - 1)
        owned_inc = jnp.sum(jnp.where(keep_inc, incs, 0.0), axis=1)
        first = (qlo == 1).astype(trans.dtype)
        score_part = (
            score_part + shift * cnt - owned_inc
            - first * jnp.log(jnp.float32(cfg.nstate))
        )
    return score_part, path.astype(jnp.int8), phred_from_qpath(qpath), nblocks, trace


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_chunk_packed(params, buf, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """Packed-I/O chunk program: ONE f32 array in, ONE uint8 array out.

    Through a tunneled device every transfer is a blocking round trip,
    so the production path ships each batch as a single [CB, chunk+4]
    array (signal + float-encoded int metadata: length, qlo, qhi, pad)
    and returns a single byte matrix per batch:

        [CB, (T+1)          path  (int8 states)
             + (T+1)        qchar (phred bytes)
             (+ (T+1)*S     trace bytes, when compute_trace)
             + 4            score_part f32, bitcast
             + 4 ]          nblocks i32, bitcast
    """
    sig = buf[:, :-4]
    meta = buf[:, -4:].astype(jnp.int32)
    score, path, qchar, nblocks, trace = _device_basecall_chunk(
        params, sig, meta[:, 0], meta[:, 1], meta[:, 2],
        cfg, temperature, viterbi_only, compute_trace, rnn_impl,
    )
    B = path.shape[0]
    parts = [path.astype(jnp.uint8), qchar]
    if compute_trace:
        parts.append(trace.reshape(B, -1))
    parts.append(jax.lax.bitcast_convert_type(score, jnp.uint8).reshape(B, 4))
    parts.append(jax.lax.bitcast_convert_type(nblocks.astype(jnp.int32), jnp.uint8).reshape(B, 4))
    return jnp.concatenate(parts, axis=1)


def _unpack_i16(buf):
    """Device prologue of the halved-bytes upload: one [B, T+16] int16
    array -> (normalised f32 signal [B, T], lengths, qlo, qhi).

    The 16 tail int16 are 8 bitcast f32: (length, qlo, qhi, offset,
    raw_unit, med, mad, unused).  The device replays the exact host
    pipeline -- pA = (adc + offset) * raw_unit (src/fast5_interface.c:
    297-303), then (pA - med) / mad (src/util.c:198-213) -- from the
    original int16 ADC counts, halving host->device bytes.  On XLA:CPU
    every op is IEEE f32, so this is bit-identical to the host
    normalisation; on TPU f32 division is 1-ulp-inexact on ~35% of
    fixture samples, which leaves sequence and quality bytes unchanged
    and trace bytes within the existing +-1 band (measured:
    tools/devnorm_parity_check.py, committed run in its docstring).
    """
    B = buf.shape[0]
    tail = jax.lax.bitcast_convert_type(
        buf[:, -16:].reshape(B, 8, 2), jnp.float32
    )  # [B, 8]
    lengths = tail[:, 0].astype(jnp.int32)
    qlo = tail[:, 1].astype(jnp.int32)
    qhi = tail[:, 2].astype(jnp.int32)
    offset, raw_unit = tail[:, 3:4], tail[:, 4:5]
    med, mad = tail[:, 5:6], tail[:, 6:7]
    x = buf[:, :-16].astype(jnp.float32)
    T = x.shape[1]
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    x = (x + offset) * raw_unit
    # The mask sits BETWEEN the pA multiply and the med subtract on
    # purpose: XLA:CPU's LLVM backend contracts multiply->subtract into
    # an FMA inside one fusion (up to ~30 ulp at cancellation points,
    # and optimization_barrier / bitcast sandwiches get simplified
    # away), while a select between them breaks the contraction pattern
    # and is needed for the zero padding anyway.  With it, this whole
    # prologue is bit-identical to the host pipeline on XLA:CPU.
    x = jnp.where(mask, x, 0.0)
    x = (x - med) / mad
    sig = jnp.where(mask, x, 0.0)
    return sig, lengths, qlo, qhi


# -- d8 upload: int8 deltas + width-scaled exception capacity ----------------
#
# The tunnel charges ~31.5 ms per dispatch plus ~70 MB/s for the payload
# (docs/PROBE_dispatch_r3.json), so upload bytes are end-to-end time.
# Real nanopore ADC steps are small (fixture: |delta| p99 = 97) but not
# bounded (0.46% exceed int8), so the wire format is: int8 deltas with
# the overflow clipped, plus per-row (index, correction) pairs that
# restore the clipped part exactly.  The device inverts this to the
# *bit-exact* int16 buffer of the i16 path and runs the identical
# program -- d8 vs i16 outputs are equal by construction, on any
# backend.  The exception capacity scales with the payload width
# (ceil(W/64) slots = 1.56% of steps, ~3.4x the fixture's rate), so
# full-read buckets encode as well as chunks; rows beyond it (or whose
# corrections exceed int16) make encode_d8 return None and the batch
# falls back to i16 -- that attempt costs one O(B*W) numpy pass, the
# price of trying on hostile signal.  Payload: W + 6*ceil(W/64) + 32
# bytes vs 2*W + 32 (~0.55x at any width).


def d8_exc_slots(W: int) -> int:
    """Exception capacity for payload width W (see module comment)."""
    return (W + 63) // 64


def _d8_widths(Wtot: int):
    """Invert Wtot = W + 6*d8_exc_slots(W) + 32 (strictly increasing in
    W, so unique where defined).  Static shapes: runs at trace time."""
    # estimate assumes slots = W/64 exactly; ceil makes the true W up
    # to ~7 smaller, so start below and walk up
    W = max(1, (Wtot - 32) * 32 // 35 - 8)
    while W + 6 * d8_exc_slots(W) + 32 < Wtot:
        W += 1
    if W + 6 * d8_exc_slots(W) + 32 != Wtot:
        raise ValueError(f"not a d8 wire width: {Wtot}")
    return W, d8_exc_slots(W)


def encode_d8(buf_i16: np.ndarray):
    """[B, W+16] int16 buffer (pack_chunk_inputs_i16 layout) -> one
    [B, W + 6*exc + 32] int8 wire buffer (exc = d8_exc_slots(W)), or
    None if any row needs more exception slots (caller falls back to
    the i16 wire).

    Runs on the native thread pool when the host library is available
    (ft_encode_d8 -- this O(B*W) pass was the top single-core host cost
    in the round-3 soak); the numpy path below is the bit-identical
    reference implementation and the fallback.
    """
    from . import native

    with timing.phase("encode_d8"):
        if native.available():
            return native.encode_d8(buf_i16)
        return _encode_d8_np(buf_i16)


def _encode_d8_np(buf_i16: np.ndarray):
    """numpy reference implementation of the d8 wire encode.

    Layout per row: W int8 clipped deltas | exc int32 LE exception
    indices | exc int16 LE corrections | the 16 tail int16 as raw bytes.
    """
    buf_i16 = np.asarray(buf_i16, np.int16)
    B, Wt = buf_i16.shape
    W = Wt - 16
    exc = d8_exc_slots(W)
    adc = buf_i16[:, :W].astype(np.int32)
    d = np.diff(adc, axis=1, prepend=0)
    stored = np.clip(d, -128, 127)
    e = d - stored
    ii, jj = np.nonzero(e)
    counts = np.bincount(ii, minlength=B)
    ecorr = e[ii, jj]
    if counts.max(initial=0) > exc or (np.abs(ecorr) > 32767).any():
        return None
    idx = np.full((B, exc), W, np.int32)  # unused slots: out of range
    corr = np.zeros((B, exc), np.int16)
    if ii.size:
        # np.nonzero is row-major, so ii is sorted; slot = rank in row
        slot = np.arange(ii.size) - np.searchsorted(ii, ii, side="left")
        idx[ii, slot] = jj
        corr[ii, slot] = ecorr
    return np.concatenate(
        [
            stored.astype(np.int8),
            idx.view(np.int8),
            corr.view(np.int8),
            buf_i16[:, W:].view(np.int8),
        ],
        axis=1,
    )


def _decode_d8(buf):
    """Device inverse of encode_d8: reconstructs the exact [B, W+16]
    int16 buffer (integer ops only -- bit-exact on every backend)."""
    B, Wtot = buf.shape
    W, exc = _d8_widths(Wtot)
    d = buf[:, :W].astype(jnp.int32)
    idx = jax.lax.bitcast_convert_type(
        buf[:, W : W + 4 * exc].reshape(B, exc, 4), jnp.int32
    )
    corr = jax.lax.bitcast_convert_type(
        buf[:, W + 4 * exc : W + 6 * exc].reshape(B, exc, 2), jnp.int16
    ).astype(jnp.int32)
    d = jax.vmap(lambda dd, ii, cc: dd.at[ii].add(cc, mode="drop"))(
        d, idx, corr
    )
    # cumsum of deltas telescopes back to the ADC value itself, which is
    # int16 by construction -- no overflow anywhere in int32.
    adc = jnp.cumsum(d, axis=1).astype(jnp.int16)
    tail = jax.lax.bitcast_convert_type(
        buf[:, W + 6 * exc :].reshape(B, 16, 2), jnp.int16
    )
    return jnp.concatenate([adc, tail], axis=1)


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_packed_d8(params, buf, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str = "auto"):
    """d8-upload variant of _device_basecall_packed_i16 (bucket path)."""
    return _device_basecall_packed_i16(
        params, _decode_d8(buf), cfg, temperature, viterbi_only,
        compute_trace, rnn_impl,
    )


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_chunk_packed_d8(params, buf, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """d8-upload variant of _device_basecall_chunk_packed_i16."""
    return _device_basecall_chunk_packed_i16(
        params, _decode_d8(buf), cfg, temperature, viterbi_only,
        compute_trace, rnn_impl,
    )


@partial(jax.jit, static_argnames=("G", "cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_chunk_packed_d8_grouped(params, buf, G: int, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """d8-upload variant of the grouped chunk dispatch."""
    rows = buf.shape[0] // G
    out = lax.map(
        lambda b: _device_basecall_chunk_packed_d8(
            params, b, cfg, temperature, viterbi_only, compute_trace, rnn_impl
        ),
        buf.reshape(G, rows, buf.shape[1]),
    )
    return out.reshape(G * rows, out.shape[-1])


@partial(jax.jit, static_argnames=("G", "cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_packed_d8_grouped(params, buf, G: int, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """d8-upload variant of the grouped full-read (bucket) dispatch."""
    rows = buf.shape[0] // G
    out = lax.map(
        lambda b: _device_basecall_packed_d8(
            params, b, cfg, temperature, viterbi_only, compute_trace, rnn_impl
        ),
        buf.reshape(G, rows, buf.shape[1]),
    )
    return out.reshape(G * rows, out.shape[-1])


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_packed_i16(params, buf, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str = "auto"):
    """int16-upload variant of _device_basecall_packed (bucket path)."""
    sig, lengths, _qlo, _qhi = _unpack_i16(buf)
    score, path, qchar, nblocks, trace = _device_basecall(
        params, sig, lengths, cfg, temperature, viterbi_only, compute_trace,
        rnn_impl,
    )
    B = path.shape[0]
    parts = [path.astype(jnp.uint8), qchar]
    if compute_trace:
        parts.append(trace.reshape(B, -1))
    parts.append(jax.lax.bitcast_convert_type(score, jnp.uint8).reshape(B, 4))
    parts.append(jax.lax.bitcast_convert_type(nblocks.astype(jnp.int32), jnp.uint8).reshape(B, 4))
    return jnp.concatenate(parts, axis=1)


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_chunk_packed_i16(params, buf, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """int16-upload variant of _device_basecall_chunk_packed."""
    sig, lengths, qlo, qhi = _unpack_i16(buf)
    score, path, qchar, nblocks, trace = _device_basecall_chunk(
        params, sig, lengths, qlo, qhi,
        cfg, temperature, viterbi_only, compute_trace, rnn_impl,
    )
    B = path.shape[0]
    parts = [path.astype(jnp.uint8), qchar]
    if compute_trace:
        parts.append(trace.reshape(B, -1))
    parts.append(jax.lax.bitcast_convert_type(score, jnp.uint8).reshape(B, 4))
    parts.append(jax.lax.bitcast_convert_type(nblocks.astype(jnp.int32), jnp.uint8).reshape(B, 4))
    return jnp.concatenate(parts, axis=1)


@partial(jax.jit, static_argnames=("G", "cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_chunk_packed_grouped(params, buf, G: int, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """Grouped dispatch: G chunk batches in ONE round trip.

    Through the tunneled device every dispatch pays a fixed ~30 ms
    round-trip floor on top of the payload transfer
    (docs/PROBE_dispatch_r3.json), so the production path can ship G
    packed batches as one [G*CB, chunk+4] array; the device runs the
    batches sequentially (lax.map keeps peak memory at one batch) and
    returns one concatenated byte matrix.  Identical math per batch --
    outputs are byte-identical to G separate dispatches.
    """
    rows = buf.shape[0] // G
    out = lax.map(
        lambda b: _device_basecall_chunk_packed(
            params, b, cfg, temperature, viterbi_only, compute_trace, rnn_impl
        ),
        buf.reshape(G, rows, buf.shape[1]),
    )
    return out.reshape(G * rows, out.shape[-1])


@partial(jax.jit, static_argnames=("G", "cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_chunk_packed_i16_grouped(params, buf, G: int, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """int16-upload variant of the grouped chunk dispatch."""
    rows = buf.shape[0] // G
    out = lax.map(
        lambda b: _device_basecall_chunk_packed_i16(
            params, b, cfg, temperature, viterbi_only, compute_trace, rnn_impl
        ),
        buf.reshape(G, rows, buf.shape[1]),
    )
    return out.reshape(G * rows, out.shape[-1])


@partial(jax.jit, static_argnames=("G", "cfg", "temperature", "viterbi_only", "compute_trace", "rnn_impl"))
def _device_basecall_packed_i16_grouped(params, buf, G: int, cfg: ModelConfig, temperature: float, viterbi_only: bool, compute_trace: bool, rnn_impl: str):
    """Grouped full-read (bucket) dispatch, int16 upload: G packed
    [B, bucket+16] batches in one round trip (see the chunked grouped
    program for rationale)."""
    rows = buf.shape[0] // G
    out = lax.map(
        lambda b: _device_basecall_packed_i16(
            params, b, cfg, temperature, viterbi_only, compute_trace, rnn_impl
        ),
        buf.reshape(G, rows, buf.shape[1]),
    )
    return out.reshape(G * rows, out.shape[-1])


def _unpack_chunk_outputs(buf: np.ndarray, T1: int, nstate: int, compute_trace: bool):
    """Inverse of the packed layout -> (score, path, qchar, nblocks, trace)."""
    path = buf[:, :T1].astype(np.int8)
    qchar = buf[:, T1 : 2 * T1]
    ofs = 2 * T1
    trace = None
    if compute_trace:
        trace = buf[:, ofs : ofs + T1 * nstate].reshape(-1, T1, nstate)
        ofs += T1 * nstate
    score = buf[:, ofs : ofs + 4].copy().view(np.float32)[:, 0]
    nblocks = buf[:, ofs + 4 : ofs + 8].copy().view(np.int32)[:, 0]
    return score, path, qchar, nblocks, trace


class Basecaller:
    """Batched basecaller for one model.

    Jit-compiles one program per (bucket length, batch size); reuse the
    instance across reads to amortise compilation.
    """

    def __init__(
        self,
        model: str = "r941_native",
        params=None,
        checkpoint: Optional[str] = None,
        temperature: float = 1.0,
        viterbi_only: bool = False,
        compute_trace: bool = True,
        seed: int = 0,
        rnn_impl: str = "auto",
        chunk: Optional[int] = None,
        overlap: int = 1600,
        chunk_batch: int = 256,
    ):
        self.cfg = get_model_config(model) if isinstance(model, str) else model
        # dispatches per compiled packed program (wire observability;
        # filled at the _dispatch_packed chokepoint)
        self.dispatch_stats: dict = {}
        # dispatches can come from the caller thread, the upload pool
        # and the CLI prewarm thread; the stats increment is a
        # read-modify-write and the dummy-pad buffers a build-once
        # cache, so both take this lock
        import threading as _threading

        self._stats_lock = _threading.Lock()
        self._dummy_cache: dict = {}
        self._upload_pool = None  # lazy (FLAPPIE_TPU_UPLOAD_THREADS)
        if params is None:
            if checkpoint is not None:
                params = load_npz(checkpoint)
            else:
                params = init_synthetic(self.cfg, seed=seed)
        validate(params, self.cfg)
        self.params = jax.tree.map(jnp.asarray, params)
        self.temperature = float(temperature)
        self.viterbi_only = bool(viterbi_only)
        self.compute_trace = bool(compute_trace)
        self.rnn_impl = rnn_impl
        # Chunked fast path (0 disables): reads longer than `chunk`
        # samples are split into overlapping chunks batched through ONE
        # fixed-shape device program and stitched at overlap midpoints
        # (parallel/chunking.py).  Serial recurrence length becomes
        # chunk/stride regardless of read length; the default scales
        # with the model stride so every model family gets the same
        # 2,560 serial blocks per chunk (12,800 samples at stride 5,
        # 5,120 at the 5mC model's stride 2).
        stride = self.cfg.total_stride
        if chunk is None:
            chunk = 2560 * stride
        self.chunk = int(chunk) - int(chunk) % stride if chunk else 0
        self.overlap = int(overlap)
        self.chunk_batch = int(chunk_batch)

    # -- device side ------------------------------------------------------

    def call_batch_device(self, signals: np.ndarray, lengths: np.ndarray):
        """Dispatch one batch; returns device arrays without blocking
        (JAX async dispatch), so callers can pipeline host work and
        device->host transfers against the next batch's compute."""
        if not isinstance(lengths, jax.Array):
            lengths = jnp.asarray(np.asarray(lengths, np.int32))
        return _device_basecall(
            self.params,
            jnp.asarray(signals),
            lengths,
            self.cfg,
            self.temperature,
            self.viterbi_only,
            self.compute_trace,
            self.rnn_impl,
        )

    def call_batch(self, signals: np.ndarray, lengths: np.ndarray):
        """signals: [B, T] float32 (zero-padded), lengths: [B].

        Returns host numpy (score, path, qpath, nblocks, trace).
        """
        out = self.call_batch_device(signals, lengths)
        return tuple(np.asarray(x) for x in out)

    # -- full pipeline ----------------------------------------------------

    def basecall_raw_tables(
        self,
        reads: Sequence[RawTable],
        trim_start: int = 200,
        trim_end: int = 10,
        varseg_chunk: int = 100,
        varseg_thresh: float = 0.0,
        delta: float = 0.0,
        reverse: bool = False,
        max_batch: int = 32,
    ) -> List[Optional[BasecallResult]]:
        """Preprocess, bucket, batch and decode a set of reads.

        Entries of ``reads`` may be RawTables or zero-arg callables
        returning a RawTable (lazy reads): callables materialise on
        the preprocessing wave's background thread, so file IO
        overlaps device dispatch.

        Returns one BasecallResult per input (None where the read failed),
        in input order.
        """
        # Host preprocessing: the native C++ thread pool when available
        # (bit-identical to the numpy path), else numpy per read.
        from . import native

        def _pre(batch):
            # lazy reads: entries may be zero-arg callables producing a
            # RawTable (e.g. a deferred fast5 read), so file IO rides
            # the same background thread as preprocessing and overlaps
            # dispatch instead of serialising ahead of it
            if any(callable(r) for r in batch):
                loaded = []
                for r in batch:
                    if callable(r):
                        with timing.phase("fast5_read"):
                            r = r()
                    loaded.append(r)
                batch = loaded
            with timing.phase("preprocess"):
                return native.preprocess_batch(
                    batch,
                    trim_start=trim_start,
                    trim_end=trim_end,
                    varseg_chunk=varseg_chunk,
                    varseg_thresh=varseg_thresh,
                    delta=delta,
                )

        results: List[Optional[BasecallResult]] = [None] * len(reads)
        chunked = self._chunked_run(results, reverse) if self.chunk else None
        prepped: list = []  # short reads -> the bucketed path below

        def _absorb(processed, base):
            # Production fast path: reads longer than one chunk go
            # through the fixed-shape chunked program (length -> batch
            # parallelism); dispatched INCREMENTALLY so later waves'
            # preprocessing overlaps earlier waves' device round trips.
            _chaos_corrupt_reads(processed)
            batch = [(base + k, rt) for k, rt in enumerate(processed)
                     if rt is not None]
            if chunked is not None:
                long_items = [(i, rt) for i, rt in batch
                              if rt.end - rt.start > self.chunk]
                batch = [(i, rt) for i, rt in batch
                         if rt.end - rt.start <= self.chunk]
                if long_items:
                    chunked.add(long_items)
            prepped.extend(batch)

        # Wave streaming (FLAPPIE_TPU_PREPROCESS_WAVE reads per wave, 0
        # disables): preprocess wave k+1 on a background thread (the
        # native batch call releases the GIL) while wave k's chunks
        # pack, encode and dispatch on this thread -- host
        # preprocessing was the single largest phase of the round-4
        # warm soak (docs/SOAK_r4.json) and it serialised ahead of the
        # first dispatch.
        wave = _preprocess_wave()
        if wave and len(reads) > wave:
            from concurrent.futures import ThreadPoolExecutor

            offsets = list(range(0, len(reads), wave))
            with ThreadPoolExecutor(
                1, thread_name_prefix="flappie-pre"
            ) as ex:
                fut = ex.submit(_pre, reads[: wave])
                for w, ofs in enumerate(offsets):
                    processed = fut.result()
                    if w + 1 < len(offsets):
                        nxt = offsets[w + 1]
                        fut = ex.submit(_pre, reads[nxt : nxt + wave])
                    _absorb(processed, ofs)
        else:
            _absorb(_pre(reads), 0)
        if chunked is not None:
            chunked.finish()

        # Group by bucket to keep shapes static; batch within bucket.
        by_bucket: dict = {}
        for i, rt in prepped:
            b = bucket_length(rt.end - rt.start)
            by_bucket.setdefault(b, []).append((i, rt))

        # Dispatch ahead: keep PIPELINE_DEPTH batches in flight before
        # materialising, so host assembly, transfers and the device
        # launch round trip all overlap compute (JAX async dispatch);
        # one packed array each way per batch.
        def _dispatch(chunk, bucket):
            B = len(chunk)
            lengths = np.zeros(B, np.int32)
            zeros = np.zeros(B, np.int32)
            if _upload_mode() != "f32" and all(_i16_capable(rt) for _, rt in chunk):
                with timing.phase("pack"):
                    adc = np.zeros((B, bucket), np.int16)
                    scal = np.zeros((B, 4), F32)
                    scal[:, 3] = 1.0  # pad rows: mad=1 -> exact zero signal
                    for j, (_, rt) in enumerate(chunk):
                        L = rt.end - rt.start
                        adc[j, :L] = rt.adc[rt.start : rt.end]
                        lengths[j] = L
                        scal[j] = (rt.cal[0], rt.cal[1], rt.norm[0], rt.norm[1])
                    buf16 = self.pack_chunk_inputs_i16(adc, lengths, zeros, zeros, scal)
                    b8 = encode_d8(buf16) if _prefer_d8() else None
                if b8 is not None:
                    return (chunk, bucket), self._submit_dispatch(
                        self.dispatch_packed_batch_d8, b8)
                return (chunk, bucket), self._submit_dispatch(
                    self.dispatch_packed_batch_i16, buf16)
            with timing.phase("pack"):
                sig = np.zeros((B, bucket), F32)
                for j, (_, rt) in enumerate(chunk):
                    seg = rt.active()
                    sig[j, : seg.size] = seg
                    lengths[j] = seg.size
                buf = self.pack_chunk_inputs(sig, lengths, zeros, zeros)
            return (chunk, bucket), self._submit_dispatch(
                self.dispatch_packed_batch, buf)

        def _collect(tag, out):
            chunk, bucket = tag
            T1 = -(-bucket // self.cfg.total_stride) + 1
            score, path, qpath, nblocks, trace = _unpack_chunk_outputs(
                out, T1, self.cfg.nstate, self.compute_trace
            )
            for j, (i, rt) in enumerate(chunk):
                results[i] = self._assemble(
                    rt, score[j], path[j], qpath[j], int(nblocks[j]),
                    None if trace is None else trace[j], reverse,
                )

        def _on_error(tag, exc):
            import sys

            chunk, _bucket = tag
            print(f"basecall batch failed ({exc}); dropping "
                  f"{len(chunk)} read(s)", file=sys.stderr)

        pipe = _Pipeline(_collect, on_error=_on_error)
        for bucket, items in sorted(by_bucket.items()):
            for ofs in range(0, len(items), max_batch):
                part = items[ofs : ofs + max_batch]
                try:
                    pipe.push(*_dispatch(part, bucket))
                except Exception as exc:  # noqa: BLE001 - batch isolation
                    _on_error((part, bucket), exc)
        pipe.drain()
        return results

    def basecall_read(self, rt: RawTable, **kw) -> Optional[BasecallResult]:
        return self.basecall_raw_tables([rt], **kw)[0]

    # -- chunked production path -------------------------------------------

    @staticmethod
    def pack_chunk_inputs(signals, lengths, qlo, qhi) -> np.ndarray:
        """One [CB, chunk+4] f32 array per batch: signal plus
        float-encoded int metadata (exact below 2^24)."""
        meta = np.stack(
            [
                np.asarray(lengths, np.int32),
                np.asarray(qlo, np.int32),
                np.asarray(qhi, np.int32),
                np.zeros(np.shape(signals)[0], np.int32),
            ],
            axis=1,
        ).astype(np.float32)
        return np.concatenate([np.asarray(signals, np.float32), meta], axis=1)

    @staticmethod
    def pack_chunk_inputs_i16(adc, lengths, qlo, qhi, scal) -> np.ndarray:
        """Halved-bytes upload: one [CB, chunk+16] int16 array per batch.

        ``adc``: [CB, chunk] int16 ADC counts; ``scal``: [CB, 4] f32
        (offset, raw_unit, med, mad) per row.  The 16 tail int16 are 8
        f32 (length, qlo, qhi, offset, raw_unit, med, mad, 0) bit-cast
        to int16 pairs (little-endian both sides); the device inverse is
        _unpack_i16."""
        B = np.shape(adc)[0]
        tail = np.zeros((B, 8), np.float32)
        tail[:, 0] = lengths
        tail[:, 1] = qlo
        tail[:, 2] = qhi
        tail[:, 3:7] = scal
        return np.concatenate(
            [np.asarray(adc, np.int16), tail.view(np.int16)], axis=1
        )

    def call_chunk_batch_device(self, signals, lengths, qlo, qhi):
        """Dispatch one [CB, chunk] chunk batch (fused forward+decode
        with per-chunk owned-range score sums); non-blocking.  Returns
        ONE packed byte matrix (see _device_basecall_chunk_packed) --
        unpack with unpack_chunk_outputs."""
        return self.dispatch_packed_chunk(
            self.pack_chunk_inputs(signals, lengths, qlo, qhi)
        )

    def _dispatch_packed(self, program, buf, G: Optional[int] = None):
        """The ONE device-dispatch chokepoint for every packed wire
        (f32/i16/d8 x bucket/chunk x single/grouped).

        Every dispatch_packed_* variant funnels through here, so a
        subclass that overrides this method (DistributedBasecaller)
        shards EVERY production wire, not just the f32 ones -- the
        round-3 `--mesh` hole was per-variant overrides missing the
        ADC-carrying paths.  ``dispatch_stats`` counts dispatches per
        compiled program so tests can assert which wire actually ran.
        """
        _chaos_maybe_fail_dispatch()
        name = getattr(program, "__name__", str(program))
        with self._stats_lock:
            self.dispatch_stats[name] = self.dispatch_stats.get(name, 0) + 1
        extra = () if G is None else (G,)
        with timing.phase("dispatch"):
            with timing.phase("dispatch_upload"):  # H2D bytes (blocking)
                dev = jnp.asarray(buf)
            with timing.phase("dispatch_launch"):  # trace-cache hit + enqueue
                return program(
                    self.params, dev, *extra, self.cfg,
                    self.temperature, self.viterbi_only, self.compute_trace,
                    self.rnn_impl,
                )

    def _submit_dispatch(self, fn, *args):
        """Run one dispatch callable, on the upload pool when
        FLAPPIE_TPU_UPLOAD_THREADS > 0 (returns a Future the dispatch
        pipeline resolves) or synchronously otherwise."""
        n = _upload_threads()
        if n <= 0:
            return fn(*args)
        if self._upload_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._upload_pool = ThreadPoolExecutor(
                n, thread_name_prefix="flappie-upload"
            )
        return self._upload_pool.submit(fn, *args)

    def dispatch_packed_batch(self, buf):
        """Packed-I/O dispatch of one legacy (bucketed) batch."""
        return self._dispatch_packed(_device_basecall_packed, buf)

    def dispatch_packed_batch_i16(self, buf):
        """int16-ADC upload variant of dispatch_packed_batch."""
        return self._dispatch_packed(_device_basecall_packed_i16, buf)

    def dispatch_packed_chunk(self, buf):
        return self._dispatch_packed(_device_basecall_chunk_packed, buf)

    def dispatch_packed_chunk_i16(self, buf):
        """int16-ADC upload variant of dispatch_packed_chunk."""
        return self._dispatch_packed(_device_basecall_chunk_packed_i16, buf)

    def dispatch_packed_batch_d8(self, buf):
        """delta-int8 upload variant of dispatch_packed_batch (see
        encode_d8)."""
        return self._dispatch_packed(_device_basecall_packed_d8, buf)

    def dispatch_packed_chunk_d8(self, buf):
        """delta-int8 upload variant of dispatch_packed_chunk."""
        return self._dispatch_packed(_device_basecall_chunk_packed_d8, buf)

    def dispatch_packed_chunk_d8_grouped(self, buf, G: int):
        """delta-int8 grouped variant of dispatch_packed_chunk_grouped."""
        return self._dispatch_packed(
            _device_basecall_chunk_packed_d8_grouped, buf, G
        )

    def dispatch_packed_batch_d8_grouped(self, buf, G: int):
        """delta-int8 grouped variant of dispatch_packed_batch_i16_grouped."""
        return self._dispatch_packed(_device_basecall_packed_d8_grouped, buf, G)

    def dispatch_packed_batch_i16_grouped(self, buf, G: int):
        """Grouped full-read i16 dispatch (G same-bucket batches)."""
        return self._dispatch_packed(
            _device_basecall_packed_i16_grouped, buf, G
        )

    def dispatch_packed_chunk_grouped(self, buf, G: int):
        """G packed chunk batches in one round trip (see
        _device_basecall_chunk_packed_grouped)."""
        return self._dispatch_packed(
            _device_basecall_chunk_packed_grouped, buf, G
        )

    def dispatch_packed_chunk_i16_grouped(self, buf, G: int):
        """int16-ADC grouped variant of dispatch_packed_chunk_grouped."""
        return self._dispatch_packed(
            _device_basecall_chunk_packed_i16_grouped, buf, G
        )

    def unpack_chunk_outputs(self, buf: np.ndarray):
        T1 = self.chunk // self.cfg.total_stride + 1
        return _unpack_chunk_outputs(buf, T1, self.cfg.nstate, self.compute_trace)

    def _dummy_chunk_buf(self, kind: str, rows: int) -> np.ndarray:
        """One chunk batch of dummy rows (a few valid samples, empty
        score range) packed on the given wire.  Used to pad partial
        dispatch groups onto the already-compiled grouped program and
        to prewarm that program; dummy rows decode to nothing and are
        never collected.  Deterministic in (kind, rows, self.chunk),
        so built once and cached (packing + d8-encoding a
        [chunk_batch, chunk] zero buffer is an O(CB*W) pass otherwise
        repaid on every tail flush)."""
        with self._stats_lock:
            cached = self._dummy_cache.get((kind, rows))
        if cached is not None:
            return cached
        stride = self.cfg.total_stride
        lengths = np.full(rows, stride, np.int32)
        z = np.zeros(rows, np.int32)
        if kind == "f32":
            buf = self.pack_chunk_inputs(
                np.zeros((rows, self.chunk), F32), lengths, z, z)
        else:
            scal = np.zeros((rows, 4), F32)
            scal[:, 3] = 1.0  # mad=1 -> exact zero signal
            buf = self.pack_chunk_inputs_i16(
                np.zeros((rows, self.chunk), np.int16), lengths, z, z, scal)
            if kind == "d8":
                buf = encode_d8(buf)
                assert buf is not None  # zero deltas never need exceptions
        with self._stats_lock:
            self._dummy_cache[(kind, rows)] = buf
        return buf

    def prewarm_chunked(self) -> None:
        """Trace + load (or compile) the chunked production program
        before real data arrives.

        A fresh process pays ~3 s of program trace + compile-cache
        executable load inside its FIRST dispatch_launch
        (docs/SOAK_r4.json); calling this on a background thread at
        CLI startup overlaps that cost with fast5 reading and
        preprocessing.  Dispatches one dummy group on the production
        wire (auto -> d8 on TPU) WITHOUT materialising the result --
        jit tracing is internally locked, so a concurrent real
        dispatch simply blocks until the shared trace is ready, never
        traces twice.  Best-effort: failures are swallowed (the real
        dispatch would surface them)."""
        try:
            if not self.chunk:
                return
            kind = ("d8" if _prefer_d8()
                    else "i16" if _upload_mode() != "f32" else "f32")
            G = _dispatch_group()
            CB = self.chunk_batch
            buf = self._dummy_chunk_buf(kind, CB)
            if G > 1:
                buf = np.concatenate([buf] * G, axis=0)
                fn = {"d8": self.dispatch_packed_chunk_d8_grouped,
                      "i16": self.dispatch_packed_chunk_i16_grouped,
                      "f32": self.dispatch_packed_chunk_grouped}[kind]
                fn(buf, G)
            else:
                fn = {"d8": self.dispatch_packed_chunk_d8,
                      "i16": self.dispatch_packed_chunk_i16,
                      "f32": self.dispatch_packed_chunk}[kind]
                fn(buf)
        except Exception:  # noqa: BLE001 - warmup is best-effort
            pass

    def _basecall_chunked(self, items, results, reverse: bool) -> None:
        """Batch overlapping chunks of long reads ACROSS reads through
        one fixed-shape program; stitch decoded paths at overlap
        midpoints (see parallel/chunking.ChunkRecord)."""
        run = self._chunked_run(results, reverse)
        run.add(items)
        run.finish()

    def _chunked_run(self, results, reverse: bool):
        """Incremental form of _basecall_chunked: returns an object
        whose ``add(items)`` registers long reads and dispatches every
        FULL chunk batch immediately, and whose ``finish()`` flushes
        the remainder and drains the dispatch pipeline.  Lets
        basecall_raw_tables stream reads in waves (preprocess of wave
        k+1 overlapping the dispatch of wave k) while packing batches
        identically to the one-shot path: full batches at
        self.chunk_batch, then one final (possibly bucketed) tail."""
        from types import SimpleNamespace

        from .parallel.chunking import chunk_records, plan_chunks

        stride = self.cfg.total_stride
        chunk_T = self.chunk
        nstate = self.cfg.nstate

        jobs = []  # (read index, ChunkRecord) not yet packed
        state: dict = {}
        i16_ok = _upload_mode() != "f32"
        dispatched = [False]  # has any full batch been packed yet?

        def _register(items):
            for i, rt in items:
                seg = rt.active()
                plan = plan_chunks(seg.size, stride, chunk_T, self.overlap)
                recs = chunk_records(plan)
                nb = plan.nblocks
                state[i] = {
                    "rt": rt,
                    "seg": seg,
                    "adc_seg": rt.adc[rt.start : rt.end]
                    if i16_ok and _i16_capable(rt) else None,
                    "scal": (rt.cal[0], rt.cal[1], rt.norm[0], rt.norm[1])
                    if i16_ok and _i16_capable(rt) else None,
                    "nb": nb,
                    "remaining": len(recs),
                    "score": 0.0,
                    "path": np.zeros(nb + 1, np.int8),
                    "qchar": np.zeros(nb + 1, np.uint8),
                    "trace": (
                        np.zeros((nb + 1, nstate), np.uint8)
                        if self.compute_trace
                        else None
                    ),
                }
                jobs.extend((i, r) for r in recs)

        def _pack(job_slice, CB):
            """One packed [CB, ...] upload buffer -> (kind, buf)."""
            # dummy rows: a few valid samples, empty score range
            lengths = np.full(CB, stride, np.int32)
            qlo = np.zeros(CB, np.int32)
            qhi = np.zeros(CB, np.int32)
            if all(state[i].get("adc_seg") is not None for i, _ in job_slice):
                adc = np.zeros((CB, chunk_T), np.int16)
                scal = np.zeros((CB, 4), F32)
                scal[:, 3] = 1.0  # dummy rows: mad=1 -> exact zero signal
                for j, (i, r) in enumerate(job_slice):
                    adc[j, : r.length] = state[i]["adc_seg"][r.start : r.start + r.length]
                    lengths[j] = r.length
                    qlo[j] = r.qlo
                    qhi[j] = r.qhi
                    scal[j] = state[i]["scal"]
                buf16 = self.pack_chunk_inputs_i16(adc, lengths, qlo, qhi, scal)
                if _prefer_d8():
                    b8 = encode_d8(buf16)
                    if b8 is not None:
                        return "d8", b8
                return "i16", buf16
            sig = np.zeros((CB, chunk_T), F32)
            for j, (i, r) in enumerate(job_slice):
                sig[j, : r.length] = state[i]["seg"][r.start : r.start + r.length]
                lengths[j] = r.length
                qlo[j] = r.qlo
                qhi[j] = r.qhi
            return "f32", self.pack_chunk_inputs(sig, lengths, qlo, qhi)

        def _dispatch_one(kind, buf):
            fn = (self.dispatch_packed_chunk_d8 if kind == "d8"
                  else self.dispatch_packed_chunk_i16 if kind == "i16"
                  else self.dispatch_packed_chunk)
            return self._submit_dispatch(fn, buf)

        def _dispatch_grouped(kind, bufs):
            buf = np.concatenate(bufs, axis=0)
            g = len(bufs)
            fn = (self.dispatch_packed_chunk_d8_grouped if kind == "d8"
                  else self.dispatch_packed_chunk_i16_grouped if kind == "i16"
                  else self.dispatch_packed_chunk_grouped)
            return self._submit_dispatch(fn, buf, g)

        def _finish(i):
            st = state[i]
            if st["remaining"] > 0:
                return
            results[i] = None if st.get("failed") else self._assemble(
                st["rt"], st["score"], st["path"], st["qchar"],
                st["nb"], st["trace"], reverse,
            )
            state[i] = {"remaining": 0}  # free the buffers

        def _collect(job_slice, out):
            score, path, qchar, _, trace = self.unpack_chunk_outputs(out)
            for j, (i, r) in enumerate(job_slice):
                st = state[i]
                if st["remaining"] <= 0:
                    continue
                end = r.keep_hi + (1 if r.last else 0)  # fencepost entry
                lo, g0 = r.keep_lo, r.g0
                st["path"][lo:end] = path[j, lo - g0 : end - g0]
                st["qchar"][lo:end] = qchar[j, lo - g0 : end - g0]
                if st["trace"] is not None:
                    st["trace"][lo:end] = trace[j, lo - g0 : end - g0]
                st["score"] += float(score[j])
                st["remaining"] -= 1
                _finish(i)

        def _on_error(job_slice, exc):
            # a failed chunk batch fails only the reads it carries
            import sys

            fails = sorted({i for i, _ in job_slice})
            print(f"chunk batch failed ({exc}); dropping read(s) "
                  f"{fails}", file=sys.stderr)
            for i, _r in job_slice:
                st = state[i]
                if st["remaining"] <= 0:
                    continue
                st["failed"] = True
                st["remaining"] -= 1
                _finish(i)

        # Dispatch grouping (FLAPPIE_TPU_DISPATCH_GROUP, default 4 on
        # TPU, 1 elsewhere -- see _dispatch_group):
        # G consecutive same-format batches ship as ONE device round
        # trip, amortising the tunnel's fixed per-dispatch floor
        # (docs/PROBE_group_r3.json).  Partial groups (the run's tail,
        # or a wire-format change mid-stream) pad with dummy batches
        # and ride the SAME grouped program: one trace + executable
        # load per process and one compile per cold cache, instead of
        # a second single-batch program whose per-process launch cost
        # dwarfs the padded rows' device time (docs/SOAK_r4.json).  A
        # failed grouped dispatch drops only its real batches.
        G = _dispatch_group()
        pipe = _Pipeline(_collect, on_error=_on_error)
        pend_kind, pend_parts, pend_bufs = None, [], []

        def _dummy_buf(rows):
            return self._dummy_chunk_buf(pend_kind, rows)

        def _flush_singles():
            if not pend_bufs:
                return
            slice_all = [j for p in pend_parts for j in p]
            try:
                bufs = list(pend_bufs)
                while len(bufs) < G:
                    bufs.append(_dummy_buf(bufs[0].shape[0]))
                pipe.push(slice_all, _dispatch_grouped(pend_kind, bufs))
            except Exception as exc:  # noqa: BLE001 - batch isolation
                _on_error(slice_all, exc)
            pend_parts.clear()
            pend_bufs.clear()

        def _flush_group():
            slice_all = [j for p in pend_parts for j in p]
            try:
                pipe.push(slice_all, _dispatch_grouped(pend_kind, pend_bufs))
            except Exception as exc:  # noqa: BLE001 - batch isolation
                _on_error(slice_all, exc)
            pend_parts.clear()
            pend_bufs.clear()

        def _route(part, CB):
            nonlocal pend_kind
            try:
                with timing.phase("pack"):
                    kind, buf = _pack(part, CB)
            except Exception as exc:  # noqa: BLE001 - batch isolation
                _on_error(part, exc)
                return
            if G <= 1:
                try:
                    pipe.push(part, _dispatch_one(kind, buf))
                except Exception as exc:  # noqa: BLE001
                    _on_error(part, exc)
                return
            if pend_bufs and kind != pend_kind:
                _flush_singles()
            pend_kind = kind
            pend_parts.append(part)
            pend_bufs.append(buf)
            if len(pend_bufs) == G:
                _flush_group()

        def add(items):
            _register(items)
            while len(jobs) >= self.chunk_batch:
                part = jobs[: self.chunk_batch]
                del jobs[: self.chunk_batch]
                dispatched[0] = True
                _route(part, self.chunk_batch)

        def finish():
            # Tail batch size: when NO full batch was ever reached, a
            # handful of chunks should not pay a full batch of padding
            # (bucketed -- the same choice as the old one-shot path);
            # after any full batch, keep the production size so the
            # tail reuses the already-compiled program shape.
            if jobs:
                CB = (self.chunk_batch if dispatched[0]
                      else min(self.chunk_batch, bucket_length(len(jobs), 8)))
                while jobs:
                    part = jobs[:CB]
                    del jobs[:CB]
                    _route(part, CB)
            _flush_singles()
            pipe.drain()

        return SimpleNamespace(add=add, finish=finish)

    # -- chunked long-read path --------------------------------------------

    def basecall_read_chunked(
        self,
        rt: RawTable,
        chunk: int = 16000,
        overlap: int = 2000,
        delta: float = 0.0,
        reverse: bool = False,
        **trim_kw,
    ) -> Optional[BasecallResult]:
        """Chunk + overlap-stitch decoding for long reads.

        The read's signal is split into overlapping chunks batched
        through the network (read length -> batch parallelism); per-
        chunk transition weights are stitched at overlap midpoints and
        decoded globally (see parallel/chunking.py).
        """
        from .parallel.chunking import extract_chunks, plan_chunks, stitch_trans
        from .models.network import transitions as _transitions

        if rt.raw is None:
            return None
        from dataclasses import replace as _replace

        rt = _replace(rt, raw=rt.raw.copy())  # never mutate caller data
        rt = trim_and_segment(rt, **trim_kw) if trim_kw else trim_and_segment(rt)
        if not rt.valid:
            return None
        normalise_signal(rt, delta)
        seg = rt.active()

        plan = plan_chunks(seg.size, self.cfg.total_stride, chunk, overlap)
        chunks, lengths = extract_chunks(seg, plan)
        trans, nblocks = _device_basecall_fwd(
            self.params,
            jnp.asarray(chunks),
            jnp.asarray(lengths),
            self.cfg,
            self.temperature,
            self.rnn_impl,
        )
        stitched = stitch_trans(np.asarray(trans), plan)
        T = stitched.shape[0]
        Tpad = -(-T // 256) * 256
        buf = np.zeros((1, Tpad, stitched.shape[1]), F32)
        buf[0, :T] = stitched
        score, path, qpath, trace = _device_decode(
            jnp.asarray(buf),
            jnp.asarray([T], dtype=jnp.int32),
            self.cfg.nbase,
            self.cfg.nstate,
            self.viterbi_only,
            self.compute_trace,
        )
        return self._assemble(
            rt,
            float(np.asarray(score)[0]),
            np.asarray(path)[0],
            np.asarray(qpath)[0],
            T,
            np.asarray(trace)[0],
            reverse,
        )

    def _assemble(self, rt, score, path, qpath, nblock, trace, reverse) -> Optional[BasecallResult]:
        # Per-read validity net: a poisoned read inside a batch (NaN
        # signal, zero-length row) surfaces as a non-finite score or an
        # empty block range; degrade to None ("No basecall returned")
        # without touching its batchmates.
        score = float(score)
        if not np.isfinite(score) or nblock < 1:
            return None
        basecall, quality = path_to_basecall(path, qpath, nblock, self.cfg.nbase)
        if reverse:
            basecall = basecall[::-1]
            quality = quality[::-1]
        return BasecallResult(
            uuid=rt.uuid,
            score=float(score),
            basecall=basecall,
            quality=quality,
            nblock=nblock,
            nsample=rt.n,
            trim_start=rt.start,
            trim_end=rt.end,
            trace=trace[: nblock + 1] if self.compute_trace else None,
            signal=rt.active().copy(),
        )
