"""Fused Pallas recurrent kernels (TPU).

The recurrent loop is the hot path of every model (5 sequential layers;
the reference spends its life in lstm_step sgemv, src/layers.c:979-1026).
The lax.scan baseline in rnn.py round-trips the carried state through
XLA's loop machinery each step; these kernels instead keep

- the recurrent weights sW [H, GH] resident in VMEM for the whole
  sequence (constant BlockSpec index_map -> fetched once),
- the carried state h (and c) in VMEM scratch across grid steps,

and stream x-affine blocks [B, GH] through the automatic Pallas
pipeline (grid over time, double-buffered HBM->VMEM DMA), so each step
is one MXU matmul [B,H]x[H,GH] plus VPU gate math, with no HBM traffic
for state or weights.

Semantics are bit-compatible with rnn.lstm_seq / rnn.grumod_seq (same
gate order and formulas); tests assert equivalence.  Grid iteration on
TPU is sequential, which is what carries the state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lstm_kernel(x_ref, sw_ref, out_ref, h_ref, c_ref):
    """K time steps per grid step; state carried in VMEM scratch."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]
    K = x_ref.shape[0]
    sw = sw_ref[:]

    def step(k, carry):
        h, c = carry
        xF = x_ref[k] + jnp.dot(
            h, sw, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        )
        u = jax.nn.sigmoid(xF[:, :H])
        f = jax.nn.sigmoid(xF[:, H : 2 * H])
        g = jnp.tanh(xF[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(xF[:, 3 * H :])
        c = f * c + u * g
        h = o * jnp.tanh(c)
        out_ref[k] = h
        return h, c

    h, c = lax.fori_loop(0, K, step, (h_ref[:], c_ref[:]), unroll=True)
    h_ref[:] = h
    c_ref[:] = c


def _grumod_kernel(x_ref, sw_ref, out_ref, h_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]
    K = x_ref.shape[0]
    sw = sw_ref[:]

    def step(k, h):
        x = x_ref[k]
        v = jnp.dot(
            h, sw, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        )
        z = jax.nn.sigmoid(x[:, :H] + v[:, :H])
        r = jax.nn.sigmoid(x[:, H : 2 * H] + v[:, H : 2 * H])
        hbar = jnp.tanh(r * v[:, 2 * H :] + x[:, 2 * H :])
        h = z * h + (1 - z) * hbar
        out_ref[k] = h
        return h

    h_ref[:] = lax.fori_loop(0, K, step, h_ref[:], unroll=True)


VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16M scoped limit


def _time_block(B: int, GH: int, H: int) -> int:
    """Largest power-of-two K whose double-buffered x/out blocks fit.

    Per grid step the pipeline holds 2 x-blocks [K, B, GH] and 2
    out-blocks [K, B, H] in VMEM (plus sW and the state scratch).
    K=16 measured ~10x faster than K=1 at B=64/H=256; beyond that the
    blocks no longer fit.
    """
    per_k = 4 * B * (GH + H) * 2  # bytes per unit K, double-buffered
    K = 16
    while K > 1 and K * per_k > VMEM_BUDGET:
        K //= 2
    return K


def _run_recurrent(kernel, xaffine, sW, gates: int, carries: int, interpret):
    """xaffine: [B, T, G*H] -> [B, T, H] via a time-grid Pallas call."""
    B, T, GH = xaffine.shape
    H = GH // gates
    if interpret is None:
        interpret = _use_interpret()
    K = _time_block(B, GH, H)
    Tpad = -(-T // K) * K
    x_tm = jnp.swapaxes(xaffine, 0, 1)  # [T, B, GH]
    if Tpad != T:
        # zero-pad the time tail: the padded steps only extend the
        # recurrence past the valid region and their outputs are
        # discarded below (callers mask by per-read lengths anyway).
        x_tm = jnp.pad(x_tm, ((0, Tpad - T), (0, 0), (0, 0)))

    scratch = [pltpu.VMEM((B, H), jnp.float32) for _ in range(carries)]
    out = pl.pallas_call(
        kernel,
        grid=(Tpad // K,),
        in_specs=[
            pl.BlockSpec((K, B, GH), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, GH), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tpad, B, H), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_tm, sW)
    return jnp.swapaxes(out[:T], 0, 1)


def lstm_seq_pallas(xaffine, sW, interpret=None):
    """Drop-in replacement for rnn.lstm_seq."""
    return _run_recurrent(_lstm_kernel, xaffine, sW, gates=4, carries=2, interpret=interpret)


def grumod_seq_pallas(xaffine, sW, interpret=None):
    """Drop-in replacement for rnn.grumod_seq."""
    return _run_recurrent(_grumod_kernel, xaffine, sW, gates=3, carries=1, interpret=interpret)


def _split_bf16(a):
    """a (f32) -> (hi, lo) bf16 with hi + lo ~= a (error ~2^-16 rel)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16x3(h, sw_hi, sw_lo):
    """3-pass bf16 emulation of a float32 matmul (~2^-21 mantissa,
    the HIGH tier Mosaic doesn't lower natively): h*sw = hi*hi + hi*lo
    + lo*hi, each a single-pass bf16 MXU matmul with f32 accumulation."""
    h_hi, h_lo = _split_bf16(h)
    d = lambda a, b: jnp.dot(
        a, b, precision=lax.Precision.DEFAULT, preferred_element_type=jnp.float32
    )
    return d(h_hi, sw_hi) + d(h_hi, sw_lo) + d(h_lo, sw_hi)


def _make_rdot(rnnprec, sw):
    """Per-step recurrent matmul at the requested precision tier;
    'high3' hoists the bf16 weight split out of the step loop."""
    if rnnprec == "high3":
        sw_hi, sw_lo = _split_bf16(sw)
        return lambda h: _dot_bf16x3(h, sw_hi, sw_lo)
    return lambda h: jnp.dot(
        h, sw, precision=rnnprec, preferred_element_type=jnp.float32
    )


def _ff_dot(x, w, ffprec):
    """Block input affine at the feed-forward precision tier.  'high3'
    is the manual 3-pass bf16 emulation of Precision.HIGH (which Mosaic
    does not lower natively) -- same algorithm XLA uses for HIGH
    outside kernels, so the in-kernel affine matches the out-of-kernel
    FF policy instead of over-spending 6 HIGHEST passes."""
    if ffprec == "high3":
        return _dot_bf16x3(x, *_split_bf16(w))
    return jnp.dot(x, w, precision=ffprec, preferred_element_type=jnp.float32)


def _resolve_ffprec(ffprec, backend: str):
    """Mosaic rejects Precision.HIGH inside kernels.  On TPU lower it
    as the manual 3-pass bf16 emulation (same algorithm XLA's HIGH uses
    outside kernels); elsewhere clamp to HIGHEST so the CPU parity
    suite keeps true-f32 affines (the manual split would execute for
    real there)."""
    if ffprec == lax.Precision.HIGH:
        return "high3" if backend == "tpu" else lax.Precision.HIGHEST
    return ffprec


# ---------------------------------------------------------------------------
# Fused layer kernels: input affine computed inside the kernel
# ---------------------------------------------------------------------------
#
# The unfused path materialises the whole [B, T, G*H] input affine in
# HBM and streams it back in (the dominant DMA and, at large B, an
# HBM-capacity blocker).  The fused kernels stream the raw layer input
# [K, B, IN] instead (G*x smaller), compute the block's input affine as
# one efficient [K*B, IN] x [IN, G*H] MXU matmul on arrival, and keep
# the per-step state logic identical.  The affine runs at the
# feed-forward precision policy; the recurrent step matmul stays
# HIGHEST (see ops.precision).


def _lstm_fused_body(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref, sw_ref, len_ref, out_ref, h_ref, c_ref, xa_ref, cout_ref=None):
    """Shared step body of the fused LSTM kernels.  ``cout_ref`` is a
    static (trace-time) option: None for inference, a [K, B, H] ref for
    the train variant -- ONE definition keeps the inference and train
    forward passes bit-compatible, which the custom VJP relies on."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]
    K, B, IN = x_ref.shape
    # global block index: backward layers walk the grid (and the steps
    # inside each block) in reverse, carrying state from the sequence
    # end -- the directional recurrence without any reversal gathers
    g = (pl.num_programs(0) - 1 - t) if backward else t
    lens = len_ref[:]  # [B, 1] int32 valid steps per read
    sw = sw_ref[:]
    rdot = _make_rdot(rnnprec, sw)
    # block input affine into VMEM scratch (refs support dynamic step
    # indexing inside the loop; values would need dynamic_slice, which
    # Mosaic does not lower)
    xa_ref[:] = (
        _ff_dot(x_ref[:].reshape(K * B, IN), iw_ref[:], ffprec) + b_ref[:]
    ).reshape(K, B, 4 * H).astype(xa_ref.dtype)

    def step(k, carry):
        h, c = carry
        kk = (K - 1 - k) if backward else k
        # valid = this step is inside the read.  Invalid steps freeze
        # the carry: a backward layer therefore still has the zero
        # initial state when it reaches each read's own last block, and
        # a forward layer stops at the read end -- identical math to
        # scanning only the valid region (reference layers.c:877-976).
        valid = (g * K + kk) < lens
        xF = xa_ref[kk].astype(jnp.float32) + rdot(h)
        u = jax.nn.sigmoid(xF[:, :H])
        f = jax.nn.sigmoid(xF[:, H : 2 * H])
        gg = jnp.tanh(xF[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(xF[:, 3 * H :])
        c2 = f * c + u * gg
        h2 = o * jnp.tanh(c2)
        out_ref[kk] = jnp.where(valid, h2, 0.0).astype(out_ref.dtype)
        if cout_ref is not None:
            cout_ref[kk] = jnp.where(valid, c2, 0.0).astype(cout_ref.dtype)
        return jnp.where(valid, h2, h), jnp.where(valid, c2, c)

    h, c = lax.fori_loop(0, K, step, (h_ref[:], c_ref[:]), unroll=True)
    h_ref[:] = h
    c_ref[:] = c


def _lstm_fused_kernel(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref, sw_ref, len_ref, out_ref, h_ref, c_ref, xa_ref):
    _lstm_fused_body(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref,
                     sw_ref, len_ref, out_ref, h_ref, c_ref, xa_ref)


def _lstm_fused_train_kernel(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref, sw_ref, len_ref, out_ref, cout_ref, h_ref, c_ref, xa_ref):
    """_lstm_fused_kernel plus a second output: the carried cell state
    (zeroed at invalid steps, like h).  The custom-VJP backward
    (ops/rnn_vjp.py) needs c_{t-1} per step to recompute the gates; it
    is the one sequence the adjoint cannot rebuild without re-running
    the recurrence.  Training-path only -- inference never pays the
    extra [T, B, H] HBM write."""
    _lstm_fused_body(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref,
                     sw_ref, len_ref, out_ref, h_ref, c_ref, xa_ref,
                     cout_ref=cout_ref)


def _grumod_fused_kernel(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref, sw_ref, len_ref, out_ref, h_ref, xa_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]
    K, B, IN = x_ref.shape
    g = (pl.num_programs(0) - 1 - t) if backward else t
    lens = len_ref[:]
    sw = sw_ref[:]
    rdot = _make_rdot(rnnprec, sw)
    xa_ref[:] = (
        _ff_dot(x_ref[:].reshape(K * B, IN), iw_ref[:], ffprec) + b_ref[:]
    ).reshape(K, B, 3 * H).astype(xa_ref.dtype)

    def step(k, h):
        kk = (K - 1 - k) if backward else k
        valid = (g * K + kk) < lens
        x = xa_ref[kk].astype(jnp.float32)
        v = rdot(h)
        z = jax.nn.sigmoid(x[:, :H] + v[:, :H])
        r = jax.nn.sigmoid(x[:, H : 2 * H] + v[:, H : 2 * H])
        hbar = jnp.tanh(r * v[:, 2 * H :] + x[:, 2 * H :])
        h2 = z * h + (1 - z) * hbar
        out_ref[kk] = jnp.where(valid, h2, 0.0).astype(out_ref.dtype)
        return jnp.where(valid, h2, h)

    h_ref[:] = lax.fori_loop(0, K, step, h_ref[:], unroll=True)


def _lstm_fused_dual_kernel(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref,
                            sw_ref, len_ref, out_ref, h_ref, c_ref, xa_ref):
    """Two interleaved half-batch LSTM chains per step.

    The single-chain step strictly alternates MXU (step matmul) and VPU
    (gate transcendentals) on one dependence chain; splitting the batch
    into two independent 64-row chains and issuing both step matmuls
    before either chain's gates gives the Mosaic scheduler cross-chain
    slack.  Measured +9% row-throughput over the single chain at
    B=128/H=256 on a contended chip (docs/PROBE_dual_r3.json), bit-exact
    by construction (identical per-row math, same op order per chain).
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]
    B2 = h_ref.shape[1]
    K, B, IN = x_ref.shape
    g = (pl.num_programs(0) - 1 - t) if backward else t
    lens = len_ref[:]  # [B, 1]
    sw = sw_ref[:]
    rdot = _make_rdot(rnnprec, sw)
    xa_ref[:] = (
        _ff_dot(x_ref[:].reshape(K * B, IN), iw_ref[:], ffprec) + b_ref[:]
    ).reshape(K, B, 4 * H).astype(xa_ref.dtype)

    def gates(xF, c):
        u = jax.nn.sigmoid(xF[:, :H])
        f = jax.nn.sigmoid(xF[:, H : 2 * H])
        gg = jnp.tanh(xF[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(xF[:, 3 * H :])
        c2 = f * c + u * gg
        return o * jnp.tanh(c2), c2

    def step(k, carry):
        hA, cA, hB, cB = carry
        kk = (K - 1 - k) if backward else k
        valid = (g * K + kk) < lens  # [B, 1]
        vA, vB = valid[:B2], valid[B2:]
        # both step matmuls issue before either chain's gate math
        mA = rdot(hA)
        mB = rdot(hB)
        h2A, c2A = gates(xa_ref[kk, :B2].astype(jnp.float32) + mA, cA)
        h2B, c2B = gates(xa_ref[kk, B2:].astype(jnp.float32) + mB, cB)
        out_ref[kk, :B2] = jnp.where(vA, h2A, 0.0).astype(out_ref.dtype)
        out_ref[kk, B2:] = jnp.where(vB, h2B, 0.0).astype(out_ref.dtype)
        return (
            jnp.where(vA, h2A, hA),
            jnp.where(vA, c2A, cA),
            jnp.where(vB, h2B, hB),
            jnp.where(vB, c2B, cB),
        )

    hA, cA, hB, cB = lax.fori_loop(
        0, K, step, (h_ref[0], c_ref[0], h_ref[1], c_ref[1]), unroll=True
    )
    h_ref[0], c_ref[0] = hA, cA
    h_ref[1], c_ref[1] = hB, cB


def _grumod_fused_dual_kernel(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref,
                              sw_ref, len_ref, out_ref, h_ref, xa_ref):
    """GRU-mod counterpart of _lstm_fused_dual_kernel."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    H = h_ref.shape[-1]
    B2 = h_ref.shape[1]
    K, B, IN = x_ref.shape
    g = (pl.num_programs(0) - 1 - t) if backward else t
    lens = len_ref[:]
    sw = sw_ref[:]
    rdot = _make_rdot(rnnprec, sw)
    xa_ref[:] = (
        _ff_dot(x_ref[:].reshape(K * B, IN), iw_ref[:], ffprec) + b_ref[:]
    ).reshape(K, B, 3 * H).astype(xa_ref.dtype)

    def gates(x, v, h):
        z = jax.nn.sigmoid(x[:, :H] + v[:, :H])
        r = jax.nn.sigmoid(x[:, H : 2 * H] + v[:, H : 2 * H])
        hbar = jnp.tanh(r * v[:, 2 * H :] + x[:, 2 * H :])
        return z * h + (1 - z) * hbar

    def step(k, carry):
        hA, hB = carry
        kk = (K - 1 - k) if backward else k
        valid = (g * K + kk) < lens
        vA, vB = valid[:B2], valid[B2:]
        mA = rdot(hA)
        mB = rdot(hB)
        h2A = gates(xa_ref[kk, :B2].astype(jnp.float32), mA, hA)
        h2B = gates(xa_ref[kk, B2:].astype(jnp.float32), mB, hB)
        out_ref[kk, :B2] = jnp.where(vA, h2A, 0.0).astype(out_ref.dtype)
        out_ref[kk, B2:] = jnp.where(vB, h2B, 0.0).astype(out_ref.dtype)
        return jnp.where(vA, h2A, hA), jnp.where(vB, h2B, hB)

    hA, hB = lax.fori_loop(0, K, step, (h_ref[0], h_ref[1]), unroll=True)
    h_ref[0], h_ref[1] = hA, hB


def _stream_dtype():
    """FLAPPIE_TPU_RNN_STREAM: dtype the fused kernels stream layer
    inputs at.  ``f32`` (default, reference-exact input path) or
    ``bf16``: the x blocks are cast once on the way in, halving the
    dominant HBM->VMEM DMA per grid step and doubling the time block
    the VMEM budget allows.  The input affine then runs as one bf16 MXU
    pass (the operands are already bf16-truncated, so extra passes
    would only refine bits the cast discarded); recurrent state and the
    step matmul stay at the FLAPPIE_TPU_RNN_PRECISION policy."""
    import os

    return os.environ.get("FLAPPIE_TPU_RNN_STREAM", "f32").lower()


def _fused_time_block(B: int, IN: int, GH: int, H: int, xbytes: int,
                      h3_affine: bool = False) -> int:
    """Largest power-of-two K whose VMEM working set fits: 2 x-blocks
    [K, B, IN], 2 out-blocks [K, B, H], the block affine [K, B, GH].
    FLAPPIE_TPU_RNN_K overrides (measurement knob)."""
    import os

    force = os.environ.get("FLAPPIE_TPU_RNN_K")
    if force:
        return int(force)
    # 2 x-blocks + 2 out-blocks (double-buffered) + the single block
    # affine scratch; all three share the stream dtype.
    per_k = B * (2 * xbytes * IN + 2 * xbytes * H + xbytes * GH)
    K = 32
    while K > 1 and K * per_k > VMEM_BUDGET:
        K //= 2
    if h3_affine:
        # the high3 affine materialises bf16 hi/lo splits of the x
        # block plus one extra live f32 [K*B, GH] partial on top of the
        # accumulator (live-set model pinned by the measured production
        # config: B=128/IN=256/GH=1024 compiles and runs at K=8).
        # Check against the 16M scoped limit with that extra term and
        # shrink K if the total would not fit.
        extra_k = B * (2 * 2 * IN + 4 * GH)
        while K > 1 and K * (per_k + extra_k) > 15 * 1024 * 1024:
            K //= 2
    return K


def _dual_enabled(B: int) -> bool:
    """FLAPPIE_TPU_RNN_DUAL: run the fused layer as two interleaved
    half-batch chains (``on``/``off``/``auto``).  Bit-exact vs the
    single chain; +9% row throughput measured at B=128/H=256
    (docs/PROBE_dual_r3.json).  ``auto`` enables it on TPU for even
    batches of at least 128 rows (below that the half-chains' matmuls
    waste too many MXU rows to amortise the extra instruction issue)."""
    import os

    mode = os.environ.get("FLAPPIE_TPU_RNN_DUAL", "auto").lower()
    if mode == "off" or B % 2:
        return False
    if mode == "on":
        return True
    return jax.default_backend() == "tpu" and B >= 128


def _run_fused(kernel, x_tm, iW, b, sW, gates: int, carries: int, interpret,
               backward: bool = False, lengths=None, dual_kernel=None,
               want_c: bool = False):
    """x_tm: [T, B, IN] (time-major) -> [T, B, H].

    ``backward`` runs the recurrence from each read's end (grid and
    in-block step order reversed; outputs stay in natural time order).
    ``lengths`` ([B] int32, default all-T) gates state updates and
    zeroes outputs at padded steps, so no host-side reversal gathers or
    tail masking are needed around the kernel.
    ``want_c`` (training path): the kernel writes a second [T, B, H]
    output (the carried cell state) and this returns (h, c).
    """
    from .precision import ff_precision, rnn_precision

    ffprec = _resolve_ffprec(ff_precision(), jax.default_backend())
    rnnprec = rnn_precision()
    if rnnprec == lax.Precision.HIGH:
        rnnprec = "high3"  # manual bf16x3 emulation (see _dot_bf16x3)

    T, B, IN = x_tm.shape
    GH = iW.shape[1]
    H = GH // gates
    if interpret is None:
        interpret = _use_interpret()
    stream = _stream_dtype()
    if stream == "bf16":
        x_tm = x_tm.astype(jnp.bfloat16)
        iW = iW.astype(jnp.bfloat16)
        ffprec = lax.Precision.DEFAULT
        xa_dtype = jnp.bfloat16
        xbytes = 2
    else:
        xa_dtype = jnp.float32
        xbytes = 4
    K = _fused_time_block(B, IN, GH, H, xbytes, h3_affine=(ffprec == "high3"))
    Tpad = -(-T // K) * K
    if Tpad != T:
        x_tm = jnp.pad(x_tm, ((0, Tpad - T), (0, 0), (0, 0)))
    if lengths is None:
        lens = jnp.full((B, 1), T, jnp.int32)
    else:
        lens = lengths.astype(jnp.int32).reshape(B, 1)

    N = Tpad // K
    tmap = (lambda t: (N - 1 - t, 0, 0)) if backward else (lambda t: (t, 0, 0))
    if dual_kernel is not None and not want_c and _dual_enabled(B):
        kernel = dual_kernel
        scratch = [pltpu.VMEM((2, B // 2, H), jnp.float32) for _ in range(carries)]
    else:
        scratch = [pltpu.VMEM((B, H), jnp.float32) for _ in range(carries)]
    scratch.append(pltpu.VMEM((K, B, GH), xa_dtype))  # block affine
    out_spec = pl.BlockSpec((K, B, H), tmap, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Tpad, B, H), xa_dtype)
    out = pl.pallas_call(
        functools.partial(kernel, ffprec, rnnprec, backward),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((K, B, IN), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((IN, GH), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GH,), lambda t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, GH), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec] if want_c else out_spec,
        out_shape=[out_shape, out_shape] if want_c else out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x_tm, iW, b, sW, lens)
    if want_c:
        return out[0][:T], out[1][:T]
    return out[:T]


def lstm_layer_tm(x_tm, iW, b, sW, interpret=None, backward=False, lengths=None):
    """Fused input-affine + LSTM recurrence, time-major in/out.

    ``backward``/``lengths``: directional scan with per-read validity
    handled in-kernel (no reversal gathers or tail-mask passes).

    In bf16 stream mode (see _stream_dtype) the output is bf16: the
    next layer consumes it directly, so inter-layer HBM traffic is
    halved end to end and no cast passes materialise.  Recurrent state
    and the step matmul accumulate in f32 regardless.
    """
    return _run_fused(_lstm_fused_kernel, x_tm, iW, b, sW, 4, 2, interpret,
                      backward, lengths, dual_kernel=_lstm_fused_dual_kernel)


def grumod_layer_tm(x_tm, iW, b, sW, interpret=None, backward=False, lengths=None):
    """Fused input-affine + GRU-mod recurrence, time-major in/out."""
    return _run_fused(_grumod_fused_kernel, x_tm, iW, b, sW, 3, 1, interpret,
                      backward, lengths, dual_kernel=_grumod_fused_dual_kernel)


def lstm_layer_tm_train(x_tm, iW, b, sW, interpret=None, backward=False, lengths=None):
    """lstm_layer_tm variant returning (h_seq, c_seq) -- the training
    forward (custom-VJP residuals, ops/rnn_vjp.py).  Same math as
    lstm_layer_tm; the extra output is the carried cell state."""
    return _run_fused(_lstm_fused_train_kernel, x_tm, iW, b, sW, 4, 2,
                      interpret, backward, lengths, want_c=True)
