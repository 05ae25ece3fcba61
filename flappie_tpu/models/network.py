"""Batched forward graphs: raw signal -> CRF transition weights.

The TPU-native equivalent of the reference transition functions
(src/networks.c:539-586 flipflop5_guppy_transitions,
:450-489 flipflop_guppy_transitions, :675-722 runlength5_guppy
transitions): one jitted function over [B, T, 1] signal batches with
per-read lengths, instead of per-read malloc'd column-major matrices.

Layer recipe per recurrent layer (identical to the reference):
input affine over the whole sequence (one big MXU matmul) followed by a
directional recurrence; backward layers are realised as
reverse_sequence -> forward scan -> reverse_sequence so the valid
(left-aligned) region is always scanned first and padding never
contaminates valid outputs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import rnn as rnn_ops
from ..ops import rnn_pallas
from ..ops.activations import ACTIVATIONS
from ..ops.conv import conv1d_same
from ..ops.heads import (
    globalnorm_flipflop,
    globalnorm_runlength,
    globalnorm_runlengthV2,
)
from ..ops.masking import mask_tail, reverse_sequence
from .config import ModelConfig


def ceil_div(a, b):
    return -(-a // b)


def _conv_impl() -> str:
    """FLAPPIE_TPU_CONV_IMPL: ``xla`` (lax.conv NWC — the parity
    reference), ``fast`` (channels-major shifted-sum + im2col), or
    ``pallas`` (``fast`` with the two leading stride-1 swish convs as
    one fused kernel, ops/conv_pallas.py).

    ``auto`` resolves to ``xla`` everywhere as of round 3: on the
    current runtime lax.conv runs the whole stack in ~3.4 ms at
    [128, 12800] while the round-2 channels-major path's im2col conv3
    einsum costs 16-17 ms (docs/PROFILE_conv_r3.json; the round-2
    measurement that motivated ``fast`` no longer reproduces).  The
    alternatives stay as measured opt-ins."""
    import os

    return os.environ.get("FLAPPIE_TPU_CONV_IMPL", "auto").replace("auto", "xla")


def _conv_stack_fast(params, cfg: ModelConfig, x, lengths, fuse12: bool = False):
    """Channels-major conv stack: stride-1 layers stay [B, C, T] (time
    on lanes), the strided layer emits the RNN stack's [B, T', C].

    With ``fuse12`` (impl "pallas") the two leading stride-1 swish
    convs run as ONE fused Pallas kernel (ops/conv_pallas.py)."""
    from ..ops.conv import conv1d_same_ct, conv1d_strided_ct

    if (
        fuse12
        and len(cfg.convs) == 3
        and cfg.convs[0].stride == 1
        and cfg.convs[1].stride == 1
        and cfg.convs[0].activation == cfg.convs[1].activation == "swish"
        and cfg.convs[0].winlen == cfg.convs[1].winlen == 5
        and (cfg.convs[0].in_ch, cfg.convs[0].out_ch, cfg.convs[1].out_ch)
        == (1, 4, 16)
    ):
        from ..ops.conv_pallas import conv12_fused

        y2 = conv12_fused(
            x[..., 0],
            params["conv0"]["W"], params["conv0"]["b"],
            params["conv1"]["W"], params["conv1"]["b"],
            lengths,
        )  # [B, 16, T] masked
        c3 = cfg.convs[2]
        y = ACTIVATIONS[c3.activation](
            conv1d_strided_ct(y2, params["conv2"]["W"], params["conv2"]["b"],
                              c3.stride, lengths)
        )
        lengths = ceil_div(lengths, c3.stride)
        return mask_tail(y, lengths), lengths

    xc = jnp.swapaxes(x, 1, 2)  # [B, C=1, T]
    for i, c in enumerate(cfg.convs):
        W = params[f"conv{i}"]["W"]
        b = params[f"conv{i}"]["b"]
        act = ACTIVATIONS[c.activation]
        if c.stride == 1:
            y = act(conv1d_same_ct(xc, W, b))
            # zero the padded tail (t >= length) in channels-major
            T = y.shape[-1]
            m = (jnp.arange(T)[None, None, :] < lengths[:, None, None])
            xc = jnp.where(m, y, 0.0)
        else:
            y = act(conv1d_strided_ct(xc, W, b, c.stride, lengths))
            lengths = ceil_div(lengths, c.stride)
            y = mask_tail(y, lengths)
            if i != len(cfg.convs) - 1:  # a later stride-1 conv follows
                xc = jnp.swapaxes(y, 1, 2)
            else:
                return y, lengths
    return jnp.swapaxes(xc, 1, 2), lengths


def conv_stack(params, cfg: ModelConfig, x, lengths):
    """x: [B, T, 1] float32, lengths: [B] -> (y [B, T', C], lengths')."""
    impl = _conv_impl()
    if impl in ("fast", "pallas") and cfg.convs[-1].stride > 1:
        return _conv_stack_fast(params, cfg, x, lengths, fuse12=(impl == "pallas"))
    for i, c in enumerate(cfg.convs):
        W = params[f"conv{i}"]["W"]
        b = params[f"conv{i}"]["b"]
        x = conv1d_same(x, W, b, c.stride, lengths)
        x = ACTIVATIONS[c.activation](x)
        lengths = ceil_div(lengths, c.stride)
        # Zero the padded tail: the reference zero-pads past the read
        # end, so the next conv/affine must see zeros there too.
        x = mask_tail(x, lengths)
    return x, lengths


def _resolve_impl(impl: str) -> str:
    # "train" = the differentiable production path: fused Pallas layers
    # with their custom VJP on TPU (ops/rnn_vjp.py), lax.scan elsewhere;
    # the head partition scan stays on the scan impl either way (the
    # Pallas decode kernels are inference-only)
    if impl in ("auto", "train"):
        import jax

        return "pallas" if jax.default_backend() == "tpu" else "scan"
    return impl


def _rnn_stack_fused_tm(params, cfg: ModelConfig, x, lengths):
    """Time-major fused-kernel path: one transpose in, one out.

    Each layer is a single Pallas kernel (input affine fused with the
    recurrence, rnn_pallas.lstm_layer_tm) so the [B, T, G*H] affine
    intermediate never exists in HBM and inter-layer data stays
    time-major [T, B, H] (the kernels' native layout).  Direction and
    per-read tail masking live INSIDE the kernel (reversed grid walk +
    validity-gated state updates), eliminating the two reversal
    gathers and the mask pass per backward layer that cost ~30 ms per
    [128, 12800] chunk batch in round 2.
    """
    from ..ops import rnn_vjp

    x_tm = jnp.swapaxes(x, 0, 1)  # [T, B, C]
    for i, r in enumerate(cfg.rnns):
        p = params[f"rnn{i}"]
        # the AD wrappers ARE the kernels under inference (custom_vjp's
        # primal is the rnn_pallas layer); under jax.grad the
        # recompute-gates adjoint applies (ops/rnn_vjp.py), so training
        # runs the fused kernels too (round-3 verdict item #4)
        fn = {
            "lstm": rnn_vjp.lstm_layer_tm_ad,
            "grumod": rnn_vjp.grumod_layer_tm_ad,
        }[r.kind]
        x_tm = fn(x_tm, p["iW"], p["b"], p["sW"],
                  backward=r.backward, lengths=lengths)
    # bf16 stream mode keeps inter-layer arrays bf16; the head runs f32
    return jnp.swapaxes(x_tm, 0, 1).astype(jnp.float32)


def rnn_stack(params, cfg: ModelConfig, x, lengths, rnn_impl: str = "auto"):
    impl = _resolve_impl(rnn_impl)
    if impl == "pallas" and all(
        r.kind in ("lstm", "grumod") and not r.residual for r in cfg.rnns
    ):
        return _rnn_stack_fused_tm(params, cfg, x, lengths)
    for i, r in enumerate(cfg.rnns):
        p = params[f"rnn{i}"]
        xa = rnn_ops.affine(x, p["iW"], p["b"])
        if r.backward:
            xa = reverse_sequence(xa, lengths)
        if r.kind == "lstm":
            y = rnn_ops.lstm_seq(xa, p["sW"])
        elif r.kind == "grumod":
            y = rnn_ops.grumod_seq(xa, p["sW"])
        elif r.kind == "gru":
            y = rnn_ops.gru_seq(xa, p["sW"], p["sW2"])
        elif r.kind == "gru_relu":
            y = rnn_ops.gru_relu_seq(xa, p["sW"], p["sW2"])
        else:
            raise ValueError(f"unknown rnn kind {r.kind!r}")
        if r.backward:
            y = reverse_sequence(y, lengths)
        if r.residual:
            # residual_inplace (src/layers.c:338-354): layer input
            # added onto the recurrence output, as in the sloika
            # graphs (src/networks.c:415,421,427,433,439)
            y = y + x
        x = mask_tail(y, lengths)
    return x


def transitions(params, cfg: ModelConfig, signal, lengths, temperature=1.0, rnn_impl: str = "auto", return_norm: bool = False):
    """signal: [B, T] or [B, T, 1] normalised signal (zero-padded),
    lengths: [B] int32 valid sample counts.

    Returns (trans [B, T//stride, out_dim], nblocks [B]); with
    ``return_norm`` (flipflop head only) additionally the per-read
    global-norm shift [B] and per-block partition increments [B, T']
    (see heads.globalnorm_flipflop) used to stitch exact viterbi
    scores across chunks.
    """
    if signal.ndim == 2:
        signal = signal[..., None]
    signal = signal.astype(jnp.float32)
    # Zero beyond each read's end: the reference conv sees zeros past the
    # read (same-padding), so valid outputs must not depend on whatever
    # the caller left in the padded tail.
    signal = mask_tail(signal, lengths)
    x, nblocks = conv_stack(params, cfg, signal, lengths)
    x = rnn_stack(params, cfg, x, nblocks, rnn_impl)
    W, b = params["ff"]["W"], params["ff"]["b"]
    # rnn_impl "scan"/"train" are the differentiable paths (training
    # losses): the head's partition scan must avoid the inference-only
    # Pallas decode kernels, or jax.grad breaks on TPU (no JVP rule).
    # The recurrent layers themselves ARE differentiable on the pallas
    # path (custom VJP, ops/rnn_vjp.py).
    head_impl = "scan" if rnn_impl in ("scan", "train") else None
    if cfg.head == "flipflop":
        if return_norm:
            out, shift, incs = globalnorm_flipflop(
                x, W, b, temperature, nblocks, cfg.nbase, return_norm=True,
                impl=head_impl
            )
            return out, nblocks, shift, incs
        out = globalnorm_flipflop(x, W, b, temperature, nblocks, cfg.nbase,
                                  impl=head_impl)
    elif return_norm:
        raise ValueError(f"return_norm unsupported for head {cfg.head!r}")
    elif cfg.head == "runlengthV2":
        out = globalnorm_runlengthV2(x, W, b, temperature, nblocks, cfg.nbase,
                                     impl=head_impl)
    elif cfg.head == "runlength":
        out = globalnorm_runlength(x, W, b, temperature, nblocks, cfg.nbase)
    else:
        raise ValueError(f"unknown head {cfg.head!r}")
    return out, nblocks


def make_transitions_fn(cfg: ModelConfig, temperature: float = 1.0, rnn_impl: str = "auto"):
    """A jittable closure over the static config."""

    def fn(params, signal, lengths):
        return transitions(params, cfg, signal, lengths, temperature, rnn_impl)

    return fn
