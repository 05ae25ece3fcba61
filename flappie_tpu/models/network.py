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


def conv_stack(params, cfg: ModelConfig, x, lengths):
    """x: [B, T, 1] float32, lengths: [B] -> (y [B, T', C], lengths')."""
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


def _rnn_seq(kind: str, impl: str, xa, p):
    """Dispatch one recurrence: fused Pallas kernel on TPU ("auto"),
    lax.scan otherwise.  Both implement identical step semantics."""
    if impl == "auto":
        import jax

        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    if impl == "pallas" and kind in ("lstm", "grumod"):
        fn = {
            "lstm": rnn_pallas.lstm_seq_pallas,
            "grumod": rnn_pallas.grumod_seq_pallas,
        }[kind]
        return fn(xa, p["sW"])
    if kind == "lstm":
        return rnn_ops.lstm_seq(xa, p["sW"])
    if kind == "grumod":
        return rnn_ops.grumod_seq(xa, p["sW"])
    raise ValueError(kind)


def rnn_stack(params, cfg: ModelConfig, x, lengths, rnn_impl: str = "auto"):
    for i, r in enumerate(cfg.rnns):
        p = params[f"rnn{i}"]
        xa = rnn_ops.affine(x, p["iW"], p["b"])
        if r.backward:
            xa = reverse_sequence(xa, lengths)
        if r.kind in ("lstm", "grumod"):
            y = _rnn_seq(r.kind, rnn_impl, xa, p)
        elif r.kind == "gru":
            y = rnn_ops.gru_seq(xa, p["sW"], p["sW2"])
        elif r.kind == "gru_relu":
            y = rnn_ops.gru_relu_seq(xa, p["sW"], p["sW2"])
        else:
            raise ValueError(f"unknown rnn kind {r.kind!r}")
        if r.backward:
            y = reverse_sequence(y, lengths)
        x = mask_tail(y, lengths)
    return x


def transitions(params, cfg: ModelConfig, signal, lengths, temperature=1.0, rnn_impl: str = "auto"):
    """signal: [B, T] or [B, T, 1] normalised signal (zero-padded),
    lengths: [B] int32 valid sample counts.

    Returns (trans [B, T//stride, out_dim], nblocks [B]).
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
    if cfg.head == "flipflop":
        out = globalnorm_flipflop(x, W, b, temperature, nblocks, cfg.nbase)
    elif cfg.head == "runlengthV2":
        out = globalnorm_runlengthV2(x, W, b, temperature, nblocks, cfg.nbase)
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
