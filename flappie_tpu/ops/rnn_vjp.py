"""Custom VJP for the fused Pallas recurrent layers (training path).

Round-3 verdict item #4: training was forced onto the lax.scan
recurrence because the fused kernels (rnn_pallas.lstm_layer_tm /
grumod_layer_tm) had no differentiation rule, so the self-hosting
training story (the taiyaki replacement, SURVEY §3.3) ran at scan
speed.  This module attaches a ``jax.custom_vjp`` to both layer kinds:

- **forward** runs the fused Pallas kernel (for LSTM, a train variant
  that additionally writes the carried cell state, one extra [T, B, H]
  output -- GRU-mod needs no extra state: everything is recomputable
  from the hidden sequence);
- **backward** is a recompute-gates adjoint: a single reverse
  ``lax.scan`` whose step recomputes the gate pre-activations from the
  SAVED hidden/cell sequences (one [B,H]x[H,GH] matmul, mirroring the
  forward step) and emits the pre-activation cotangent dxF; all weight
  gradients then reduce to three batched matmuls outside the scan
  (dsW = sum_t h_{t-1}^T dxF_t, diW = sum_t x_t^T dxF_t, dx = dxF iW^T).

Backward-direction layers are handled by per-read time reversal
(ops.masking.reverse_sequence_tm) of the saved sequences and the output
cotangent, which turns the end-anchored recurrence into the
start-anchored form the adjoint scan handles; dx is reversed back.
Validity gating matches the kernels exactly: invalid steps (t >= length)
freeze the carried cotangents and contribute zero to every gradient.

Gradients are checked against jax.grad of the lax.scan path
(tests/test_train.py); the two implementations are semantically
bit-compatible forward, so grads agree to float32 accumulation order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import rnn_pallas
from .masking import reverse_sequence_tm



def _grad_precision():
    """FLAPPIE_TPU_GRAD_PRECISION: matmul precision for the adjoint
    (default "high", 3-pass bf16 -- the same fidelity tier as the
    forward kernels' step matmul policy, ops/precision.py; "highest"
    for full-f32 gradients).  CPU ignores precision (always true f32),
    so the grad-check tests are unaffected."""
    import os

    from .precision import _LEVELS

    return _LEVELS[os.environ.get("FLAPPIE_TPU_GRAD_PRECISION", "high").lower()]


def _float0(x):
    """Cotangent for integer-dtype primal args (JAX's float0)."""
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def recurrent_layer_ad(meta, x_tm, iW, b, sW, lengths):
    """Differentiable fused recurrent layer, time-major in/out.

    ``meta``: (kind, backward) with kind in {"lstm", "grumod"}.  The
    primal is exactly rnn_pallas.{lstm,grumod}_layer_tm -- under plain
    inference jit this wrapper adds nothing; under jax.grad the rules
    below apply.
    """
    kind, backward = meta
    fn = {
        "lstm": rnn_pallas.lstm_layer_tm,
        "grumod": rnn_pallas.grumod_layer_tm,
    }[kind]
    return fn(x_tm, iW, b, sW, backward=backward, lengths=lengths)


def _fwd(meta, x_tm, iW, b, sW, lengths):
    kind, backward = meta
    if kind == "lstm":
        out, c_seq = rnn_pallas.lstm_layer_tm_train(
            x_tm, iW, b, sW, backward=backward, lengths=lengths
        )
    else:
        out = rnn_pallas.grumod_layer_tm(
            x_tm, iW, b, sW, backward=backward, lengths=lengths
        )
        c_seq = None
    return out, (x_tm, iW, b, sW, lengths, out, c_seq)


def _lstm_adjoint_scan(xa, h_prev, c_prev, dy, valid, sW, prec):
    """Reverse scan emitting dxF [T, B, 4H]; see module docstring."""
    H = sW.shape[0]

    def step(carry, inp):
        dh, dc = carry
        xa_t, hp, cp, dy_t, v = inp
        xF = xa_t + jnp.dot(hp, sW, precision=prec,
                            preferred_element_type=jnp.float32)
        u = jax.nn.sigmoid(xF[:, :H])
        f = jax.nn.sigmoid(xF[:, H : 2 * H])
        g = jnp.tanh(xF[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(xF[:, 3 * H :])
        c2 = f * cp + u * g
        tc = jnp.tanh(c2)
        dh2 = v * (dh + dy_t)
        dct = v * dc + o * dh2 * (1.0 - tc * tc)
        do = tc * dh2
        df = cp * dct
        du = g * dct
        dg = u * dct
        dxF = jnp.concatenate(
            [
                du * u * (1.0 - u),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        dh_prev = jnp.dot(dxF, sW.T, precision=prec,
                          preferred_element_type=jnp.float32) \
            + (1.0 - v) * dh
        dc_prev = f * dct + (1.0 - v) * dc
        return (dh_prev, dc_prev), dxF

    B = dy.shape[1]
    zero = jnp.zeros((B, H), jnp.float32)
    (_, _), dxF_seq = lax.scan(
        step, (zero, zero), (xa, h_prev, c_prev, dy, valid), reverse=True
    )
    return dxF_seq, dxF_seq  # (dxa, dv) coincide for LSTM


def _grumod_adjoint_scan(xa, h_prev, _c_prev, dy, valid, sW, prec):
    """Reverse scan emitting (dxa, dv), both [T, B, 3H]."""
    H = sW.shape[0]

    def step(dh, inp):
        xa_t, hp, dy_t, v = inp
        vmat = jnp.dot(hp, sW, precision=prec,
                       preferred_element_type=jnp.float32)
        z = jax.nn.sigmoid(xa_t[:, :H] + vmat[:, :H])
        r = jax.nn.sigmoid(xa_t[:, H : 2 * H] + vmat[:, H : 2 * H])
        hbar = jnp.tanh(r * vmat[:, 2 * H :] + xa_t[:, 2 * H :])
        dh2 = v * (dh + dy_t)
        dz = (hp - hbar) * dh2
        dpre_hbar = (1.0 - z) * dh2 * (1.0 - hbar * hbar)
        dr = dpre_hbar * vmat[:, 2 * H :]
        dvh = dpre_hbar * r
        dpre_z = dz * z * (1.0 - z)
        dpre_r = dr * r * (1.0 - r)
        dxa = jnp.concatenate([dpre_z, dpre_r, dpre_hbar], axis=1)
        dv = jnp.concatenate([dpre_z, dpre_r, dvh], axis=1)
        dh_prev = z * dh2 \
            + jnp.dot(dv, sW.T, precision=prec,
                      preferred_element_type=jnp.float32) \
            + (1.0 - v) * dh
        return dh_prev, (dxa, dv)

    B = dy.shape[1]
    zero = jnp.zeros((B, H), jnp.float32)
    _, (dxa_seq, dv_seq) = lax.scan(
        step, zero, (xa, h_prev, dy, valid), reverse=True
    )
    return dxa_seq, dv_seq


def _bwd(meta, res, dy):
    kind, backward = meta
    prec = _grad_precision()
    x_tm, iW, b, sW, lengths, h_seq, c_seq = res
    T, B, IN = x_tm.shape
    H = sW.shape[0]
    lens = lengths.astype(jnp.int32)
    x32 = x_tm.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    h_seq = h_seq.astype(jnp.float32)
    if backward:
        # per-read time reversal turns the end-anchored recurrence into
        # the start-anchored form the adjoint scan handles; padded tails
        # (zeros) stay in place
        x32 = reverse_sequence_tm(x32, lens)
        h_seq = reverse_sequence_tm(h_seq, lens)
        dy = reverse_sequence_tm(dy, lens)
        if c_seq is not None:
            c_seq = reverse_sequence_tm(c_seq.astype(jnp.float32), lens)
    elif c_seq is not None:
        c_seq = c_seq.astype(jnp.float32)

    # recompute the input affine in f32 (one big MXU matmul)
    xa = (
        jnp.dot(
            x32.reshape(T * B, IN), iW.astype(jnp.float32),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        + b.astype(jnp.float32)
    ).reshape(T, B, -1)

    zrow = jnp.zeros((1, B, H), jnp.float32)
    h_prev = jnp.concatenate([zrow, h_seq[:-1]], axis=0)
    c_prev = (
        jnp.concatenate([zrow, c_seq[:-1]], axis=0)
        if c_seq is not None
        else None
    )
    valid = (
        jnp.arange(T)[:, None, None] < lens[None, :, None]
    ).astype(jnp.float32)  # [T, B, 1]

    adjoint = _lstm_adjoint_scan if kind == "lstm" else _grumod_adjoint_scan
    dxa_seq, dv_seq = adjoint(xa, h_prev, c_prev, dy, valid, sW, prec)

    GH = dxa_seq.shape[-1]
    dsW = jnp.einsum("tbh,tbg->hg", h_prev, dv_seq,
                     precision=prec)
    diW = jnp.einsum("tbi,tbg->ig", x32, dxa_seq,
                     precision=prec)
    db = dxa_seq.sum(axis=(0, 1))
    dx = jnp.dot(
        dxa_seq.reshape(T * B, GH), iW.astype(jnp.float32).T,
        precision=prec,
        preferred_element_type=jnp.float32,
    ).reshape(T, B, IN)
    if backward:
        dx = reverse_sequence_tm(dx, lens)
    return (
        dx.astype(x_tm.dtype),
        diW.astype(iW.dtype),
        db.astype(b.dtype),
        dsW.astype(sW.dtype),
        _float0(lengths),
    )


recurrent_layer_ad.defvjp(_fwd, _bwd)


def lstm_layer_tm_ad(x_tm, iW, b, sW, backward=False, lengths=None):
    """Differentiable drop-in for rnn_pallas.lstm_layer_tm."""
    if lengths is None:
        lengths = jnp.full((x_tm.shape[1],), x_tm.shape[0], jnp.int32)
    return recurrent_layer_ad(("lstm", bool(backward)), x_tm, iW, b, sW, lengths)


def grumod_layer_tm_ad(x_tm, iW, b, sW, backward=False, lengths=None):
    """Differentiable drop-in for rnn_pallas.grumod_layer_tm."""
    if lengths is None:
        lengths = jnp.full((x_tm.shape[1],), x_tm.shape[0], jnp.int32)
    return recurrent_layer_ad(("grumod", bool(backward)), x_tm, iW, b, sW, lengths)
