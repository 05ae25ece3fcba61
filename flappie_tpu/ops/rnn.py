"""Recurrent layers as time scans (lax.scan baseline implementation).

Semantics match the reference step functions exactly:

- LSTM (src/layers.c:979-1026): per step ``xF = xAffine_t + h sW``;
  gate order in xF is [update, forget, candidate, output]; no peepholes;
  zero initial state; ``c = sigma(f)*c + sigma(u)*tanh(g)``;
  ``h = sigma(o)*tanh(c)``.
- GRU-mod / "guppy GRU" (src/layers.c:664-715): ``v = h sW`` (3H);
  ``z = sigma(x_t[:H] + v[:H])``, ``r = sigma(x_t[H:2H] + v[H:2H])``,
  ``hbar = tanh(r * v[2H:] + x_t[2H:])``, ``h' = z*h + (1-z)*hbar``.
  Note the x contribution to the candidate pre-activation is NOT summed
  into v (the C code zeroes that third of xF before the sgemv).
- sloika GRU (src/layers.c:513-568): 2-matrix variant, kept for
  completeness (no current model uses it).

Direction: these scan forward; callers implement backward layers with
``reverse_sequence`` so the valid region is always scanned first (see
masking.py).  Input affine (iW, b) is done once for the whole sequence
as a single large matmul (reference feedforward_linear,
src/flappie_matrix.c:361-389) - that is the MXU-friendly split: one
[B*T, in] x [in, G*H] matmul plus a small per-step [B,H] x [H, G*H]
recurrent matmul.

A fused Pallas kernel for the recurrent loop lives in rnn_pallas.py;
this module is the semantic baseline it is tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .precision import ff_precision


def _hmat(h, sW):
    """Recurrent matmul at full float32 precision on the MXU."""
    return jnp.dot(h, sW, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)


def affine(x, W, b):
    """[B, T, in] x [in, K] + [K] -> [B, T, K] in float32 on the MXU."""
    return (
        jnp.einsum(
            "bti,ik->btk",
            x,
            W,
            precision=ff_precision(),
            preferred_element_type=jnp.float32,
        )
        + b
    )


def lstm_seq(xaffine, sW):
    """xaffine: [B, T, 4H] (= x iW + b), sW: [H, 4H] -> [B, T, H]."""
    B, T, H4 = xaffine.shape
    H = H4 // 4
    h0 = jnp.zeros((B, H), xaffine.dtype)
    c0 = jnp.zeros((B, H), xaffine.dtype)

    def step(carry, x_t):
        h, c = carry
        xF = x_t + _hmat(h, sW)
        u = jax.nn.sigmoid(xF[:, :H])
        f = jax.nn.sigmoid(xF[:, H : 2 * H])
        g = jnp.tanh(xF[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(xF[:, 3 * H :])
        c = f * c + u * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, ys = lax.scan(step, (h0, c0), jnp.swapaxes(xaffine, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


def grumod_seq(xaffine, sW):
    """xaffine: [B, T, 3H] (= x iW + b), sW: [H, 3H] -> [B, T, H]."""
    B, T, H3 = xaffine.shape
    H = H3 // 3
    h0 = jnp.zeros((B, H), xaffine.dtype)

    def step(h, x_t):
        v = _hmat(h, sW)
        z = jax.nn.sigmoid(x_t[:, :H] + v[:, :H])
        r = jax.nn.sigmoid(x_t[:, H : 2 * H] + v[:, H : 2 * H])
        hbar = jnp.tanh(r * v[:, 2 * H :] + x_t[:, 2 * H :])
        h = z * h + (1 - z) * hbar
        return h, h

    _, ys = lax.scan(step, h0, jnp.swapaxes(xaffine, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


def gru_seq(xaffine, sW, sW2):
    """sloika 2-matrix GRU (src/layers.c:513-568).

    xaffine: [B, T, 3H], sW: [H, 2H] (z,r gates), sW2: [H, H]
    (candidate, applied to r*h).
    """
    B, T, H3 = xaffine.shape
    H = H3 // 3
    h0 = jnp.zeros((B, H), xaffine.dtype)

    def step(h, x_t):
        zr = jax.nn.sigmoid(x_t[:, : 2 * H] + _hmat(h, sW))
        z, r = zr[:, :H], zr[:, H:]
        hbar = jnp.tanh(x_t[:, 2 * H :] + _hmat(r * h, sW2))
        h = z * h + (1 - z) * hbar
        return h, h

    _, ys = lax.scan(step, h0, jnp.swapaxes(xaffine, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


def gru_relu_seq(xaffine, sW, sW2):
    """sloika GRU with ReLU candidate (src/layers.c:718-874)."""
    B, T, H3 = xaffine.shape
    H = H3 // 3
    h0 = jnp.zeros((B, H), xaffine.dtype)

    def step(h, x_t):
        zr = jax.nn.sigmoid(x_t[:, : 2 * H] + _hmat(h, sW))
        z, r = zr[:, :H], zr[:, H:]
        hbar = jax.nn.relu(x_t[:, 2 * H :] + _hmat(r * h, sW2))
        h = z * h + (1 - z) * hbar
        return h, h

    _, ys = lax.scan(step, h0, jnp.swapaxes(xaffine, 0, 1))
    return jnp.swapaxes(ys, 0, 1)
