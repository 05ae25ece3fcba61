"""Fused Pallas kernel for the two leading stride-1 convolutions.

The stride-5 model family opens with conv 1->4 (w=5) and conv 4->16
(w=5), both swish (src/networks.c:539-555).  Their channel counts are
so small that any channels-minor layout wastes almost the whole
128-lane register width, and XLA's NWC conv lowering spends ~30 ms per
[128, 12800] chunk batch on ~1 GFLOP of work.  This kernel keeps TIME
on lanes and fuses both layers: per grid step one [B_blk, T] signal
block is read ONCE from HBM, both conv+swish layers run as unrolled
shifted multiply-adds in VMEM/registers, and only the [B_blk, 16, T]
conv2 output is written back - the y1 intermediate never exists in
HBM.

Masking matches the reference exactly: conv1's output is zeroed
outside [0, length) (the reference masks each layer's padded tail, so
conv2's window taps beyond the read end see zeros), and conv2's output is
zeroed the same way.

The kernel is inference-only; `conv12_fused` attaches a custom VJP
that recomputes the chain with differentiable XLA ops, so training
paths can run through it transparently.

MEASURED (v5e, CB=128 chunk batches, deep-pipelined): 86.5 ms vs the
XLA conv stack's 69.5 ms -- the unrolled k-shifts are unaligned LANE
slices of long VMEM buffers, which Mosaic lowers as expensive
relayouts, outweighing the HBM fusion win.  The kernel therefore stays
an OPT-IN (FLAPPIE_TPU_CONV_IMPL=pallas), kept as the starting point
for a sublane-shift formulation; `auto` does not select it.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


PAD = 4  # left+right extension so y1 exists on [-2, T+2)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv12_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, len_ref, out_ref):
    # x_ref: [Bb, T + 2*PAD] (zero-padded outside)
    # out_ref: [Bb, OG, T] -- one group of OG conv2 channels per grid
    # step along axis 1 (y1 is recomputed per group; it is tiny)
    Bb, Tp = x_ref.shape
    T = Tp - 2 * PAD
    OG = out_ref.shape[1]
    w1 = w1_ref[:]  # [5, 4]
    b1 = b1_ref[:]  # [1, 4]
    w2 = w2_ref[0]  # [5, 4, OG] (group-blocked on the leading axis)
    b2 = b2_ref[0]  # [1, OG]
    lengths = len_ref[:]  # [Bb, 1] int32

    x = x_ref[:]
    # y1 on the extended domain t' in [0, T+4), global t = t' - 2.
    # (Mosaic iota must be integer-typed)
    tpos = lax.broadcasted_iota(jnp.int32, (Bb, T + PAD), 1)
    valid1 = (tpos >= 2) & (tpos < lengths + 2)
    y1 = []
    for c in range(4):
        acc = jnp.full((Bb, T + PAD), 0.0, jnp.float32) + b1[0, c]
        for k in range(5):
            acc = acc + w1[k, c] * lax.slice(x, (0, k), (Bb, k + T + PAD))
        # zero outside the valid block range [2, length+2)
        y1.append(jnp.where(valid1, _swish(acc), 0.0))

    tpos2 = lax.broadcasted_iota(jnp.int32, (Bb, T), 1)
    valid2 = tpos2 < lengths
    for o in range(OG):
        acc = jnp.full((Bb, T), 0.0, jnp.float32) + b2[0, o]
        for k in range(5):
            for c in range(4):
                acc = acc + w2[k, c, o] * lax.slice(y1[c], (0, k), (Bb, k + T))
        out_ref[:, o, :] = jnp.where(valid2, _swish(acc), 0.0)


def _conv12_pallas(x, W1, b1, W2, b2, lengths, interpret=None):
    """x: [B, T] masked signal -> y2 [B, 16, T] (channels-major)."""
    B, T = x.shape
    if interpret is None:
        interpret = _use_interpret()
    # Mosaic requires the second-minor block dim divisible by 8 (or
    # full); grid over (batch groups of 8, two output-channel groups)
    # keeps the double-buffered out blocks within the VMEM budget.
    Bb = 8 if B % 8 == 0 else B
    OG = 8
    G = 16 // OG
    xp = jnp.pad(x, ((0, 0), (PAD, PAD)))
    lens = lengths.astype(jnp.int32)[:, None]
    # Mosaic blocks only the last two dims freely; the conv2 weight
    # groups ride a LEADING axis instead: [G, 5, 4, OG] / [G, 1, OG]
    w2g = W2.reshape(5, 4, G, OG).transpose(2, 0, 1, 3)
    b2g = b2.reshape(G, 1, OG)
    out = pl.pallas_call(
        _conv12_kernel,
        grid=(B // Bb, G),
        in_specs=[
            pl.BlockSpec((Bb, T + 2 * PAD), lambda i, j: (i, 0)),
            pl.BlockSpec((5, 4), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 5, 4, OG), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, 1, OG), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((Bb, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, OG, T), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 16, T), jnp.float32),
        interpret=interpret,
    )(xp, W1.reshape(5, 4), b1[None, :], w2g, b2g, lens)
    return out


def _conv12_xla(x, W1, b1, W2, b2, lengths):
    """Differentiable reference chain (same math, XLA ops)."""
    from .conv import conv1d_same_ct

    B, T = x.shape
    m = (jnp.arange(T)[None, None, :] < lengths[:, None, None])
    y1 = _swish(conv1d_same_ct(x[:, None, :], W1.reshape(5, 1, 4), b1))
    y1 = jnp.where(m, y1, 0.0)
    y2 = _swish(conv1d_same_ct(y1, W2, b2))
    return jnp.where(m, y2, 0.0)


@jax.custom_vjp
def conv12_fused(x, W1, b1, W2, b2, lengths):
    return _conv12_pallas(x, W1, b1, W2, b2, lengths)


def _fwd(x, W1, b1, W2, b2, lengths):
    return conv12_fused(x, W1, b1, W2, b2, lengths), (x, W1, b1, W2, b2, lengths)


def _bwd(res, g):
    x, W1, b1, W2, b2, lengths = res
    _, vjp = jax.vjp(lambda x, W1, b1, W2, b2: _conv12_xla(x, W1, b1, W2, b2, lengths),
                     x, W1, b1, W2, b2)
    dx, dW1, db1, dW2, db2 = vjp(g)
    return dx, dW1, db1, dW2, db2, None


conv12_fused.defvjp(_fwd, _bwd)
