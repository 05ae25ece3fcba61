"""Variable-length batching utilities.

Reads have different lengths; the TPU wants static shapes.  Batches are
left-aligned and zero-padded to a bucket length.  Padding interacts
with the network in three places, all handled here or in the callers:

- convolutions: the reference zero-pads beyond the read (same-pad), so
  zeroing the padded tail reproduces the reference edge behaviour
  exactly for every valid output block;
- backward recurrences: implemented as reverse_sequence -> forward scan
  -> reverse_sequence, so the valid region always sits at the front of
  the scan and padding garbage never flows into valid outputs;
- CRF scans: masked per block (see crf.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths, T: int, dtype=jnp.float32):
    """[B] lengths -> [B, T, 1] mask of 1.0 for t < length."""
    t = jnp.arange(T)[None, :]
    return (t < lengths[:, None]).astype(dtype)[..., None]


def mask_tail(x, lengths):
    """Zero x[b, t, :] for t >= lengths[b].  x: [B, T, C]."""
    return x * length_mask(lengths, x.shape[1], x.dtype)


def reverse_sequence(x, lengths):
    """Reverse each sequence's first ``lengths[b]`` steps; tail unmoved.

    x: [B, T, C], lengths: [B] int32.  Involution: applying twice is
    the identity on the valid region.
    """
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def mask_tail_tm(x_tm, lengths):
    """Time-major mask_tail: zero x[t, b, :] for t >= lengths[b]."""
    T = x_tm.shape[0]
    m = (jnp.arange(T)[:, None] < lengths[None, :]).astype(x_tm.dtype)
    return x_tm * m[:, :, None]


def reverse_sequence_tm(x_tm, lengths):
    """Time-major reverse_sequence: x [T, B, C]."""
    T = x_tm.shape[0]
    t = jnp.arange(T)[:, None]
    idx = jnp.where(t < lengths[None, :], lengths[None, :] - 1 - t, t)
    return jnp.take_along_axis(x_tm, idx[:, :, None], axis=0)
