"""Same-padded strided 1-D convolution.

Reference: src/layers.c:189-276 - a same-padded conv computed as three
BLAS regions (left edge, strided body, right edge), with
``ncol_out = ceil(T / stride)`` and asymmetric padding
``padL = (winlen-1)//2``, ``padR = winlen//2`` (right-hand side longer).

On TPU this is a single ``lax.conv_general_dilated``: with padding
(padL, padR) the output length is ``floor((T + padL + padR - winlen) /
stride) + 1 = ceil(T/stride)``, identical to the reference for every
output position.  XLA lowers it onto the MXU as an implicit im2col
matmul; the window dimension stays small so the contraction is
``winlen * in_ch``-deep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv1d_same(x, W, b, stride: int):
    """x: [B, T, C_in], W: [winlen, C_in, C_out], b: [C_out].

    Returns [B, ceil(T/stride), C_out].
    """
    winlen = W.shape[0]
    padL = (winlen - 1) // 2
    padR = winlen // 2
    out = lax.conv_general_dilated(
        x,
        W,
        window_strides=(stride,),
        padding=[(padL, padR)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return out + b
