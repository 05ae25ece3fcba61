"""Same-padded strided 1-D convolution with reference edge semantics.

Reference: src/layers.c:189-276 - a same-padded conv computed as three
BLAS regions (left edge, strided body, right edge), with
``ncol_out = ceil(T / stride)`` and asymmetric padding
``padL = (winlen-1)//2``, ``padR = winlen//2`` (right-hand side longer).

On TPU the body is a single ``lax.conv_general_dilated``: with padding
(padL, padR) the output length is ``floor((T + padL + padR - winlen) /
stride) + 1 = ceil(T/stride)``.  XLA lowers it onto the MXU as an
implicit im2col matmul; the window dimension stays small so the
contraction is ``winlen * in_ch``-deep.

Right-edge quirk (replicated for parity): the reference's body sgemm
only emits windows that fit in a full ``stride*ceil(winlen/stride)``
block (``ifloor(X->nc - shiftX_L - w, nstepX)``, layers.c:246), so when
``winlen % stride != 0`` the last window(s) that mathematically fit are
left to the right-edge loop — which anchors them at ``n - winlen + 1 +
w`` applying the *leading* ``winlen-1-w`` taps (the sgemv at
layers.c:267 limits the row count but does not offset the W pointer),
and the final column(s) may receive only the bias.  The executable
specification is tests/oracle.py:conv_tapmap; here the standard conv's
last few columns are rewritten per read to match.  For ``stride == 1``
or ``winlen % stride == 0`` the reference equals the mathematical
same-conv and no fix is applied.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .precision import ff_precision


def _conv_math(x, W, b, stride: int):
    winlen = W.shape[0]
    padL = (winlen - 1) // 2
    padR = winlen // 2
    out = lax.conv_general_dilated(
        x,
        W,
        window_strides=(stride,),
        padding=[(padL, padR)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=ff_precision(),
        preferred_element_type=jnp.float32,
    )
    return out + b


def _ref_edge_fix(out, x, W, b, stride: int, lengths):
    """Rewrite the last few output columns of each read to match the
    reference right-edge behaviour (see module docstring)."""
    winlen = W.shape[0]
    s = stride
    padL = (winlen - 1) // 2
    padR = winlen // 2
    ncolsL = -(-padL // s)
    shift = ncolsL * s - padL
    nstepC = -(-winlen // s)
    nstepX = s * nstepC
    B, T, _ = x.shape
    Tout = out.shape[1]
    Q = nstepC + 2  # all deviations live in the last <= nstepC+1 cols

    n = lengths.astype(jnp.int32)  # [B] valid input cols
    ncolC = -(-n // s)
    maxcol = (n - shift) // nstepX
    rem = (n - shift) % nstepX
    colR0 = ncolsL + nstepC * (maxcol - 1) + rem // s + 1
    startR = s - (padL + n - winlen) % s - 1

    q = jnp.arange(Q, dtype=jnp.int32)  # [Q]
    c = ncolC[:, None] - 1 - q[None, :]  # [B, Q]

    # body-sgemm coverage test for col c
    r = (c - ncolsL) % nstepC
    k = (c - ncolsL) // nstepC
    kmax = (n[:, None] - shift - s * r) // nstepX
    covered = (c < ncolsL) | (k < kmax)  # left-edge cols are exact too

    # right-edge loop membership and value
    m = c - colR0[:, None]
    wo = startR[:, None] + m * s
    in_right = (m >= 0) & (wo < padR)
    start = n[:, None] - winlen + 1 + wo  # [B, Q] anchor of leading taps
    j = jnp.arange(winlen, dtype=jnp.int32)
    idx = start[:, :, None] + j  # [B, Q, w]
    tapmask = (
        (j[None, None, :] < winlen - 1 - wo[:, :, None])
        & (idx >= 0)
        & (idx < n[:, None, None])
    )
    def gather_windows(xb, idxb):
        # xb: [T, C], idxb: [Q, w] -> [Q, w, C]
        return xb[jnp.clip(idxb, 0, T - 1)]

    xwin = jax.vmap(gather_windows)(x, idx)  # [B, Q, w, C]
    xwin = xwin * tapmask[..., None].astype(x.dtype)
    val_right = b + jnp.einsum(
        "bqwc,wco->bqo", xwin, W, precision=lax.Precision.HIGHEST
    )

    # existing (standard-conv) values at the candidate columns
    cc = jnp.clip(c, 0, Tout - 1)
    existing = jax.vmap(lambda ob, cb: ob[cb])(out, cc)  # [B, Q, Cout]
    bias_only = jnp.broadcast_to(b, existing.shape).astype(out.dtype)
    new = jnp.where(
        covered[..., None],
        existing,
        jnp.where(in_right[..., None], val_right.astype(out.dtype), bias_only),
    )

    # Degenerate reads (n < winlen): the reference's size_t arithmetic
    # underflows there (its own behaviour is undefined), so the
    # "reference-exact" claim only holds for n >= winlen; keep the
    # mathematical same-conv for such reads instead of emulating UB.
    new = jnp.where((n[:, None] >= winlen)[..., None], new, existing)

    # scatter back; invalid cols (c < 0) are sent out of bounds and dropped
    target = jnp.where(c >= 0, c, Tout + 1)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    return out.at[bidx, target].set(new)


def conv1d_same_ct(xc, W, b):
    """Stride-1 same-conv in channels-major [B, C, T] layout.

    The early conv layers have 1-16 channels: in the natural NWC layout
    the channel axis pads to the 128-lane register width, wasting up to
    128x of every vector op and HBM stream.  Keeping TIME on lanes
    ([B, C, T]) makes them dense: the conv is a sum of winlen shifted
    slice-multiplies, fully fused by XLA.

    xc: [B, C_in, T]; W: [winlen, C_in, C_out]; returns [B, C_out, T].
    Numerically this reassociates the (k, c) reduction vs the XLA NWC
    conv (float32 ulps); the XLA path remains the parity reference.
    """
    winlen, Cin, Cout = W.shape
    B, _, T = xc.shape
    padL = (winlen - 1) // 2
    padR = winlen // 2
    xp = jnp.pad(xc, ((0, 0), (0, 0), (padL, padR)))
    # One dot over the combined (k, c) axis: a k-loop of einsums lowers
    # to winlen separate [B*T, C] matmuls each streaming the full
    # output; the stacked form is a single [B*T, winlen*Cin] x
    # [winlen*Cin, Cout] MXU pass.
    xs = jnp.stack([xp[:, :, k : k + T] for k in range(winlen)])  # [k, B, C, T]
    out = jnp.einsum(
        "kbct,kco->bot", xs, W,
        precision=ff_precision(), preferred_element_type=jnp.float32,
    )
    return out + b[None, :, None]


def conv1d_strided_ct(xc, W, b, stride: int, lengths):
    """Strided conv from channels-major input to [B, T', C_out] output
    (the recurrent stack's layout), via one im2col + one MXU matmul.

    Replicates the reference right-edge quirk through _ref_edge_fix,
    which needs a time-major view of the input for its window gathers
    (a cheap transpose next to the im2col traffic).
    """
    winlen, Cin, Cout = W.shape
    B, _, T = xc.shape
    padL = (winlen - 1) // 2
    padR = winlen // 2
    Tout = -(-T // stride)
    # pad so every strided window slice is in bounds (the extra zeros
    # beyond T+padR sit in columns the reference edge fix rewrites)
    xp = jnp.pad(
        xc, ((0, 0), (0, 0), (padL, padR + (stride * Tout - T) + stride))
    )
    # strided im2col as stacked slices, contracted in one dot (no
    # explicit transpose/reshape materialisation - XLA picks layouts)
    cols = jnp.stack(
        [
            lax.slice(xp, (0, 0, k), (B, Cin, k + stride * Tout), (1, 1, stride))
            for k in range(winlen)
        ]
    )  # [winlen, B, Cin, Tout]
    out = (
        jnp.einsum(
            "kbct,kco->bto", cols, W,
            precision=ff_precision(), preferred_element_type=jnp.float32,
        )
        + b
    )
    if stride > 1 and winlen % stride != 0:
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        out = _ref_edge_fix(out, xc.transpose(0, 2, 1), W, b, stride, lengths)
    return out


def conv1d_same(x, W, b, stride: int, lengths=None):
    """x: [B, T, C_in], W: [winlen, C_in, C_out], b: [C_out].

    ``lengths`` ([B] int32, valid input cols; defaults to T) is required
    for reference-exact right-edge behaviour when winlen % stride != 0.
    Reference-exactness assumes ``lengths >= winlen``: below that the
    reference's own size_t index arithmetic underflows (undefined
    behaviour), so such reads keep the mathematical same-conv output.

    Returns [B, ceil(T/stride), C_out].
    """
    winlen = W.shape[0]
    out = _conv_math(x, W, b, stride)
    if stride > 1 and winlen % stride != 0:
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        out = _ref_edge_fix(out, x, W, b, stride, lengths)
    return out
