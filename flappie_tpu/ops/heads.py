"""Globally-normalised output heads.

- flip-flop (reference globalnorm_flipflop/manystay, src/layers.c:1082-1106):
  ``C = tanh(W^T x + b) * 5 / temperature`` then subtract
  ``logZ / nblocks`` (per read) from every parameter.  Note the
  temperature scales *after* the tanh (shift_scale with scale=T/5).
- run-length V2 (globalnorm_runlengthV2, src/layers.c:1306-1359):
  shape = 1 + softplus, scale = 1e-8 + softplus, transitions =
  5*tanh/temperature with global normalisation over the transition
  block only.
- run-length V1 (globalnorm_runlength, src/layers.c:1176-1238): as V2
  but scale eta = 1e-1 and 2*nbase transition params (move + stay per
  base); kept for parity with the reference's V1 model family.

All heads run batched [B, T, ...] with per-read valid lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .crf import TransIndex, crf_forward, crf_partition, flipflop_index, rle_index
from .masking import mask_tail
from .rnn import affine


def _safe_n(nblocks, dtype):
    """Per-read block count as a divisor; zero-length (padded) rows use 1
    to keep their lane NaN-free - their output is masked to zero anyway."""
    return jnp.maximum(nblocks, 1).astype(dtype)


def globalnorm_flipflop(x, W, b, temperature, nblocks, nbase: int,
                        return_norm: bool = False,
                        impl: str | None = None):
    """x: [B, T, H] -> trans [B, T, nparam], logZ-normalised per read.

    Padded blocks are zeroed on output.

    With ``return_norm`` also returns the per-read shift (logZ/nblocks)
    and the per-block partition increments inc[t] =
    lse(alpha[t+1]) - lse(alpha[t]) (zero on padded blocks, since the
    scan leaves alpha unchanged there).  The increments are
    washout-local: summed over a chunk's owned block range they stitch
    the FULL-read logZ across chunks (logZ = sum(inc) + log(nstate),
    the log(nstate) being the uniform-zeros alpha0), which makes the
    chunked viterbi-only score match the unchunked score instead of
    drifting with each chunk's own shift.
    """
    C = jnp.tanh(affine(x, W, b)) * (5.0 / temperature)
    if return_norm:
        import jax.scipy.special as jss

        alphas, logZ = crf_forward(C, nblocks, nbase, impl=impl)
        l = jss.logsumexp(alphas, axis=-1)  # [B, T+1]
        incs = l[:, 1:] - l[:, :-1]  # [B, T]
        shift = logZ / _safe_n(nblocks, C.dtype)
        return mask_tail(C - shift[:, None, None], nblocks), shift, incs
    logZ = crf_partition(C, nblocks, nbase, impl=impl) / _safe_n(nblocks, C.dtype)
    C = C - logZ[:, None, None]
    return mask_tail(C, nblocks)


def globalnorm_runlengthV2(x, W, b, temperature, nblocks, nbase: int,
                           impl: str | None = None):
    """x: [B, T, H] -> params [B, T, 2*nbase + 2*nbase^2].

    Layout per block: nbase shapes, nbase scales, 2*nbase^2 transitions.
    """
    raw = affine(x, W, b)
    nrun = 2 * nbase
    shape = 1.0 + jax.nn.softplus(raw[..., :nbase])
    scale = 1e-8 + jax.nn.softplus(raw[..., nbase:nrun])
    trans = jnp.tanh(raw[..., nrun:]) * (5.0 / temperature)
    logZ = crf_partition(trans, nblocks, 0, idx=rle_index(nbase), impl=impl) / _safe_n(
        nblocks, raw.dtype
    )
    trans = trans - logZ[:, None, None]
    out = jnp.concatenate([shape, scale, trans], axis=-1)
    return mask_tail(out, nblocks)


def globalnorm_runlength(x, W, b, temperature, nblocks, nbase: int):
    """V1 run-length head: [shape, scale, move, stay] x nbase params.

    Global normalisation runs over the move/stay weights with the V1
    structure: move to any different base (weight independent of the
    origin base), stay in the same base (src/layers.c:1127-1174).
    """
    raw = affine(x, W, b)
    shape = 1.0 + jax.nn.softplus(raw[..., :nbase])
    scale = 1e-1 + jax.nn.softplus(raw[..., nbase : 2 * nbase])
    move = jnp.tanh(raw[..., 2 * nbase : 3 * nbase]) * (5.0 / temperature)
    stay = jnp.tanh(raw[..., 3 * nbase :]) * (5.0 / temperature)
    logZ = _runlength_v1_partition(move, stay, nblocks) / _safe_n(nblocks, raw.dtype)
    out = jnp.concatenate([shape, scale, move - logZ[:, None, None], stay - logZ[:, None, None]], axis=-1)
    return mask_tail(out, nblocks)


def _runlength_v1_partition(move, stay, nblocks):
    """Forward log-partition of the V1 RLE chain (src/layers.c:1127-1174).

    States = nbase; curr[b1] = logsumexp_{b2 != b1}(prev[b2]) + move[b1],
    then logsumexp with prev[b1] + stay[b1].
    """
    import jax.scipy.special as jss
    from jax import lax

    B, T, nbase = move.shape
    a0 = jnp.zeros((B, nbase), move.dtype)

    def step(alpha, inp):
        mv, st, valid = inp
        total = jss.logsumexp(alpha, axis=-1, keepdims=True)
        # logsumexp over b2 != b1 = log(exp(total) - exp(alpha_b1)),
        # computed stably as total + log1p(-exp(alpha - total))
        excl = total + jnp.log1p(
            -jnp.clip(jnp.exp(alpha - total), None, 1.0 - 1e-7)
        )
        nxt = jnp.logaddexp(excl + mv, alpha + st)
        alpha = jnp.where(valid[:, None], nxt, alpha)
        return alpha, None

    tvalid = jnp.arange(T)[None, :] < nblocks[:, None]
    alpha, _ = lax.scan(
        step,
        a0,
        (
            jnp.swapaxes(move, 0, 1),
            jnp.swapaxes(stay, 0, 1),
            jnp.swapaxes(tvalid, 0, 1),
        ),
    )
    return jss.logsumexp(alpha, axis=-1)
