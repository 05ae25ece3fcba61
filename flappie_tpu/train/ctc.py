"""Flip-flop sequence negative log-likelihood (CTC-style lattice loss).

The proper training objective for flip-flop models (what ONT's taiyaki
optimises): the probability of a *base sequence* is the sum over all
monotonic alignments of the sequence onto the T blocks.  The flip-flop
encoding makes the state sequence deterministic given the bases -
consecutive identical bases alternate flip/flop, otherwise flip:

    s_0 = y_0;  s_i = flip(y_i) if y_i != y_{i-1}
                else (flop(y_i) if s_{i-1} is flip else flip(y_i))

so the lattice is a simple chain of L states with per-block stay
(s_i -> s_i) and move (s_{i-1} -> s_i) transitions, and

    NLL = -logsumexp over alignments = -alpha_T[L-1]

computed by a masked forward scan with an [B, L] log-alpha carry.
With globally-normalised transition weights (the model's head already
subtracts logZ) this is exactly -log P(y | signal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.crf import NEG_BIG, flipflop_index


def flipflop_encode(targets: np.ndarray, target_lengths: np.ndarray, nbase: int) -> np.ndarray:
    """Base indices [B, L] -> flip-flop state codes [B, L] (host-side)."""
    targets = np.asarray(targets)
    B, L = targets.shape
    states = np.zeros((B, L), np.int32)
    for b in range(B):
        prev_state = -1
        for i in range(int(target_lengths[b])):
            y = int(targets[b, i])
            if i > 0 and y == int(targets[b, i - 1]) and prev_state < nbase:
                prev_state = y + nbase
            else:
                prev_state = y
            states[b, i] = prev_state
    return states


def flipflop_encode_jnp(targets, target_lengths, nbase: int):
    """flipflop_encode as a jittable scan (for on-device data pipelines)."""
    B, L = targets.shape

    def step(prev_state, inp):
        y, y_prev, first = inp
        same = jnp.logical_and(~first, y == y_prev)
        flop = jnp.logical_and(same, prev_state < nbase)
        state = jnp.where(flop, y + nbase, y)
        return state, state

    ys = jnp.swapaxes(targets.astype(jnp.int32), 0, 1)  # [L, B]
    y_prev = jnp.concatenate([ys[:1], ys[:-1]], axis=0)
    first = jnp.zeros((L, B), bool).at[0].set(True)
    _, states = lax.scan(step, jnp.full((B,), -1, jnp.int32), (ys, y_prev, first))
    return jnp.swapaxes(states, 0, 1)


def flipflop_ctc_nll(trans, nblocks, states, target_lengths, nbase: int):
    """Sequence NLL under globally-normalised flip-flop weights.

    trans: [B, T, nparam] (normalised, i.e. network head output)
    nblocks: [B] valid blocks; states: [B, L] flip-flop state codes
    (from flipflop_encode); target_lengths: [B].

    Returns [B] NLL (per read, not per block).
    """
    idx = flipflop_index(nbase)
    pidx = jnp.asarray(np.maximum(idx.param_idx, 0))
    B, T, _ = trans.shape
    L = states.shape[1]

    stay_idx = pidx[states, states]  # [B, L]
    prev_states = jnp.concatenate([states[:, :1], states[:, :-1]], axis=1)
    move_idx = pidx[prev_states, states]  # [B, L]; [.,0] unused

    lpos = jnp.arange(L)[None, :]
    in_seq = lpos < target_lengths[:, None]

    alpha0 = jnp.where(lpos == 0, 0.0, NEG_BIG).astype(trans.dtype) * jnp.ones(
        (B, 1), trans.dtype
    )

    def step(alpha, inp):
        p_t, valid = inp  # [B, nparam], [B]
        stay_w = jnp.take_along_axis(p_t, stay_idx, axis=1)
        move_w = jnp.take_along_axis(p_t, move_idx, axis=1)
        stay = alpha + stay_w
        moved = jnp.concatenate(
            [jnp.full((B, 1), NEG_BIG, alpha.dtype), alpha[:, :-1] + move_w[:, 1:]],
            axis=1,
        )
        nxt = jnp.logaddexp(stay, moved)
        nxt = jnp.where(in_seq, nxt, NEG_BIG)
        alpha = jnp.where(valid[:, None], nxt, alpha)
        return alpha, None

    tvalid = jnp.arange(T)[None, :] < nblocks[:, None]
    alpha, _ = lax.scan(
        step,
        alpha0,
        (jnp.swapaxes(trans, 0, 1), jnp.swapaxes(tvalid, 0, 1)),
    )
    final = jnp.take_along_axis(
        alpha, (target_lengths[:, None] - 1).astype(jnp.int32), axis=1
    )[:, 0]
    return -final


def make_ctc_train_step(cfg, optimizer=None):
    """optax train step over the sequence NLL (mean per-block)."""
    import optax

    from ..models.network import transitions

    optimizer = optimizer if optimizer is not None else optax.adam(1e-4)

    def loss_fn(params, signal, lengths, states, target_lengths):
        # scan recurrence: the fused Pallas kernels are inference-only
        # (no VJP rule), see train/trainer.py
        trans, nblocks = transitions(params, cfg, signal, lengths, rnn_impl="scan")
        nll = flipflop_ctc_nll(trans, nblocks, states, target_lengths, cfg.nbase)
        return jnp.mean(nll / jnp.maximum(nblocks, 1).astype(trans.dtype))

    @jax.jit
    def train_step(params, opt_state, signal, lengths, states, target_lengths):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, signal, lengths, states, target_lengths
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax as _optax

        params = _optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer
