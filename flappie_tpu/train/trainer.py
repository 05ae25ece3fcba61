"""CRF training: supervised block-path negative log-likelihood.

The reference has no training (weights are compiled in; training lives
in ONT's taiyaki).  This module provides the TPU-native training loop
the framework needs to be self-hosting: the flip-flop CRF NLL of a
supervised block path,

    loss = -mean_b( path_score_b / nblocks_b )

where ``path_score`` sums globally-normalised transition weights along
the target path (the logZ subtraction inside the head makes this a
proper log-likelihood).  Differentiating through the head's masked
partition scan gives exact CRF gradients.

``make_train_step`` builds a jittable optax step; shard it over a Mesh
with parallel.mesh (data-parallel batch, optionally tensor-parallel
gate dims) - XLA inserts the gradient all-reduces over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import ModelConfig
from ..models.network import transitions
from ..ops.crf import path_score


def nll_loss(params, cfg: ModelConfig, signal, lengths, target_path,
             rnn_impl: str = "train"):
    """signal [B,T], lengths [B], target_path [B, T//stride + 1] int32.

    ``rnn_impl="train"`` is the differentiable production path: on TPU
    the fused Pallas recurrent kernels run forward and their custom VJP
    (recompute-gates adjoint, ops/rnn_vjp.py) runs backward, so
    training is no longer forced onto lax.scan speed; on CPU it
    resolves to the scan path XLA differentiates end to end.  Pass
    ``rnn_impl="scan"`` for the scan-everywhere reference gradients.
    """
    trans, nblocks = transitions(
        params, cfg, signal, lengths, rnn_impl=rnn_impl
    )
    score = path_score(trans, target_path, nblocks, cfg.nbase)
    return -jnp.mean(score / nblocks.astype(trans.dtype))


def make_train_step(cfg: ModelConfig, optimizer=None):
    optimizer = optimizer if optimizer is not None else optax.adam(1e-4)

    @partial(jax.jit, static_argnames=())
    def train_step(params, opt_state, signal, lengths, target_path):
        loss, grads = jax.value_and_grad(nll_loss)(
            params, cfg, signal, lengths, target_path
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer


def save_train_state(path: str, params, opt_state, step: int) -> None:
    """Checkpoint the full training state (params + optimiser + step)
    to one npz.  Leaves are keyed by their pytree key-paths, so resume
    restores exact adam moments; the treedefs are rebuilt from a fresh
    optimizer.init at load time (they are structural, not stateful)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        flat["p/" + jax.tree_util.keystr(kp)] = np.asarray(leaf)
    for kp, leaf in jax.tree_util.tree_leaves_with_path(opt_state):
        flat["o/" + jax.tree_util.keystr(kp)] = np.asarray(leaf)
    flat["step"] = np.asarray(step, np.int64)
    np.savez(path, **flat)


def load_train_state(path: str, params_template, opt_state_template):
    """Restore (params, opt_state, step) saved by save_train_state.

    Templates (e.g. init_synthetic + optimizer.init) provide the tree
    structure; every leaf must be present in the file.
    """
    with np.load(path) as z:
        files = dict(z)

    def fill(prefix, template):
        leaves_kp = jax.tree_util.tree_leaves_with_path(template)
        treedef = jax.tree_util.tree_structure(template)
        leaves = []
        for kp, old in leaves_kp:
            key = prefix + jax.tree_util.keystr(kp)
            if key not in files:
                raise KeyError(f"checkpoint missing {key}")
            new = files[key]
            if np.shape(new) != np.shape(old):
                raise ValueError(
                    f"checkpoint leaf {key} has shape {np.shape(new)}, "
                    f"expected {np.shape(old)}"
                )
            leaves.append(jnp.asarray(new))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = fill("p/", params_template)
    opt_state = fill("o/", opt_state_template)
    return params, opt_state, int(files["step"])


def synthetic_batch(cfg: ModelConfig, B: int, T: int, seed: int = 0):
    """A tiny synthetic supervised batch (for tests and dry runs)."""
    rng = np.random.default_rng(seed)
    signal = rng.normal(size=(B, T)).astype(np.float32)
    lengths = np.full(B, T, np.int32)
    nblk = cfg.nblocks(T)
    # random flip states: transitions into flip states are always allowed
    path = rng.integers(0, cfg.nbase, size=(B, nblk + 1)).astype(np.int32)
    return signal, lengths, path
