"""Device mesh and sharding policies.

The reference's scaling model is one process per read stitched together
with GNU parallel (README.md:81-83).  The TPU-native equivalent:

- **data parallelism** over reads/chunks: the batch axis is sharded over
  the ``data`` mesh axis; weights are replicated along it.
- **tensor parallelism** over the recurrent hidden dimension: the gate
  dimension (last axis of iW/sW/b, the FF input) shards over ``model``;
  XLA's SPMD partitioner inserts the all-gathers/psums for the
  per-step [B,H] x [H,GH] matmul over ICI.

For basecalling inference, pure DP is optimal (reads are independent);
TP exists for very large models and to exercise the multi-axis path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def param_pspec(key: str, shape: tuple, n_model: int) -> P:
    """Sharding spec for one parameter array (by flat key)."""
    if n_model <= 1:
        return P()
    last = shape[-1]
    if last % n_model == 0 and (key.startswith("rnn") or key.startswith("ff")):
        # shard the gate/output dim over 'model'
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh (replicated over data, gate dims
    over model)."""
    n_model = mesh.shape["model"]

    def place(path, x):
        key = "/".join(str(p.key) for p in path)
        spec = param_pspec(key, np.shape(x), n_model)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_opt_state(opt_state, mesh: Mesh):
    """Place an optax state on the mesh with param-shaped leaves (adam
    mu/nu mirror the param tree) sharded exactly like the params, and
    scalar bookkeeping (step counts) replicated.  Without this the
    optimizer memory would not scale with the model axis — 2x the
    param memory stays unsharded and OOMs first at scale.
    """
    n_model = mesh.shape["model"]

    def place(path, x):
        # param leaves sit under .../mu['layer']['part']: the trailing
        # two DictKeys name the param; anything else is bookkeeping
        from jax.tree_util import DictKey

        if len(path) >= 2 and all(isinstance(p, DictKey) for p in path[-2:]):
            key = f"{path[-2].key}/{path[-1].key}"
            spec = param_pspec(key, np.shape(x), n_model)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, *arrays):
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
