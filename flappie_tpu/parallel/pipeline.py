"""Data-parallel basecalling over a device mesh.

The TPU-native replacement for the reference's process-level fan-out
(``find ... | parallel -P $(nproc) -X flappie``, README.md:81-83):
reads shard over the ``data`` axis of a Mesh, weights are replicated,
and each device decodes its shard of the batch; results gather to host
once per batch with deterministic input ordering.

Works unchanged on a single host (devices = local chips) and on
multi-host pod slices: call ``init_distributed()`` on every process
first (jax.distributed), build the mesh over ``jax.devices()`` (all
processes see the global mesh), and feed each process its
``process_index``-strided slice of the reads; the sharded program and
collectives are identical.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..basecall import Basecaller, bucket_length
from ..io.fastx import BasecallResult
from ..signal.preprocess import RawTable
from .mesh import batch_sharding, make_mesh, shard_params


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Initialise the multi-host runtime (DCN rendezvous).

    No-op for single-process runs.  On a pod slice, pass the
    coordinator address (host:port) and process topology, or rely on
    the TPU environment's auto-detection.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


class DistributedBasecaller(Basecaller):
    """Basecaller whose device batches shard over a Mesh's data axis.

    Batch sizes are padded up to a multiple of the data-axis size so
    every device gets an equal shard; padded rows are zero-length reads
    and are dropped on host.
    """

    def __init__(self, *args, mesh=None, n_model: int = 1, **kw):
        super().__init__(*args, **kw)
        self.mesh = mesh if mesh is not None else make_mesh(n_model=n_model)
        self.n_data = self.mesh.shape["data"]
        with self.mesh:
            self.params = shard_params(self.params, self.mesh)

    def call_batch_device(self, signals: np.ndarray, lengths: np.ndarray):
        # Overriding the device-dispatch point (rather than call_batch)
        # keeps every caller on the sharded path, including the
        # pipelined basecall_raw_tables loop.
        B = signals.shape[0]
        pad = (-B) % self.n_data
        if pad:
            signals = np.concatenate(
                [signals, np.zeros((pad, signals.shape[1]), signals.dtype)], axis=0
            )
            lengths = np.concatenate(
                [lengths, np.zeros(pad, np.asarray(lengths).dtype)]
            )
        s = batch_sharding(self.mesh)
        with self.mesh:
            out = super().call_batch_device(
                jax.device_put(jnp.asarray(signals), s),
                jax.device_put(jnp.asarray(np.asarray(lengths, np.int32)), s),
            )
        if pad:
            out = tuple(x[:B] for x in out)
        return out

    def _shard_packed(self, buf, dispatch):
        # Packed batches shard row-wise: rows are independent reads or
        # chunks, so DP over the batch axis.
        B = np.shape(buf)[0]
        pad = (-B) % self.n_data
        if pad:
            filler = np.zeros((pad, np.shape(buf)[1]), np.float32)
            filler[:, -4] = 1.0  # dummy length (qlo=qhi=0)
            buf = np.concatenate([np.asarray(buf, np.float32), filler], axis=0)
        s = batch_sharding(self.mesh)
        with self.mesh:
            out = dispatch(jax.device_put(jnp.asarray(buf), s))
        return out[:B] if pad else out

    def dispatch_packed_chunk(self, buf):
        return self._shard_packed(buf, super().dispatch_packed_chunk)

    def dispatch_packed_batch(self, buf):
        return self._shard_packed(buf, super().dispatch_packed_batch)
