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
        # per-dispatch sharding records (bounded: long-lived servers
        # must not grow without bound; summaries cover the recent past)
        from collections import deque

        self.wire_log: deque = deque(maxlen=4096)
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

    def _filler_rows(self, pad: int, width: int, dtype) -> np.ndarray:
        """Padding rows for one packed wire buffer, per wire format.

        Fillers are valid no-op reads: a tiny active window and an
        empty [qlo, qhi) score range, so the device program runs them
        harmlessly and the extra rows are sliced off after dispatch.
        """
        dtype = np.dtype(dtype)
        if dtype == np.float32:
            # f32 layout: [signal | length, qlo, qhi, 0] as f32
            f = np.zeros((pad, width), np.float32)
            f[:, -4] = 1.0  # length 1, qlo=qhi=0
            return f
        if dtype == np.int16:
            # i16 layout (pack_chunk_inputs_i16): [adc | 8 f32 tail as
            # int16 pairs]; mad=1 keeps the device normalise exact-zero
            f = np.zeros((pad, width), np.int16)
            tail = np.zeros((pad, 8), np.float32)
            tail[:, 0] = 1.0  # length
            tail[:, 6] = 1.0  # mad
            f[:, -16:] = tail.view(np.int16)
            return f
        if dtype == np.int8:
            # d8 wire: encode an all-zero i16 filler through the real
            # encoder so idx/corr slots match the device decode exactly
            from ..basecall import _d8_widths, encode_d8

            W, _exc = _d8_widths(width)
            b8 = encode_d8(self._filler_rows(pad, W + 16, np.int16))
            assert b8 is not None and b8.shape[1] == width
            return b8
        raise ValueError(f"unknown packed-wire dtype {dtype}")

    def _dispatch_packed(self, program, buf, G=None):
        """Shard the batch axis of EVERY packed wire over the mesh.

        Rows of every packed buffer are independent reads or chunks, so
        this is plain data parallelism: pad rows to a multiple of the
        data-axis size (per group for grouped dispatches, so the device
        reshape [G*rows, W] -> [G, rows, W] keeps groups aligned),
        device_put with a P("data") sharding, run the same jitted
        program, slice the filler rows back off.  ``wire_log`` records
        each dispatch's actual device span so tests can assert the data
        axis was really used (the round-3 hole was sharding silently
        not applying to the ADC wires).
        """
        buf = np.asarray(buf)
        B, W = buf.shape
        rows = B if G is None else B // G
        pad = (-rows) % self.n_data
        if pad:
            fill = self._filler_rows(pad, W, buf.dtype)
            if G is None:
                buf = np.concatenate([buf, fill], axis=0)
            else:
                groups = np.concatenate(
                    [buf.reshape(G, rows, W),
                     np.broadcast_to(fill[None], (G, pad, W))],
                    axis=1,
                )
                buf = groups.reshape(G * (rows + pad), W)
        s = batch_sharding(self.mesh)
        with self.mesh:
            xb = jax.device_put(jnp.asarray(buf), s)
            self.wire_log.append(
                {
                    "program": getattr(program, "__name__", str(program)),
                    "dtype": str(buf.dtype),
                    "rows": int(xb.shape[0]),
                    "pad": int(pad),
                    "devices": len(xb.sharding.device_set),
                    "shard_rows": int(xb.addressable_shards[0].data.shape[0]),
                }
            )
            out = super()._dispatch_packed(program, xb, G)
        if pad:
            if G is None:
                out = out[:B]
            else:
                rp = rows + pad
                out = out.reshape(G, rp, out.shape[-1])[:, :rows]
                out = out.reshape(G * rows, out.shape[-1])
        return out

    def wire_summary(self) -> dict:
        """Aggregated dispatch observability: per-program dispatch
        counts and the device span each dispatch actually used."""
        summary: dict = {}
        for rec in self.wire_log:
            key = f"{rec['program']}[{rec['dtype']}]"
            ent = summary.setdefault(
                key, {"dispatches": 0, "devices": set(), "rows": 0}
            )
            ent["dispatches"] += 1
            ent["devices"].add(rec["devices"])
            ent["rows"] += rec["rows"]
        return {
            k: {**v, "devices": sorted(v["devices"])}
            for k, v in summary.items()
        }
