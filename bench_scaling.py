"""Scaling benchmark: data-parallel basecalling throughput over a Mesh.

Measures the full device pipeline per device count, on whatever devices
the process sees:

- one real TPU chip -> the single-chip number (same work as bench.py);
- a multi-chip host / pod slice -> reads shard over the mesh data axis
  (weights replicated), reported per device and aggregate;
- multi-host: measuring across hosts needs one process per host under
  jax.distributed (flappie_tpu.parallel.pipeline.init_distributed) and
  host-local-to-global array conversion when feeding shards (see
  tests/distributed_worker.py for the pattern); this script itself
  measures single-process meshes.

With no real multi-chip hardware, the mechanics can be validated on a
virtual mesh: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python bench_scaling.py --per-device-batch 2 --T 8192 (numbers are then
CPU-bound and only the scaling *shape* is meaningful).

Prints one JSON line per measured mesh size.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from bench_common import build_batches, pipelined


def measure(n_data: int, per_device_batch: int, T: int, iters: int) -> dict:
    import jax

    from flappie_tpu.parallel.mesh import make_mesh
    from flappie_tpu.parallel.pipeline import DistributedBasecaller

    mesh = make_mesh(n_data=n_data, n_model=1)
    caller = DistributedBasecaller(
        "r941_native", seed=0, compute_trace=False, mesh=mesh
    )
    B = per_device_batch * n_data
    batches = build_batches(B, T, n_batches=2)

    # the production path: packed chunk batches sharded over the mesh
    from bench import build_chunk_batches

    caller.chunk_batch = max(caller.n_data, 128 // max(1, 128 // B))
    chunk_batches, samples = build_chunk_batches(caller, batches)
    _ = np.asarray(caller.dispatch_packed_chunk(chunk_batches[0]))
    sps = max(
        pipelined(caller.dispatch_packed_chunk, chunk_batches, samples,
                  max(1, iters // 2))
        for _ in range(2)
    )
    return {
        "metric": "signal_samples_per_second",
        "value": round(sps, 1),
        "unit": "samples/s",
        "n_devices": n_data,
        "per_device": round(sps / n_data, 1),
        "batch": B,
        "T": T,
        "backend": jax.default_backend(),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=16)
    p.add_argument("--T", type=int, default=65536)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument(
        "--devices",
        type=int,
        nargs="*",
        default=None,
        help="mesh sizes to measure (default: 1 and all)",
    )
    args = p.parse_args()

    from flappie_tpu.cli import enable_persistent_cache, honor_jax_platforms

    honor_jax_platforms()
    enable_persistent_cache()

    import jax

    n_all = jax.device_count()
    sizes = args.devices if args.devices else sorted({1, n_all})
    for n in sizes:
        if n > n_all:
            print(f"# skipping n={n}: only {n_all} devices", file=sys.stderr)
            continue
        print(json.dumps(measure(n, args.per_device_batch, args.T, args.iters)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
