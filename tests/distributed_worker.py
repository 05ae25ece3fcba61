"""Worker for the multi-process data-parallel test.

Run as: python tests/distributed_worker.py <pid> <nproc> <port>

Each process owns 2 virtual CPU devices; the global mesh spans
nproc*2 devices over the data axis (the multi-host layout of
parallel/pipeline.py: ICI within a host, DCN across — here gloo).  The
batch shards over the global mesh; every process then recomputes the
whole batch single-device and asserts its shard-fed global result
matches, proving the sharded program is numerically identical to the
local one and that cross-process collectives/gathers work.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flappie_tpu.basecall import _device_basecall
from flappie_tpu.models.config import get_model_config
from flappie_tpu.models.params import init_synthetic

cfg = get_model_config("r941_native")
params_np = init_synthetic(cfg, seed=0)

n_dev = jax.device_count()
assert n_dev == 2 * nproc, n_dev
mesh = Mesh(np.array(jax.devices()), ("data",))
repl = NamedSharding(mesh, P())
data = NamedSharding(mesh, P("data"))

params = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), repl), params_np)

# deterministic global batch: one read per device, this process's shard
T = 2048
rng = np.random.default_rng(7)
sig_global = rng.normal(size=(n_dev, T)).astype(np.float32)
len_global = (T - rng.integers(0, 200, size=n_dev)).astype(np.int32)
lo, hi = pid * 2, pid * 2 + 2
sig = multihost_utils.host_local_array_to_global_array(
    sig_global[lo:hi], mesh, P("data")
)
lens = multihost_utils.host_local_array_to_global_array(
    len_global[lo:hi], mesh, P("data")
)


def run(params, sig, lens):
    score, path, qchar, nblocks, _ = _device_basecall(
        params, sig, lens, cfg, 1.0, False, False
    )
    return score, nblocks


f = jax.jit(run, out_shardings=(repl, repl))
with mesh:
    score, nblocks = f(params, sig, lens)
# allgather returns one replica per process; they are identical
score = np.asarray(multihost_utils.process_allgather(np.asarray(score)))
score = score.reshape(nproc, n_dev)[0]

# local single-device reference over the full batch
want_score, want_nb = jax.jit(run)(
    jax.tree.map(jnp.asarray, params_np),
    jnp.asarray(sig_global),
    jnp.asarray(len_global),
)
np.testing.assert_allclose(score, np.asarray(want_score), rtol=1e-4, atol=1e-3)
print(f"[p{pid}] distributed basecall matches local: scores {np.asarray(want_score).round(2)}", flush=True)
