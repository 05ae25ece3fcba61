"""Stage microbench for the chunked production program (TPU).

Times, at the chunk-batch shape: the conv stack alone, the full
network forward (conv+rnn+head), and the fused forward+decode chunk
program.  Differences give per-stage costs without a profiler trip
through the axon tunnel.

    python tools/bench_stages.py [CB] [CHUNK]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from flappie_tpu.basecall import Basecaller, _device_basecall_chunk, _device_basecall_fwd
    from flappie_tpu.models.network import conv_stack

    CB = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 12800

    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, chunk_batch=CB)
    cfg, params = caller.cfg, caller.params

    key = jax.random.PRNGKey(0)
    sig = jax.block_until_ready(
        jax.random.normal(key, (CB, CHUNK), jnp.float32))
    lengths = jnp.full((CB,), CHUNK, jnp.int32)
    qlo = jnp.ones((CB,), jnp.int32)
    qhi = jnp.full((CB,), CHUNK // cfg.total_stride + 1, jnp.int32)

    # Big stage outputs are reduced ON DEVICE to one scalar -- the axon
    # tunnel transfers at O(100 MB/s), so materialising [CB,T,C] hosts
    # arrays would swamp the timing.
    @jax.jit
    def conv_only(params, sig, lengths):
        y, nb = conv_stack(params, cfg, sig[..., None], lengths)
        return jnp.sum(y), nb

    from flappie_tpu.models.network import transitions as _transitions

    @jax.jit
    def fwd_only(params, sig, lengths):
        trans, nb = _transitions(params, cfg, sig, lengths, 1.0, caller.rnn_impl)
        return jnp.sum(trans), nb

    def time_it(label, fn, n=6):
        out = fn()
        _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn()
            _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:.1f} ms", flush=True)
        return dt

    t_conv = time_it("conv stack", lambda: conv_only(params, sig, lengths))
    t_fwd = time_it("forward (conv+rnn+head)", lambda: fwd_only(params, sig, lengths))
    t_full = time_it("full chunk program", lambda: _device_basecall_chunk(
        params, sig, lengths, qlo, qhi, cfg, 1.0, False, False, caller.rnn_impl))
    print(f"=> rnn+head ~= {1e3*(t_fwd - t_conv):.1f} ms, "
          f"decode ~= {1e3*(t_full - t_fwd):.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
