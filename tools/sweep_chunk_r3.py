"""Chunk-geometry sweep + stage decomposition (round 3, VERDICT #2).

Device-only cost of the fused chunk program across chunk x overlap,
scored on PAYLOAD samples/s (chunk minus overlap: the overlap recompute
is amortised waste on long reads, so bigger chunks win unless the
longer serial scan loses more).  CB scales to keep CB*CHUNK constant.

Also splits the forward: conv / rnn / head / decode with the round-3
kernels (in-kernel direction+masking, lax.conv default).

    python tools/sweep_chunk_r3.py
Writes docs/SWEEP_chunk_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS: dict = {}


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.basecall import _device_basecall_chunk, _device_basecall_fwd
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.network import conv_stack, rnn_stack
    from flappie_tpu.models.params import init_synthetic

    cfg = get_model_config("r941_native")
    params = jax.tree.map(jnp.asarray, init_synthetic(cfg, seed=0))
    key = jax.random.PRNGKey(0)

    def slope(label, make_body, CB, CHUNK, payload, n_lo=1, n_hi=5):
        sig = jax.random.normal(key, (CB, CHUNK), jnp.float32)

        body = make_body(CB, CHUNK)

        @jax.jit
        def prog(params, sig, n):
            def it(i, acc):
                return body(params, sig + acc * 1e-30) * 1e-30

            return lax.fori_loop(0, n, it, jnp.float32(0.0))

        t0 = time.perf_counter()
        np.asarray(prog(params, sig, 1))
        t_compile = time.perf_counter() - t0

        def run(n, reps=3):
            best = 1e30
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(prog(params, sig, n))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
        RESULTS[label] = {
            "ms": per * 1e3,
            "payload_Msamples_per_s": payload / per / 1e6,
            "compile_s": t_compile,
        }
        print(f"{label:46s} {per*1e3:8.2f} ms  "
              f"{payload/per/1e6:7.2f} Ms/s payload  (compile {t_compile:.0f}s)",
              flush=True)

    inner_chunk = _device_basecall_chunk.__wrapped__
    inner_fwd = _device_basecall_fwd.__wrapped__

    def full(CB, CHUNK):
        lengths = jnp.full((CB,), CHUNK, jnp.int32)
        qlo = jnp.ones((CB,), jnp.int32)
        qhi = jnp.full((CB,), CHUNK // cfg.total_stride + 1, jnp.int32)

        def body(params, s):
            score, path, qc, nb, _ = inner_chunk(
                params, s, lengths, qlo, qhi, cfg, 1.0, False, False, "auto")
            return jnp.sum(score) + jnp.sum(path.astype(jnp.float32))

        return body

    def fwd(CB, CHUNK):
        lengths = jnp.full((CB,), CHUNK, jnp.int32)

        def body(params, s):
            trans, nb = inner_fwd(params, s, lengths, cfg, 1.0, "auto")
            return jnp.sum(trans)

        return body

    def nohead(CB, CHUNK):
        lengths = jnp.full((CB,), CHUNK, jnp.int32)

        def body(params, s):
            x, nb = conv_stack(params, cfg, s[..., None], lengths)
            x = rnn_stack(params, cfg, x, nb, "auto")
            return jnp.sum(x)

        return body

    def convonly(CB, CHUNK):
        lengths = jnp.full((CB,), CHUNK, jnp.int32)

        def body(params, s):
            x, nb = conv_stack(params, cfg, s[..., None], lengths)
            return jnp.sum(x)

        return body

    # -- stage decomposition at the production geometry ------------------
    CB0, CH0 = 128, 12800
    pay0 = CB0 * CH0
    slope("stage conv [128x12800]", convonly, CB0, CH0, pay0)
    slope("stage conv+rnn", nohead, CB0, CH0, pay0)
    slope("stage forward (conv+rnn+head)", fwd, CB0, CH0, pay0)
    slope("stage full chunk program", full, CB0, CH0, pay0)

    # -- geometry sweep (payload-scored) ---------------------------------
    for CHUNK, OVERLAP, CB in [
        (12800, 800, 128), (12800, 1600, 128), (12800, 3200, 128),
        (25600, 1600, 64), (25600, 3200, 64),
        (51200, 3200, 32),
    ]:
        payload = CB * (CHUNK - OVERLAP)
        slope(f"geom chunk={CHUNK} overlap={OVERLAP} CB={CB}",
              full, CB, CHUNK, payload)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "SWEEP_chunk_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
