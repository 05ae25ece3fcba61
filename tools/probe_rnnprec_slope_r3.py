"""Device-only A/B of the recurrent step-matmul precision tier.

probe_rnnprec_r3.py showed the 'high' (bf16x3) tier keeps BYTE parity
on every fixture case, but its wall-clock dispatch timing is swamped by
tunnel noise.  This measures the full chunk program (r941 H=256,
[128, 12800]) per tier with the slope protocol (N chained iterations
inside one jitted fori_loop; the fixed dispatch cost cancels), one
fresh process per tier (the policy binds at trace time and is not part
of the jit cache key).

Appends tier rows into docs/PROBE_rnnprec_r3.json.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_rnnprec_slope_r3.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
import jax
import jax.numpy as jnp
from jax import lax
from flappie_tpu.basecall import _device_basecall_chunk
from flappie_tpu.models.config import get_model_config
from flappie_tpu.models.params import init_synthetic

CB, CHUNK = 128, 12800
cfg = get_model_config("r941_native")
params = jax.tree.map(jnp.asarray, init_synthetic(cfg, seed=0))
key = jax.random.PRNGKey(0)
sig = jax.random.normal(key, (CB, CHUNK), jnp.float32)
lengths = jnp.full((CB,), CHUNK, jnp.int32)
qlo = jnp.ones((CB,), jnp.int32)
qhi = jnp.full((CB,), CHUNK // cfg.total_stride + 1, jnp.int32)
inner = _device_basecall_chunk.__wrapped__

@jax.jit
def prog(params, sig, n):
    def body(i, acc):
        s = sig + acc * 1e-30
        score, path, qc, nb, _tr = inner(
            params, s, lengths, qlo, qhi, cfg, 1.0, False, False, "auto")
        return (jnp.sum(score) + jnp.sum(path.astype(jnp.float32))) * 1e-30
    return lax.fori_loop(0, n, body, jnp.float32(0.0))

def run(n):
    t0 = time.perf_counter()
    np.asarray(prog(params, sig, n))
    return time.perf_counter() - t0

run(1)  # compile
lo = min(run(1) for _ in range(3))
hi = min(run(9) for _ in range(3))
ms = (hi - lo) / 8 * 1e3
print("RESULT::" + json.dumps({"ms": round(ms, 2),
    "Msamples_per_s": round(CB * CHUNK / (ms * 1e3), 2)}))
""" % {"repo": REPO}


def main() -> int:
    out_path = os.path.join(REPO, "docs", "PROBE_rnnprec_r3.json")
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}
    for tier in ("highest", "high"):
        env = dict(os.environ)
        env["FLAPPIE_TPU_RNN_PRECISION"] = tier
        env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
        proc = subprocess.run([sys.executable, "-c", CODE], env=env,
                              capture_output=True, text=True, timeout=3600)
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-4000:])
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("RESULT::")][-1]
        results[f"device_chunk_program/{tier}"] = json.loads(
            line[len("RESULT::"):])
        print(tier, results[f"device_chunk_program/{tier}"])
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(out_path)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
