"""Production-width train-step benchmark: fused-VJP vs scan (round-4 #4).

Round 3 forced training onto the lax.scan recurrence (the fused Pallas
kernels had no VJP rule); ops/rnn_vjp.py added the recompute-gates
adjoint, so the trainer's forward now runs the fused kernels on TPU.
This tool measures the payoff at production width: one supervised CRF
NLL adam step on the full r941_native architecture (H=256, 5 LSTM
layers), rnn_impl="scan" vs rnn_impl="train" (fused forward + custom
VJP backward), steps/s and loss equality.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_fused_bench_r4.py

Writes docs/TRAIN_fused_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import optax

    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.params import init_synthetic
    from flappie_tpu.train import synthetic_batch
    from flappie_tpu.train.trainer import nll_loss

    B = int(os.environ.get("TRAIN_BENCH_B", 32))
    T = int(os.environ.get("TRAIN_BENCH_T", 6400))
    STEPS = int(os.environ.get("TRAIN_BENCH_STEPS", 20))

    cfg = get_model_config("r941_native")
    params0 = init_synthetic(cfg, seed=0)
    optimizer = optax.adam(1e-4)
    signal, lengths, path = synthetic_batch(cfg, B, T, seed=1)
    args = (jnp.asarray(signal), jnp.asarray(lengths), jnp.asarray(path))

    results = {
        "backend": jax.default_backend(), "B": B, "T": T, "steps": STEPS,
        "model": "r941_native (H=256, 5 LSTM, full width)",
    }
    for impl in ("scan", "train"):
        @partial(jax.jit)
        def step_fn(params, opt_state, signal, lengths, tpath, _impl=impl):
            loss, grads = jax.value_and_grad(
                lambda p: nll_loss(p, cfg, signal, lengths, tpath,
                                   rnn_impl=_impl)
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params = jax.tree.map(jnp.asarray, params0)
        opt_state = optimizer.init(params)
        t0 = time.perf_counter()
        params, opt_state, loss = step_fn(params, opt_state, *args)
        first_loss = float(np.asarray(loss))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(STEPS):
            params, opt_state, loss = step_fn(params, opt_state, *args)
        last_loss = float(np.asarray(loss))  # materialise: real sync
        wall = time.perf_counter() - t0
        results[impl] = {
            "compile_plus_step1_s": round(compile_s, 1),
            "steps_per_s": round(STEPS / wall, 3),
            "ms_per_step": round(1000 * wall / STEPS, 1),
            "samples_per_s": round(B * T * STEPS / wall, 1),
            "first_loss": round(first_loss, 5),
            "last_loss": round(last_loss, 5),
        }
        print(f"{impl}: {results[impl]}", flush=True)

    s, t = results["scan"], results["train"]
    results["fused_speedup_x"] = round(t["steps_per_s"] / s["steps_per_s"], 2)
    results["loss_first_absdiff"] = round(
        abs(s["first_loss"] - t["first_loss"]), 6
    )
    out = os.path.join(REPO, "docs", "TRAIN_fused_r4.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"fused speedup: {results['fused_speedup_x']}x; wrote "
          f"{os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
