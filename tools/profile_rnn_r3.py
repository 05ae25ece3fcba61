"""Round-3 kernel-level decomposition of the fused recurrent layer.

VERDICT r2 headline: the recurrence runs ~5 us/layer-step at
B=128/H=256 vs ~0.34 us compute-bound, with no profile pinpointing
where the time goes.  This tool measures, on the real chip, the fused
LSTM layer (rnn_pallas.lstm_layer_tm) and targeted ablations, all with
the tunnel-safe protocol: each variant is ONE jitted program that runs
the layer N times inside lax.fori_loop (chained carry), reduced to one
scalar on device; timing two N values and taking the slope removes the
per-dispatch round trip entirely.

Variants:
  precision x stream grid : rnn step matmul HIGHEST / bf16x3 / bf16,
                            x-stream f32 / bf16 (K=8 vs K=16)
  ablate-nogates          : per-step work = matmul only (gate math
                            replaced by a 2-op linear update)
  ablate-nomatmul         : per-step work = gate math only
  ablate-nostore          : no per-step out write (final state only)
  K sweep                 : FLAPPIE_TPU_RNN_K on the best config
  xla-serial              : plain XLA fori_loop of the step matmul, no
                            pallas (loop-machinery reference)
  mxu-idle                : large-matmul chip probe for context

Usage:  python tools/profile_rnn_r3.py [T] [B] [H]
Writes docs/PROFILE_r3.json with every number.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
H = int(sys.argv[3]) if len(sys.argv) > 3 else 256

RESULTS: dict = {"T": T, "B": B, "H": H}


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.ops import rnn_pallas as rp

    GH = 4 * H
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x0 = jax.random.normal(k1, (T, B, H), jnp.float32)
    iW = jax.random.normal(k2, (H, GH), jnp.float32) * 0.05
    b = jax.random.normal(k3, (GH,), jnp.float32) * 0.05
    sW = jax.random.normal(k4, (H, GH), jnp.float32) * 0.05
    x0, iW, b, sW = [jax.block_until_ready(a) for a in (x0, iW, b, sW)]

    flop_step = 2 * B * H * GH * 2  # step matmul + input affine
    flop_layer = flop_step * T

    def measure(label, layer_fn, n_lo=2, n_hi=12):
        """layer_fn: (x [T,B,H]) -> [T,B,H].  One compile; the trip
        count is a traced operand so both timings reuse the program."""

        @jax.jit
        def prog(x, n):
            # chained carry: iteration i+1 consumes iteration i's output,
            # so the while loop cannot be collapsed; LSTM outputs are
            # bounded so repeated application stays finite.  bf16-stream
            # layers output bf16: cast back so the carry type is stable
            # (the cast is ~0.3 ms vs ~5 ms/layer, same for every tier).
            def body(i, xc):
                return layer_fn(xc).astype(x.dtype)

            return jnp.sum(lax.fori_loop(0, n, body, x))

        t0 = time.perf_counter()
        np.asarray(prog(x0, 1))
        t_compile = time.perf_counter() - t0

        def run(n, reps=3):
            best = 1e30
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(prog(x0, n))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = run(n_lo), run(n_hi)
        per_layer = (t_hi - t_lo) / (n_hi - n_lo)
        per_step = per_layer / T
        tflops = flop_layer / per_layer / 1e12
        RESULTS[label] = {
            "layer_ms": per_layer * 1e3,
            "step_us": per_step * 1e6,
            "tflops": tflops,
            "compile_s": t_compile,
        }
        print(
            f"{label:34s} {per_layer*1e3:8.2f} ms/layer  "
            f"{per_step*1e6:7.3f} us/step  {tflops:6.1f} TFLOP/s  "
            f"(compile {t_compile:.0f}s)",
            flush=True,
        )
        return per_layer

    # -- chip context: big-matmul probe --------------------------------
    M = 2048 if jax.default_backend() == "tpu" else 256
    a = jax.block_until_ready(jax.random.normal(k1, (M, M), jnp.float32))

    @jax.jit
    def mxu(a, n):
        def body(i, x):
            return (
                jnp.dot(x, x, precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
                * 1e-3
            )

        return jnp.sum(lax.fori_loop(0, n, body, a))

    np.asarray(mxu(a, 1))
    t0 = time.perf_counter(); np.asarray(mxu(a, 10)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(mxu(a, 110)); t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / 100
    RESULTS["mxu_idle_tflops"] = 2 * M**3 / per / 1e12
    print(f"mxu probe: {RESULTS['mxu_idle_tflops']:.0f} TFLOP/s bf16 on [{M}]^2", flush=True)

    # -- precision x stream grid over the production kernel ------------
    from flappie_tpu.ops import precision as prec

    def fused(rnnp, stream, kk=None):
        def fn(x):
            prec.set_rnn_precision(rnnp)
            os.environ["FLAPPIE_TPU_RNN_STREAM"] = stream
            if kk is not None:
                os.environ["FLAPPIE_TPU_RNN_K"] = str(kk)
            else:
                os.environ.pop("FLAPPIE_TPU_RNN_K", None)
            try:
                return rp.lstm_layer_tm(x, iW, b, sW)
            finally:
                prec.set_rnn_precision("highest")
                os.environ["FLAPPIE_TPU_RNN_STREAM"] = "f32"
                os.environ.pop("FLAPPIE_TPU_RNN_K", None)
        return fn

    measure("fused f32-stream HIGHEST (prod)", fused("highest", "f32"))
    measure("fused f32-stream high3", fused("high", "f32"))
    measure("fused f32-stream bf16", fused("default", "f32"))
    measure("fused bf16-stream HIGHEST", fused("highest", "bf16"))
    measure("fused bf16-stream high3", fused("high", "bf16"))
    measure("fused bf16-stream bf16", fused("default", "bf16"))

    # -- ablations (kernel copies with pieces removed) -----------------
    def make_ablation(kind):
        def kernel(ffprec, rnnprec, backward, x_ref, iw_ref, b_ref, sw_ref,
                   len_ref, out_ref, h_ref, c_ref, xa_ref):
            # ablation ignores backward/len_ref (forward, all-valid);
            # signature tracks _run_fused post direction/masking
            del backward, len_ref
            from jax.experimental import pallas as pl

            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                h_ref[:] = jnp.zeros_like(h_ref)
                c_ref[:] = jnp.zeros_like(c_ref)

            Hh = h_ref.shape[-1]
            K, Bb, IN = x_ref.shape
            sw = sw_ref[:]
            rdot = rp._make_rdot(rnnprec, sw)
            xa_ref[:] = (
                rp._ff_dot(x_ref[:].reshape(K * Bb, IN), iw_ref[:], ffprec)
                + b_ref[:]
            ).reshape(K, Bb, 4 * Hh).astype(xa_ref.dtype)

            def gates(xF, h, c):
                u = jax.nn.sigmoid(xF[:, :Hh])
                f = jax.nn.sigmoid(xF[:, Hh:2*Hh])
                g = jnp.tanh(xF[:, 2*Hh:3*Hh])
                o = jax.nn.sigmoid(xF[:, 3*Hh:])
                c = f * c + u * g
                return o * jnp.tanh(c), c

            def step(k, carry):
                h, c = carry
                if kind == "nomatmul":
                    xF = xa_ref[k].astype(jnp.float32) + jnp.concatenate(
                        [h, h, h, h], axis=-1)
                else:
                    xF = xa_ref[k].astype(jnp.float32) + rdot(h)
                if kind == "nogates":
                    c = c * 0.5 + xF[:, :Hh] * 0.01
                    h = jnp.clip(xF[:, Hh:2*Hh] * 0.01 + c, -1.0, 1.0)
                else:
                    h, c = gates(xF, h, c)
                if kind != "nostore":
                    out_ref[k] = h
                return h, c

            h, c = lax.fori_loop(0, K, step, (h_ref[:], c_ref[:]), unroll=True)
            if kind == "nostore":
                out_ref[:] = jnp.broadcast_to(h, out_ref.shape)
            h_ref[:] = h
            c_ref[:] = c

        def fn(x):
            return rp._run_fused(kernel, x, iW, b, sW, 4, 2, None)

        return fn

    measure("ablate nogates (matmul only)", make_ablation("nogates"))
    measure("ablate nomatmul (gates only)", make_ablation("nomatmul"))
    measure("ablate nostore", make_ablation("nostore"))

    # -- K sweep on the fastest-looking config -------------------------
    for kk in (4, 8, 16):
        measure(f"fused bf16-stream bf16 K={kk}", fused("default", "bf16", kk))

    # -- plain-XLA serial step-matmul reference ------------------------
    h0 = jax.block_until_ready(jnp.zeros((B, H), jnp.float32))

    for lbl, p in (("xla-serial bf16", lax.Precision.DEFAULT),
                   ("xla-serial HIGHEST", lax.Precision.HIGHEST)):

        @jax.jit
        def serial(h, n, p=p):
            def body(i, h):
                v = jnp.dot(h, sW, precision=p,
                            preferred_element_type=jnp.float32)
                return jnp.tanh(v[:, :H] + h * 1e-6)

            return jnp.sum(lax.fori_loop(0, n, body, h))

        np.asarray(serial(h0, 1))

        def run(n):
            best = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(serial(h0, n))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = run(T), run(4 * T)
        per_step = (t_hi - t_lo) / (3 * T)
        RESULTS[lbl] = {"step_us": per_step * 1e6}
        print(f"{lbl:34s} {per_step*1e6:7.3f} us/step (matmul only)", flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "docs", "PROFILE_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
