"""Round-3 session-5 probe: dual-chain interleaved recurrence.

The fused LSTM step serialises MXU work (3-pass bf16x3 step matmul +
the amortised block affine) with VPU work (5 gate transcendentals) on
the same dependence chain, so each unit idles while the other runs
(docs/PROFILE_r3.json decomposition: matmul ~1.9 us of the HIGHEST
step, gates ~1.1 us).  Two INDEPENDENT chains interleaved in one
kernel give the Mosaic scheduler data-parallel slack: chain B's step
matmul can issue while chain A's gates occupy the VPU.

Variants, all slope-timed (N chained layer applications inside one
jitted fori_loop; per-dispatch tunnel cost cancels):

  single B=128   production kernel, per-row-step throughput baseline
  single B=256   same kernel, doubled batch (MXU passes get fuller,
                 but MXU and VPU still strictly alternate)
  dual   B=256   two interleaved 128-row chains (the experiment)
  dual   B=128   two 64-row chains (MXU rows half-wasted; measures
                 whether overlap beats occupancy)

Usage:  python tools/probe_dual_r3.py
Writes docs/PROBE_dual_r3.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

T, H = 2560, 256
RESULTS: dict = {"T": T, "H": H}


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from flappie_tpu.ops import precision as prec
    from flappie_tpu.ops import rnn_pallas as rp

    GH = 4 * H
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    iW = jax.random.normal(k2, (H, GH), jnp.float32) * 0.05
    b = jax.random.normal(k3, (GH,), jnp.float32) * 0.05
    sW = jax.random.normal(k4, (H, GH), jnp.float32) * 0.05
    iW, b, sW = (jax.block_until_ready(a) for a in (iW, b, sW))

    # -- chip context ---------------------------------------------------
    M = 2048 if jax.default_backend() == "tpu" else 256
    a = jax.block_until_ready(jax.random.normal(k1, (M, M), jnp.float32))

    @jax.jit
    def mxu(a, n):
        def body(i, x):
            return jnp.dot(x, x, precision=lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32) * 1e-3
        return jnp.sum(lax.fori_loop(0, n, body, a))

    np.asarray(mxu(a, 1))
    t0 = time.perf_counter(); np.asarray(mxu(a, 10)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(mxu(a, 110)); t_hi = time.perf_counter() - t0
    RESULTS["mxu_idle_tflops"] = 2 * M**3 / ((t_hi - t_lo) / 100) / 1e12
    print(f"mxu probe: {RESULTS['mxu_idle_tflops']:.0f} TFLOP/s bf16", flush=True)

    def measure(label, layer_fn, B, n_lo=2, n_hi=12):
        x0 = jax.block_until_ready(
            jax.random.normal(k1, (T, B, H), jnp.float32))

        @jax.jit
        def prog(x, n):
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
        # throughput metric: batch-rows * steps per second
        rows_per_s = B * T / per_layer
        RESULTS[label] = {
            "B": B,
            "layer_ms": per_layer * 1e3,
            "step_us": per_step * 1e6,
            "Mrowsteps_per_s": rows_per_s / 1e6,
            "compile_s": t_compile,
        }
        print(f"{label:30s} B={B:4d} {per_layer*1e3:8.2f} ms/layer  "
              f"{per_step*1e6:7.3f} us/step  {rows_per_s/1e6:8.1f} Mrow-steps/s"
              f"  (compile {t_compile:.0f}s)", flush=True)

    def prod(x):
        prec.set_rnn_precision("high")
        try:
            return rp.lstm_layer_tm(x, iW, b, sW)
        finally:
            prec.set_rnn_precision("highest")

    # -- dual-chain kernel ----------------------------------------------
    def _lstm_dual_kernel(ffprec, rnnprec, x_ref, iw_ref, b_ref, sw_ref,
                          out_ref, h_ref, c_ref, xa_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        Hh = h_ref.shape[-1]
        B2 = h_ref.shape[1]  # rows per chain; h_ref is [2, B2, H]
        K, Bb, IN = x_ref.shape
        sw = sw_ref[:]
        rdot = rp._make_rdot(rnnprec, sw)
        xa_ref[:] = (
            rp._ff_dot(x_ref[:].reshape(K * Bb, IN), iw_ref[:], ffprec)
            + b_ref[:]
        ).reshape(K, Bb, 4 * Hh).astype(xa_ref.dtype)

        def gates(xF, c):
            u = jax.nn.sigmoid(xF[:, :Hh])
            f = jax.nn.sigmoid(xF[:, Hh:2 * Hh])
            g = jnp.tanh(xF[:, 2 * Hh:3 * Hh])
            o = jax.nn.sigmoid(xF[:, 3 * Hh:])
            c2 = f * c + u * g
            return o * jnp.tanh(c2), c2

        def step(k, carry):
            hA, cA, hB, cB = carry
            # both step matmuls issue before either chain's gate math;
            # the chains are independent, so the scheduler may overlap
            # chain B's MXU passes with chain A's VPU gates
            vA = rdot(hA)
            vB = rdot(hB)
            hA, cA = gates(xa_ref[k, :B2].astype(jnp.float32) + vA, cA)
            hB, cB = gates(xa_ref[k, B2:].astype(jnp.float32) + vB, cB)
            out_ref[k, :B2] = hA
            out_ref[k, B2:] = hB
            return hA, cA, hB, cB

        hA, cA, hB, cB = lax.fori_loop(
            0, K, step,
            (h_ref[0], c_ref[0], h_ref[1], c_ref[1]), unroll=True)
        h_ref[0], c_ref[0] = hA, cA
        h_ref[1], c_ref[1] = hB, cB

    def dual(x):
        Tt, Bb, IN = x.shape
        B2 = Bb // 2
        ffprec = rp._resolve_ffprec(lax.Precision.HIGH, jax.default_backend())
        K = rp._fused_time_block(Bb, IN, GH, H, 4, h3_affine=True)
        Tpad = -(-Tt // K) * K
        xp = jnp.pad(x, ((0, Tpad - Tt), (0, 0), (0, 0))) if Tpad != Tt else x
        out = pl.pallas_call(
            functools.partial(_lstm_dual_kernel, ffprec, "high3"),
            grid=(Tpad // K,),
            in_specs=[
                pl.BlockSpec((K, Bb, IN), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IN, GH), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GH,), lambda t: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, GH), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, Bb, H), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tpad, Bb, H), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, B2, H), jnp.float32),
                pltpu.VMEM((2, B2, H), jnp.float32),
                pltpu.VMEM((K, Bb, GH), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(xp, iW, b, sW)
        return out[:Tt]

    # correctness first: dual == production kernel on the same data
    xs = jax.random.normal(k1, (64, 256, H), jnp.float32)
    prec.set_rnn_precision("high")
    try:
        ref = rp.lstm_layer_tm(xs, iW, b, sW)
    finally:
        prec.set_rnn_precision("highest")
    got = dual(xs)
    eq = bool(jnp.array_equal(ref, got))
    RESULTS["dual_bitexact_vs_prod"] = eq
    print(f"dual kernel bit-exact vs production kernel: {eq}", flush=True)

    measure("single-chain prod B=128", prod, 128)
    measure("single-chain prod B=256", prod, 256)
    measure("dual-chain B=256", dual, 256)
    measure("dual-chain B=128", dual, 128)

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROBE_dual_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
