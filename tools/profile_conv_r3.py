"""Round-3 conv-stack decomposition on the real chip.

The conv stack eats ~45 ms of the 137 ms chunk-batch device budget for
~2% of the FLOPs (VERDICT r2 weak #2).  This times, with the same
tunnel-safe slope protocol as profile_rnn_r3.py, each stage of the
channels-major fast path and candidate XLA-level fixes, so the fused
Pallas rebuild targets the real hot spot.

    python tools/profile_conv_r3.py [B] [T]
Writes docs/PROFILE_conv_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = int(sys.argv[2]) if len(sys.argv) > 2 else 12800

RESULTS: dict = {"B": B, "T": T}


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.params import init_synthetic

    cfg = get_model_config("r941_native")
    params = jax.tree.map(jnp.asarray, init_synthetic(cfg, seed=0))
    key = jax.random.PRNGKey(0)
    sig = jax.block_until_ready(jax.random.normal(key, (B, T), jnp.float32))
    lengths = jnp.full((B,), T, jnp.int32)

    def measure(label, fn, x0, n_lo=2, n_hi=10):
        """fn must map x -> array; iterated via a scalar carry so the
        loop cannot collapse (output folded to one scalar per iter)."""

        @jax.jit
        def prog(x, n):
            def body(i, acc):
                y = fn(x * (1.0 + acc * 1e-30))
                return jnp.sum(y) * 1e-30

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

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

        per = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
        RESULTS[label] = {"ms": per * 1e3, "compile_s": t_compile}
        print(f"{label:42s} {per*1e3:8.2f} ms  (compile {t_compile:.0f}s)",
              flush=True)
        return per

    W0, b0 = params["conv0"]["W"], params["conv0"]["b"]
    W1, b1 = params["conv1"]["W"], params["conv1"]["b"]
    W2, b2 = params["conv2"]["W"], params["conv2"]["b"]

    from flappie_tpu.models.network import conv_stack
    from flappie_tpu.ops.conv import conv1d_same_ct, conv1d_strided_ct
    from flappie_tpu.ops.activations import ACTIVATIONS

    swish = ACTIVATIONS["swish"]

    # full fast stack (what production runs)
    os.environ["FLAPPIE_TPU_CONV_IMPL"] = "fast"
    measure("stack fast (prod)",
            lambda s: conv_stack(params, cfg, s[..., None], lengths)[0], sig)
    os.environ["FLAPPIE_TPU_CONV_IMPL"] = "xla"
    measure("stack xla",
            lambda s: conv_stack(params, cfg, s[..., None], lengths)[0], sig)
    os.environ["FLAPPIE_TPU_CONV_IMPL"] = "fast"

    # stage pieces of the fast path
    def c1(s):
        return swish(conv1d_same_ct(s[:, None, :], W0, b0))

    def c12(s):
        return swish(conv1d_same_ct(c1(s), W1, b1))

    measure("conv1 only (1->4, ct)", c1, sig)
    measure("conv1+2 (->16, ct)", c12, sig)
    measure("conv3 strided im2col (16->256)",
            lambda s: conv1d_strided_ct(c12(s), W2, b2, 5, lengths), sig)

    y2 = jax.block_until_ready(c12(sig))  # [B, 16, T]

    measure("conv3 alone (from y2)",
            lambda y: conv1d_strided_ct(y, W2, b2, 5, lengths), y2)

    # conv3 variants from y2
    winlen, Cin, Cout = W2.shape
    stride = 5
    padL, padR = 9, 9
    Tout = -(-T // stride)

    def im2col_tbo(y):
        xp = jnp.pad(y, ((0, 0), (0, 0), (padL, padR + (stride * Tout - T) + stride)))
        cols = jnp.stack([
            lax.slice(xp, (0, 0, k), (B, Cin, k + stride * Tout), (1, 1, stride))
            for k in range(winlen)
        ])  # [w, B, C, T']
        return jnp.einsum("kbct,kco->tbo", cols, W2,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32) + b2

    measure("conv3 einsum out time-major (tbo)", im2col_tbo, y2)

    def im2col_tbo_bf16(y):
        xp = jnp.pad(y, ((0, 0), (0, 0), (padL, padR + (stride * Tout - T) + stride)))
        cols = jnp.stack([
            lax.slice(xp, (0, 0, k), (B, Cin, k + stride * Tout), (1, 1, stride))
            for k in range(winlen)
        ]).astype(jnp.bfloat16)
        return jnp.einsum("kbct,kco->tbo", cols, W2.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) + b2

    measure("conv3 einsum tbo bf16", im2col_tbo_bf16, y2)

    def xla_conv3(y):
        # native XLA strided conv from NWC
        x = jnp.swapaxes(y, 1, 2)
        return lax.conv_general_dilated(
            x, W2, window_strides=(stride,), padding=[(padL, padR)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) + b2

    measure("conv3 lax.conv NWC", xla_conv3, y2)

    # the transpose the rnn stack pays today ([B,T',C] -> [T',B,C])
    y3 = jax.block_until_ready(
        conv1d_strided_ct(y2, W2, b2, 5, lengths))

    measure("transpose [B,T',C]->[T',B,C]",
            lambda y: jnp.swapaxes(y, 0, 1), y3)

    # Pallas fused conv stack, if built
    try:
        from flappie_tpu.ops.conv_pallas import conv_stack_fused_tm

        for dt in ("f32", "bf16"):
            os.environ["FLAPPIE_TPU_CONV_STREAM"] = dt
            measure(f"pallas fused stack tm out ({dt})",
                    lambda s: conv_stack_fused_tm(
                        s, W0, b0, W1, b1, W2, b2, lengths), sig)
        os.environ.pop("FLAPPIE_TPU_CONV_STREAM", None)
    except ImportError:
        pass

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROFILE_conv_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
