"""Matmul precision policy for the feed-forward compute path.

On TPU, float32 matmuls are emulated on the bf16 MXU: Precision.HIGHEST
uses 6 passes (full f32), Precision.HIGH uses 3 (~21-bit mantissa),
Precision.DEFAULT one bf16 pass.  The *recurrent* step matmul always
runs HIGHEST - its rounding error compounds over tens of thousands of
sequential steps.  The feed-forward matmuls (convolutions, per-layer
input affines, the output head) do not compound, and measured against
the reference C pipeline their HIGH-precision error (~1e-4 on
transition weights) is the same order as the TPU's transcendental ulp
envelope, at roughly half the MXU passes.

Measured against the C-oracle transition weights (r941 graph, real
signal): CPU 5.2e-6, TPU highest 3.9e-4, TPU high 5.4e-4, TPU default
6.7e-2.  Default: HIGH - the same error order as the unavoidable TPU
transcendental envelope, at half the MXU passes.  Set
FLAPPIE_TPU_MATMUL_PRECISION=highest (or call set_ff_precision) for the
bit-strictest TPU mode.  CPU ignores precision entirely (always true
f32), so the parity suite is unaffected by this knob.
"""

from __future__ import annotations

import os

from jax import lax

_LEVELS = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}

_ff_precision = _LEVELS[
    os.environ.get("FLAPPIE_TPU_MATMUL_PRECISION", "high").lower()
]


def ff_precision() -> lax.Precision:
    """Precision for feed-forward (non-recurrent) matmuls."""
    return _ff_precision


def set_ff_precision(level: str) -> None:
    global _ff_precision
    _ff_precision = _LEVELS[level.lower()]


_env_rnn = os.environ.get("FLAPPIE_TPU_RNN_PRECISION", "").lower()
_rnn_precision = _LEVELS[_env_rnn] if _env_rnn else None


def rnn_precision() -> lax.Precision:
    """Precision for the recurrent step matmul inside the Pallas
    kernels.

    Default is backend-dependent.  On TPU: HIGH, which the kernels
    lower as a manual 3-pass bf16 emulation (~2^-21 mantissa,
    rnn_pallas._dot_bf16x3) -- measured byte-identical sequences AND
    qualities against the C-oracle goldens on every fixture case
    (r941 H=256, the converter-chain checkpoint, 5mC) while cutting
    the full chunk program 67.2 -> 56.0 ms at [128, 12800]
    (docs/PROBE_rnnprec_r3.json).  Elsewhere: HIGHEST, i.e. true f32
    -- the manual bf16x3 split would otherwise execute for real on
    CPU and perturb the byte-parity suite, and only TPU pays MXU
    passes for f32 anyway.

    FLAPPIE_TPU_RNN_PRECISION=highest selects the bit-strictest
    6-pass mode on TPU; =default selects one bf16 pass per step:
    measured ~4e-2 on transition weights (the LSTM forget gate bounds
    the drift but it is far outside the reference-parity band) - an
    explicitly opt-in speed mode (`--fast` pairs it with bf16
    streaming)."""
    if _rnn_precision is not None:
        return _rnn_precision
    import jax

    return (lax.Precision.HIGH if jax.default_backend() == "tpu"
            else lax.Precision.HIGHEST)


def set_rnn_precision(level: str) -> None:
    global _rnn_precision
    _rnn_precision = _LEVELS[level.lower()]
