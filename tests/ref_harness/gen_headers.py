"""Generate reference-format C weight headers for the oracle build.

Usage: python -m tests.ref_harness.gen_headers <dest_models_dir>

Writes the five headers networks.c includes (src/networks.c:10-14) with
synthetic weights from parity_models (same float32 values the parity
tests use on the JAX side).
"""

from __future__ import annotations

import os
import sys

from flappie_tpu.weights import emit_model_header

from .parity_models import PARITY_MODELS, parity_params


def main(dest: str) -> None:
    # FLAPPIE_TPU_PARITY_CKPT=1: the r941 header's weights come from the
    # full taiyaki-style torch checkpoint via the production converter
    # (torch_ckpt.converted_params) instead of init_synthetic — the
    # real-weights-loop oracle build.
    use_ckpt = os.environ.get("FLAPPIE_TPU_PARITY_CKPT") == "1"
    os.makedirs(dest, exist_ok=True)
    for name, (cfg, fname, stem, modelid) in PARITY_MODELS.items():
        if use_ckpt and name == "r941_native":
            from .torch_ckpt import converted_params

            cfg, params = converted_params()
        else:
            params = parity_params(name)
        text = emit_model_header(cfg, params, modelid=modelid, stem=stem)
        with open(os.path.join(dest, fname), "w") as fh:
            fh.write(text)
        print(f"wrote {fname} ({len(text)//1024} KiB)")


if __name__ == "__main__":
    main(sys.argv[1])
