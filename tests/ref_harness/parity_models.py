"""Canonical model/weight definitions for reference-oracle parity.

The reference's real weights are git-LFS pointers in this checkout, so
byte-parity is established against the reference's *own C code* compiled
with synthetic weights: the configs below are the reference network
graphs (src/networks.c:450-722) at reduced width so the generated C
weight headers stay small and quick to compile.  Dimensions are derived
at runtime on both sides (the C code reads them from the _Mat statics,
ours from the checkpoint), so width does not change any code path.

Both the header generator (gen_headers.py, used when building the
oracle binary) and the parity tests (tests/test_reference_parity.py)
import these definitions, so the weights on the two sides are the same
float32 values by construction.
"""

from __future__ import annotations

import os
from dataclasses import replace

from flappie_tpu.models.config import MODELS, ConvSpec, ModelConfig
from flappie_tpu.models.params import init_synthetic

SEED = 1234
# Default width 64 keeps the generated C headers small; the H=256
# production-width oracle build (baseline timing + the h256 parity
# golden) sets FLAPPIE_TPU_PARITY_HID=256.
HID = int(os.environ.get("FLAPPIE_TPU_PARITY_HID", "64"))

def _convs5(hid: int):
    return (
        ConvSpec(winlen=5, in_ch=1, out_ch=4, stride=1, activation="swish"),
        ConvSpec(winlen=5, in_ch=4, out_ch=16, stride=1, activation="swish"),
        ConvSpec(winlen=19, in_ch=16, out_ch=hid, stride=5, activation="swish"),
    )


def _shrink(name: str, hid: int | None = None) -> ModelConfig:
    hid = HID if hid is None else hid
    cfg = MODELS[name]
    if len(cfg.convs) == 3:
        convs = _convs5(hid)
    else:  # 5mC single conv
        convs = (replace(cfg.convs[0], out_ch=hid),)
    rnns = tuple(replace(r, size=hid) for r in cfg.rnns)
    return replace(cfg, convs=convs, rnns=rnns)


# model name -> (cfg, header filename, symbol stem, modelid)
PARITY_MODELS = {
    "r941_native": (_shrink("r941_native"), "flipflop5_r941native.h",
                    "rnnrf_flipflop5_r941native", "r941native"),
    "r941_rna002": (_shrink("r941_rna002"), "flipflop5_r941rna002.h",
                    "rnnrf_flipflop5_r941rna002", "r941rna002"),
    "r941_5mC": (_shrink("r941_5mC"), "flipflop_r941native5mC.h",
                 "rnnrf_flipflop_r941native5mC", "r941native5mC"),
    "r103_native": (_shrink("r103_native"), "flipflop5_r103native.h",
                    "rnnrf_flipflop5_r103native", "r103native"),
    "rle_r941_native": (_shrink("rle_r941_native"), "runlength5_r941native.h",
                        "rnnrf_rle5_r941native", "rle5_r941native"),
}


def parity_params(name: str, hid: int | None = None):
    cfg = PARITY_MODELS[name][0] if hid is None else _shrink(name, hid)
    return init_synthetic(cfg, seed=SEED)
