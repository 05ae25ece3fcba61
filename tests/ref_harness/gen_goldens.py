"""Generate reference-parity goldens by running the oracle binary.

Usage (from the repo root):

    sh tests/ref_harness/build_oracle.sh
    python -m tests.ref_harness.gen_goldens

Writes tests/goldens/: per case the oracle's exact stdout plus, for
representative cases, the transition-weight and trace dumps used by the
strict decode-parity tests.  The oracle is the reference's own C
pipeline compiled with synthetic weights (see build_oracle.sh); the
committed goldens let `pytest` enforce parity without a C compiler.
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

import numpy as np

ORACLE = "/tmp/flappie_oracle/oracle"
# Production-width oracle (build with FLAPPIE_TPU_PARITY_HID=256
# FLAPPIE_ORACLE_DIR=/tmp/flappie_oracle_h256 sh tests/ref_harness/build_oracle.sh)
ORACLE_H256 = "/tmp/flappie_oracle_h256/oracle"
# Converter-chain oracle: r941 weights flow torch checkpoint ->
# weights/taiyaki.py -> header_emit (build with FLAPPIE_TPU_PARITY_CKPT=1
# FLAPPIE_ORACLE_DIR=/tmp/flappie_oracle_ckpt sh tests/ref_harness/build_oracle.sh)
ORACLE_CKPT = "/tmp/flappie_oracle_ckpt/oracle"
GOLDENS = os.path.join(os.path.dirname(__file__), "..", "goldens")
RAW_CRP = "/root/reference/src/test/raw_signal.crp"

UUID = "0f776a08-0000-4000-8000-000000000001"

# case name -> oracle/our-pipeline options
CASES = {
    "ff_fb_fastq": dict(model="r941_native", format="fastq", dump=True),
    "ff_vit_fasta": dict(model="r941_native", format="fasta", viterbi=True),
    "ff_fb_sam": dict(model="r941_native", format="sam"),
    "ff_temp": dict(model="r941_native", format="fastq", temperature=0.85),
    "rna_delta": dict(model="r941_rna002", format="fastq", delta=1.0, reverse=True),
    "mc5_fb": dict(model="r941_5mC", format="fastq", dump=True),
    "r103_fb": dict(model="r103_native", format="fastq"),
    "rle_fb": dict(model="rle_r941_native", format="run", dump=True),
    "rle_vit": dict(model="rle_r941_native", format="run", viterbi=True),
    # non-default preprocessing flags exercise trim/segmentation parity
    "ff_trim": dict(model="r941_native", format="fastq",
                    trim=(60, 25), segmentation=(150, 0.1)),
    "mc5_vit_sam": dict(model="r941_5mC", format="sam", viterbi=True),
    # production width: float error compounds through 2x more matmul
    # depth than H=64; this case certifies the parity bands at H=256
    "ff_fb_fastq_h256": dict(model="r941_native", format="fastq",
                             dump=True, hid=256),
    # real-weights loop: H=256 weights that flowed through the torch
    # checkpoint -> taiyaki converter -> header emit chain on the
    # oracle side, and checkpoint -> converter -> Basecaller on ours
    "ff_ckpt_fastq": dict(model="r941_native", format="fastq",
                          dump=True, hid=256, ckpt=True),
}

NSAMPLE = 12000
READNAME = "sig12k"


def load_dump(path: str, dtype=np.float32) -> np.ndarray:
    with open(path, "rb") as f:
        nr, nc = np.fromfile(f, np.int32, 2)
        return np.fromfile(f, dtype).reshape(nc, nr)  # [ncol, nrow]


def main() -> None:
    from flappie_tpu.io.crp import read_crp

    os.makedirs(GOLDENS, exist_ok=True)
    adc = read_crp(RAW_CRP).reshape(-1).astype(np.float32)[:NSAMPLE]

    with tempfile.TemporaryDirectory() as td:
        sig = os.path.join(td, "sig.f32")
        adc.tofile(sig)

        manifest = {"uuid": UUID, "readname": READNAME, "nsample": NSAMPLE,
                    "cases": {}}
        for case, opts in CASES.items():
            if opts.get("ckpt"):
                oracle = ORACLE_CKPT
            elif opts.get("hid") == 256:
                oracle = ORACLE_H256
            else:
                oracle = ORACLE
            cmd = [oracle, "--signal", sig, "--uuid", UUID,
                   "--readname", READNAME, "--model", opts["model"]]
            if opts["format"] != "run":
                cmd += ["--format", opts["format"]]
            if opts.get("viterbi"):
                cmd += ["--viterbi"]
            if opts.get("temperature"):
                cmd += ["--temperature", str(opts["temperature"])]
            if opts.get("delta"):
                cmd += ["--delta", str(opts["delta"])]
            if opts.get("reverse"):
                cmd += ["--reverse"]
            if opts.get("trim"):
                cmd += ["--trim-start", str(opts["trim"][0]),
                        "--trim-end", str(opts["trim"][1])]
            if opts.get("segmentation"):
                cmd += ["--varseg-chunk", str(opts["segmentation"][0]),
                        "--varseg-thresh", str(opts["segmentation"][1])]
            dumps = {}
            if opts.get("dump"):
                dumps["trans"] = os.path.join(td, f"{case}.trans.bin")
                cmd += ["--dump-trans", dumps["trans"]]
                if opts["format"] not in ("run",):
                    dumps["trace"] = os.path.join(td, f"{case}.trace.bin")
                    cmd += ["--dump-trace", dumps["trace"]]

            out = subprocess.run(cmd, capture_output=True, check=True)
            ext = "run" if opts["format"] == "run" else opts["format"]
            with open(os.path.join(GOLDENS, f"{case}.{ext}"), "wb") as fh:
                fh.write(out.stdout)

            arrays = {}
            if "trans" in dumps:
                arrays["trans"] = load_dump(dumps["trans"])
            if "trace" in dumps:
                arrays["trace"] = load_dump(dumps["trace"], np.int32).astype(np.uint8)
            if arrays:
                np.savez_compressed(os.path.join(GOLDENS, f"{case}.npz"), **arrays)

            manifest["cases"][case] = {**opts, "output": f"{case}.{ext}",
                                       "arrays": f"{case}.npz" if arrays else None}
            print(f"{case}: {len(out.stdout)} bytes"
                  + (f", arrays {sorted(arrays)}" if arrays else ""))

        with open(os.path.join(GOLDENS, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
