"""Does a 3-pass bf16 recurrent step matmul keep byte parity on chip?

The fused recurrence's step matmul defaults to Precision.HIGHEST (6 bf16
MXU passes = full f32).  PROFILE_r3.json measured the 'high3' tier
(bf16x3 emulation, ~2^-21 mantissa) at 3.73 vs 4.56 us/layer-step --
an ~18% step cut if its rounding never flips an output byte.  This
probe basecalls fixture cases through the production chunked path on
the real chip under each tier (fresh process each -- the policy binds
at trace time), byte-compares sequence/quality against the committed
C-oracle goldens, and times the chunk-batch program at bench geometry.

Writes docs/PROBE_rnnprec_r3.json.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_rnnprec_r3.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "tests", "goldens")

CASES = ("ff_fb_fastq_h256", "ff_ckpt_fastq", "mc5_fb")


def _run_tier(tier: str) -> dict:
    code = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
from flappie_tpu.basecall import Basecaller
from flappie_tpu.signal.preprocess import RawTable
from flappie_tpu.io.crp import read_crp
from tests.ref_harness.parity_models import _shrink, parity_params

man = json.load(open(os.path.join(%(goldens)r, "manifest.json")))
adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
adc = adc.astype(np.float32)[: man["nsample"]]
raw = ((adc + np.float32(16.0)) * (np.float32(1373.41) / np.float32(8192.0))).astype(np.float32)
out = {}
for case in %(cases)r:
    o = man["cases"][case]
    if o.get("ckpt"):
        from tests.ref_harness.torch_ckpt import converted_params
        cfg, params = converted_params()
    else:
        from tests.ref_harness.parity_models import PARITY_MODELS
        hid = o.get("hid")
        cfg = _shrink(o["model"], hid) if hid else PARITY_MODELS[o["model"]][0]
        params = parity_params(o["model"], hid)
    bc = Basecaller(cfg, params=params)
    rt = RawTable("x", raw.size, 0, raw.size, raw.copy())
    res = bc.basecall_read(rt)
    out[case] = {"seq": res.basecall, "qual": res.quality}

# chunk-program timing at bench geometry (r941 H=256)
cfg = _shrink("r941_native", 256)
params = parity_params("r941_native", 256)
bc = Basecaller(cfg, params=params, chunk=12800, overlap=1600,
                chunk_batch=128)
sig = np.tile(raw, 2)[:12800]
s = np.tile(sig, (128, 1)).astype(np.float32)
ln = np.full(128, 12800, np.int32)
q = np.zeros(128, np.int32)
buf = Basecaller.pack_chunk_inputs(s, ln, q, q)
_ = np.asarray(bc.dispatch_packed_chunk(buf))
import jax
ts = []
for _i in range(5):
    t0 = time.perf_counter()
    r = bc.dispatch_packed_chunk(buf)
    jax.block_until_ready(r) if hasattr(r, "block_until_ready") else np.asarray(r)
    ts.append(time.perf_counter() - t0)
out["_dispatch_ms"] = round(min(ts) * 1e3, 2)
print("RESULT::" + json.dumps(out))
""" % {"repo": REPO, "goldens": GOLDENS, "cases": CASES}
    env = dict(os.environ)
    env["FLAPPIE_TPU_RNN_PRECISION"] = tier
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-4000:])
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("RESULT::")][-1]
    return json.loads(line[len("RESULT::"):])


def main() -> int:
    man = json.load(open(os.path.join(GOLDENS, "manifest.json")))
    tiers = {t: _run_tier(t) for t in ("highest", "high")}
    results = {}
    for tier, calls in tiers.items():
        results[f"dispatch_ms/{tier}"] = calls["_dispatch_ms"]
        for case in CASES:
            lines = open(os.path.join(
                GOLDENS, man["cases"][case]["output"])).read().splitlines()
            gseq, gqual = lines[1], (lines[3] if len(lines) > 3 else "")
            c = calls[case]
            results[f"{case}/{tier}"] = {
                "seq_byte_identical": c["seq"] == gseq,
                "qual_byte_identical": c["qual"] == gqual,
                "qual_max_absdiff": (
                    max((abs(ord(x) - ord(y))
                         for x, y in zip(c["qual"], gqual)), default=0)
                    if len(c["qual"]) == len(gqual) else None),
            }
    for k, v in sorted(results.items()):
        print(f"{k}: {v}")
    out = os.path.join(REPO, "docs", "PROBE_rnnprec_r3.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
