"""Accuracy band of --fast (bf16-stream recurrence) on the real chip.

Basecalls the bundled real-signal fixture with the H=256 parity weights
through the production chunked path twice -- exact (f32 stream) and
--fast (FLAPPIE_TPU_RNN_STREAM=bf16) -- in separate processes (the
stream policy binds at trace time), then reports alignment identity of
each against the committed reference-oracle golden and of fast vs
exact.  Writes docs/ACCURACY_fast_r3.json.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/fast_mode_accuracy.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "tests", "goldens")


def _call_once(stream: str) -> dict:
    """Run one basecall of the fixture in a fresh process; returns
    {case: {seq, qual, score}}."""
    code = r"""
import json, os, sys
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
for case in ("ff_fb_fastq_h256",):
    o = man["cases"][case]
    cfg = _shrink(o["model"], o["hid"])
    params = parity_params(o["model"], o["hid"])
    bc = Basecaller(cfg, params=params)  # production chunked path
    rt = RawTable("x", raw.size, 0, raw.size, raw.copy())
    res = bc.basecall_read(rt)
    out[case] = {"seq": res.basecall, "qual": res.quality,
                 "score": res.score}
print("RESULT::" + json.dumps(out))
""" % {"repo": REPO, "goldens": GOLDENS}
    env = dict(os.environ)
    env["FLAPPIE_TPU_RNN_STREAM"] = stream
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT::")][-1]
    return json.loads(line[len("RESULT::"):])


def main() -> int:
    sys.path.insert(0, REPO)
    from flappie_tpu.accuracy import align_identity

    man = json.load(open(os.path.join(GOLDENS, "manifest.json")))
    exact = _call_once("f32")
    fast = _call_once("bf16")

    results = {}
    for case in exact:
        truth = open(os.path.join(
            GOLDENS, man["cases"][case]["output"])).read().splitlines()[1]
        for tag, calls in (("exact", exact), ("fast", fast)):
            a = align_identity(calls[case]["seq"], truth)
            results[f"{case}/{tag}_vs_oracle"] = {
                "identity_pct": 100 * a.identity,
                "mismatches": a.mismatches,
                "indels": a.insertions + a.deletions,
                "score": calls[case]["score"],
            }
        a = align_identity(fast[case]["seq"], exact[case]["seq"])
        qd = 0
        if fast[case]["qual"] and len(fast[case]["qual"]) == len(exact[case]["qual"]):
            qd = max(abs(ord(x) - ord(y)) for x, y in
                     zip(fast[case]["qual"], exact[case]["qual"]))
        results[f"{case}/fast_vs_exact"] = {
            "identity_pct": 100 * a.identity,
            "mismatches": a.mismatches,
            "indels": a.insertions + a.deletions,
            "qual_max_absdiff_when_aligned": qd,
        }
    for k, v in results.items():
        print(f"{k}: identity {v['identity_pct']:.3f}%")
    out = os.path.join(REPO, "docs", "ACCURACY_fast_r3.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
