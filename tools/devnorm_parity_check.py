"""Does device-side normalisation change basecalls?  (round-3 probe)

The int16-ADC upload lever halves host->device bytes but moves the
ADC->pA scaling and the (x - med)/mad normalisation onto the TPU, whose
f32 divide is 1-ulp inexact on ~14% of operands (measured this round).
This probe answers the only question that matters: do those 1-ulp signal
perturbations flip any OUTPUT byte (sequence / quality / trace) of the
full basecall on the bundled real-signal fixture?

Method: run the fixture through the exact host pipeline (trim + f32
med-MAD), then again with the normalisation recomputed ON DEVICE from
the int16 ADC window + (offset, raw_unit, med, mad) scalars, and
basecall both signals through the same jitted program.  Compare
elementwise signal ulps and every output byte.

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python tools/devnorm_parity_check.py
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from flappie_tpu.io.crp import read_crp
from flappie_tpu.signal.preprocess import (
    RawTable,
    F32,
    median_f32,
    mad_f32,
    trim_and_segment,
)
from flappie_tpu.basecall import Basecaller


def main():
    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc_i16 = adc.astype(np.int16)
    assert np.array_equal(adc_i16.astype(F32), adc.astype(F32)), "fixture is integral ADC"

    digitisation, offset, rng = F32(8192.0), F32(16.0), F32(1373.41)
    raw_unit = rng / digitisation
    pa = ((adc.astype(F32) + offset) * raw_unit).astype(F32)

    rt = trim_and_segment(RawTable(None, pa.size, 0, pa.size, pa.copy()))
    seg = rt.raw[rt.start : rt.end]
    med = median_f32(seg)
    mad = mad_f32(seg, med)

    # Host-exact normalisation (the current product path).
    host_norm = seg.copy()
    host_norm -= med
    host_norm /= mad

    # Device normalisation from the raw ADC window.
    adc_win = adc_i16[rt.start : rt.end]

    @jax.jit
    def dev_norm(a):
        x = a.astype(jnp.float32)
        x = (x + offset) * raw_unit
        return (x - med) / mad

    dev = np.asarray(dev_norm(jnp.asarray(adc_win)))

    diff_bits = (dev.view(np.int32) - host_norm.view(np.int32))
    ulp_hist = {int(k): int(v) for k, v in zip(*np.unique(diff_bits, return_counts=True))}
    frac_diff = float(np.mean(diff_bits != 0))

    report = {
        "n": int(dev.size),
        "ulp_hist": ulp_hist,
        "frac_elements_differing": frac_diff,
        "backend": jax.devices()[0].platform,
    }

    # Full basecall A/B on the same jitted program.
    bc = Basecaller("r941_native", chunk=0)
    T = host_norm.size
    for tag, sig in (("host", host_norm), ("dev", dev)):
        score, path, qpath, nblocks, trace = bc.call_batch(
            sig[None, :].astype(np.float32), np.array([T], np.int32)
        )
        report[tag] = {
            "score": float(score[0]),
            "path_sha": hash(path.tobytes()),
            "qpath_sum": float(np.nansum(qpath)),
            "trace_sha": hash(trace.tobytes()) if trace is not None else None,
        }
        report.setdefault("_raw", {})[tag] = (path.copy(), qpath.copy(), trace)

    hp, hq, ht = report["_raw"]["host"]
    dp, dq, dt = report["_raw"]["dev"]
    del report["_raw"]
    report["path_bytes_equal"] = bool(np.array_equal(hp, dp))
    qd = np.abs(np.nan_to_num(hq) - np.nan_to_num(dq))
    report["qpath_max_absdiff"] = float(qd.max())
    if ht is not None:
        report["trace_bytes_equal"] = bool(np.array_equal(ht, dt))
        report["trace_max_absdiff"] = int(np.abs(ht.astype(np.int32) - dt.astype(np.int32)).max())

    print(json.dumps(report, indent=1, default=str))


if __name__ == "__main__":
    main()
