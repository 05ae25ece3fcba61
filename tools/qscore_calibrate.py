"""Fit an empirical quality-score calibration (slope, offset) pair.

The reference's qualities are explicitly uncalibrated (its
README.md:231-234); this tool measures the predicted-vs-empirical
phred relation on known-truth reads and fits the linear remap the
flappie CLI applies with ``--qcal slope:offset``.

Truth comes from the synthetic-teacher machinery (train/data.py): the
teacher's own Viterbi path is the truth; its fb-decode basecalls of
the same signals carry genuinely variable per-base correctness, so the
calibration curve is non-trivial.  Real deployments substitute
reference-aligned reads: anything that yields (quality string,
per-base correctness) pairs feeds the same fit.

Writes docs/QCAL_r3.json and prints the fit + before/after
count-weighted mean |q_emp - q_pred| in phred units.

    python tools/qscore_calibrate.py [--student ckpt.npz] [--reads N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASES = "ACGTZ"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--student", default=None, metavar="npz",
                    help="Calibrate this checkpoint instead of the teacher")
    ap.add_argument("--reads", type=int, default=12)
    ap.add_argument("--read-len", type=int, default=6000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "QCAL_r3.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flappie_tpu import native
    from flappie_tpu.accuracy import align_call_status, align_identity
    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.models.network import transitions
    from flappie_tpu.models.params import init_synthetic, load_npz
    from flappie_tpu.ops.crf import crf_viterbi
    from flappie_tpu.qcal import (
        apply_calibration,
        calibration_error,
        calibration_table,
        fit_calibration,
        phred_from_qstring,
    )
    from flappie_tpu.signal.preprocess import RawTable
    from flappie_tpu.train.data import path_to_bases
    from tests.ref_harness.parity_models import _shrink

    cfg = _shrink("r941_native", 64)
    teacher = init_synthetic(cfg, seed=1234)
    rng = np.random.default_rng(11)
    signals = rng.normal(size=(args.reads, args.read_len)).astype(np.float32)

    # teacher Viterbi truth over the Basecaller's own preprocessing.
    # Keep the ORIGINAL read index of every surviving row: calls are
    # per input read, and any preprocess drop would otherwise shift
    # every later call onto the wrong truth.
    tables = [RawTable(f"r{i}", s.size, 0, s.size, s.copy())
              for i, s in enumerate(signals)]
    pre = native.preprocess_batch(tables)
    kept = [i for i, rt in enumerate(pre) if rt is not None]
    segs = [pre[i].active() for i in kept]
    L = max(s.size for s in segs)
    buf = np.zeros((len(segs), L), np.float32)
    for i, s in enumerate(segs):
        buf[i, : s.size] = s
    lengths = jnp.asarray([s.size for s in segs], jnp.int32)
    trans, nblocks = transitions(
        jax.tree.map(jnp.asarray, teacher), cfg, jnp.asarray(buf), lengths,
        rnn_impl="scan",
    )
    _, path, _ = crf_viterbi(trans, nblocks, cfg.nbase)
    path, nblocks = np.asarray(path), np.asarray(nblocks)
    truth_by_read = {
        kept[j]: "".join(BASES[i] for i in
                         path_to_bases(path[j], int(nblocks[j]), cfg.nbase))
        for j in range(len(segs))
    }

    params = load_npz(args.student) if args.student else teacher
    bc = Basecaller(cfg, params=params, chunk=0, viterbi_only=False)
    calls = bc.basecall_raw_tables(
        [RawTable(f"r{i}", s.size, 0, s.size, s.copy())
         for i, s in enumerate(signals)]
    )

    quals, correct, idents = [], [], []
    for i, res in enumerate(calls):
        truth = truth_by_read.get(i)
        if res is None or truth is None or not res.quality:
            continue
        quals.append(phred_from_qstring(res.quality))
        correct.append(align_call_status(res.basecall, truth))
        idents.append(align_identity(res.basecall, truth).identity)
    quals = np.concatenate(quals)
    correct = np.concatenate(correct)

    table = calibration_table(quals, correct)
    a, b = fit_calibration(table)
    err_raw = calibration_error(table)  # vs the identity map
    err_fit = calibration_error(table, a, b)

    # the remap is monotone and stays in the legal char range
    sample_q = "".join(chr(q + 33) for q in range(0, 41))
    remapped = phred_from_qstring(apply_calibration(sample_q, a, b))
    assert np.all(np.diff(remapped) >= 0) if a >= 0 else True
    assert remapped.min() >= 0 and remapped.max() <= 93

    out = {
        "truth": "synthetic-teacher Viterbi path (train/data.py machinery)",
        "model": args.student or "teacher (synthetic, H=64)",
        "reads": len(idents),
        "bases": int(quals.size),
        "mean_identity_pct": round(100 * float(np.mean(idents)), 3),
        "table": table.as_dict(),
        "fit": {"slope": round(a, 4), "offset": round(b, 4)},
        "weighted_mean_abs_phred_error": {
            "raw": round(err_raw, 3),
            "calibrated": round(err_fit, 3),
        },
        "cli": f"flappie --qcal {a:.3f}:{b:.3f} ...",
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"fit: q' = {a:.3f}*q + {b:.3f} over {quals.size} bases "
          f"({len(idents)} reads)")
    print(f"weighted mean |q_emp - q_pred|: raw {err_raw:.2f} -> "
          f"calibrated {err_fit:.2f} phred")
    print(f"wrote {os.path.normpath(args.out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
