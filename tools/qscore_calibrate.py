"""Fit per-model empirical quality-score calibrations (qcal v2).

The reference's qualities are explicitly uncalibrated (its
README.md:231-234); this tool measures the predicted-vs-empirical
phred relation on known-truth reads and fits, PER MODEL,

- the linear remap (slope, offset) the flappie CLI applies with
  ``--qcal slope:offset``, and
- a count-weighted isotonic (PAVA) LUT -- a monotone remap clamped to
  the reference's phred char range -- applied with ``--qcal <file>``.

Fits use a train/held-out read split: the reported phred errors are
measured on reads the fit never saw, so the table is evidence of
generalisation, not memorisation.

Truth comes from the synthetic-teacher machinery (train/data.py): the
teacher's own Viterbi path is the truth; its fb-decode basecalls of
the same signals carry genuinely variable per-base correctness, so the
calibration curve is non-trivial.  Real deployments substitute
reference-aligned reads: anything that yields (quality string,
per-base correctness) pairs feeds the same fit.

Writes docs/QCAL_r4.json ({"models": {name: {"lut": ..., "fit": ...,
"heldout": ...}}}) and prints per-model before/after count-weighted
mean |q_emp - q_pred| in phred units on the held-out split.

    python tools/qscore_calibrate.py [--reads N] [--read-len L]
        [--models r941_native,...] [--student ckpt.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASES = "ACGTZ"
DEFAULT_MODELS = "r941_native,r941_rna002,r941_5mC,r103_native"


def calibrate_model(model: str, n_reads: int, read_len: int,
                    student_ckpt: str | None, seed: int = 11) -> dict:
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
        apply_calibration_lut,
        calibration_error,
        calibration_table,
        fit_calibration,
        fit_isotonic,
        phred_from_qstring,
    )
    from flappie_tpu.signal.preprocess import RawTable
    from flappie_tpu.train.data import path_to_bases
    from tests.ref_harness.parity_models import _shrink

    cfg = _shrink(model, 64)
    # per-model teacher + signal seeds: the three stride-5 flip-flop
    # models share one architecture, so identical seeds would make
    # their calibration experiments literally the same run
    mseed = sum(ord(c) for c in model)
    teacher = init_synthetic(cfg, seed=1234 + mseed)
    rng = np.random.default_rng(seed + mseed)
    signals = rng.normal(size=(n_reads, read_len)).astype(np.float32)

    # teacher Viterbi truth over the Basecaller's own preprocessing;
    # keep ORIGINAL read indices (preprocess drops must not shift rows)
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

    params = load_npz(student_ckpt) if student_ckpt else teacher
    bc = Basecaller(cfg, params=params, chunk=0, viterbi_only=False)
    calls = bc.basecall_raw_tables(
        [RawTable(f"r{i}", s.size, 0, s.size, s.copy())
         for i, s in enumerate(signals)]
    )

    per_read = []  # (quals, correct, identity)
    for i, res in enumerate(calls):
        truth = truth_by_read.get(i)
        if res is None or truth is None or not res.quality:
            continue
        per_read.append((
            phred_from_qstring(res.quality),
            align_call_status(res.basecall, truth),
            align_identity(res.basecall, truth).identity,
        ))

    # held-out split: every 3rd read is evaluation-only
    train = [r for k, r in enumerate(per_read) if k % 3 != 2]
    held = [r for k, r in enumerate(per_read) if k % 3 == 2]
    if not train or not held:
        raise SystemExit(
            f"need at least 3 usable reads for a train/held-out split, "
            f"got {len(per_read)} -- raise --reads"
        )
    tq = np.concatenate([r[0] for r in train])
    tc = np.concatenate([r[1] for r in train])
    hq = np.concatenate([r[0] for r in held])
    hc = np.concatenate([r[1] for r in held])

    t_table = calibration_table(tq, tc)
    a, b = fit_calibration(t_table)
    lut = fit_isotonic(t_table)

    # held-out evaluation: remap the held-out predicted scores with
    # each fit, re-bin against held-out correctness, measure the
    # count-weighted phred error vs the identity line
    def heldout_err(remap) -> float:
        q2 = remap(hq)
        return calibration_error(calibration_table(q2, hc))

    err_raw = heldout_err(lambda q: q)
    err_lin = heldout_err(
        lambda q: np.clip(np.rint(a * q + b), 0, 93).astype(int)
    )
    err_iso = heldout_err(lambda q: lut[np.clip(q, 0, lut.size - 1)])

    # sanity: both remaps stay in the legal char range and isotonic is
    # monotone by construction
    sample_q = "".join(chr(q + 33) for q in range(0, 41))
    for remapped in (
        phred_from_qstring(apply_calibration(sample_q, a, b)),
        phred_from_qstring(apply_calibration_lut(sample_q, lut)),
    ):
        assert remapped.min() >= 0 and remapped.max() <= 93
    assert np.all(np.diff(lut) >= 0)

    return {
        "reads": len(per_read),
        "train_reads": len(train),
        "heldout_reads": len(held),
        "bases": int(tq.size + hq.size),
        "mean_identity_pct": round(
            100 * float(np.mean([r[2] for r in per_read])), 3
        ),
        "table": t_table.as_dict(),
        "fit": {"slope": round(a, 4), "offset": round(b, 4)},
        "lut": lut.tolist(),
        "heldout_weighted_mean_abs_phred_error": {
            "raw": round(err_raw, 3),
            "linear": round(err_lin, 3),
            "isotonic": round(err_iso, 3),
        },
    }


def calibrate_model_fixture(model: str, n_reads: int, read_len: int,
                            student_ckpt: str | None, seed: int = 11) -> dict:
    """qcal v3 regime (round-4 verdict next #4): realistic signal.

    The v2 corpus (iid Gaussian through a shrunk teacher) was
    degenerate -- 31% identity and only 3 distinct predicted phred
    values.  Here reads are tiled REAL fixture ADC: truth is the
    full-width model's Viterbi path over the CLEAN read, calls are its
    production fb-decode basecalls of the same read with per-sample
    ADC jitter (the measurement noise regime a sequencer actually
    presents), optionally from a trained student checkpoint.  Predicted
    phred then spans the realistic range and errors concentrate where
    confidence is low, so the isotonic fit is a calibration, not
    plumbing."""
    import jax
    import jax.numpy as jnp

    from flappie_tpu import native
    from flappie_tpu.accuracy import align_call_status, align_identity
    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.network import transitions
    from flappie_tpu.models.params import init_synthetic, load_npz
    from flappie_tpu.ops.crf import crf_viterbi
    from flappie_tpu.qcal import (
        apply_calibration,
        apply_calibration_lut,
        calibration_error,
        calibration_table,
        fit_calibration,
        fit_isotonic,
        phred_from_qstring,
    )
    from flappie_tpu.signal.preprocess import RawTable
    from flappie_tpu.train.data import path_to_bases

    cfg = get_model_config(model)
    mseed = sum(ord(c) for c in model)
    teacher = init_synthetic(cfg, seed=0)  # the CLI default weights
    rng = np.random.default_rng(seed + mseed)

    adc0 = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc0 = adc0.astype(np.int16)
    offset, ru = np.float32(16.0), np.float32(1373.41) / np.float32(8192.0)

    def table(adc, i):
        return RawTable(
            f"r{i}", adc.size, 0, adc.size,
            (adc.astype(np.float32) + offset) * ru,
            adc=adc, cal=(offset, ru),
        )

    clean_reads, noisy_reads = [], []
    for i in range(n_reads):
        n = int(rng.integers(read_len, read_len + 8000))
        row = np.tile(adc0, int(np.ceil(n / adc0.size)))[:n]
        clean_reads.append(row.copy())
        noisy_reads.append(
            (row + rng.integers(-4, 5, size=n)).astype(np.int16))

    # truth: Viterbi over the CLEAN preprocessed segments (batched)
    pre = native.preprocess_batch([table(r, i)
                                   for i, r in enumerate(clean_reads)])
    kept = [i for i, rt in enumerate(pre) if rt is not None]
    segs = [pre[i].active() for i in kept]
    truth_by_read = {}
    bs = 8
    for ofs in range(0, len(segs), bs):
        part = segs[ofs:ofs + bs]
        L = max(s.size for s in part)
        L += (-L) % cfg.total_stride
        buf = np.zeros((len(part), L), np.float32)
        for j, s in enumerate(part):
            buf[j, : s.size] = s
        lengths = jnp.asarray([s.size for s in part], jnp.int32)
        trans, nblocks = transitions(
            jax.tree.map(jnp.asarray, teacher), cfg, jnp.asarray(buf),
            lengths, rnn_impl="auto")
        _, path, _ = crf_viterbi(trans, nblocks, cfg.nbase)
        path, nblocks = np.asarray(path), np.asarray(nblocks)
        for j in range(len(part)):
            truth_by_read[kept[ofs + j]] = "".join(
                BASES[b] for b in path_to_bases(
                    path[j], int(nblocks[j]), cfg.nbase))

    params = load_npz(student_ckpt) if student_ckpt else teacher
    bc = Basecaller(cfg, params=params)  # chunked: the production config
    calls = bc.basecall_raw_tables(
        [table(r, i) for i, r in enumerate(noisy_reads)])

    per_read = []
    for i, res in enumerate(calls):
        truth = truth_by_read.get(i)
        if res is None or truth is None or not res.quality:
            continue
        per_read.append((
            phred_from_qstring(res.quality),
            align_call_status(res.basecall, truth),
            align_identity(res.basecall, truth).identity,
        ))

    train = [r for k, r in enumerate(per_read) if k % 3 != 2]
    held = [r for k, r in enumerate(per_read) if k % 3 == 2]
    if not train or not held:
        raise SystemExit("need >= 3 usable reads")
    tq = np.concatenate([r[0] for r in train])
    tc = np.concatenate([r[1] for r in train])
    hq = np.concatenate([r[0] for r in held])
    hc = np.concatenate([r[1] for r in held])

    t_table = calibration_table(tq, tc)
    a, b = fit_calibration(t_table)
    lut = fit_isotonic(t_table)

    def heldout_err(remap) -> float:
        return calibration_error(calibration_table(remap(hq), hc))

    err_raw = heldout_err(lambda q: q)
    err_lin = heldout_err(
        lambda q: np.clip(np.rint(a * q + b), 0, 93).astype(int))
    err_iso = heldout_err(lambda q: lut[np.clip(q, 0, lut.size - 1)])

    sample_q = "".join(chr(q + 33) for q in range(0, 41))
    for remapped in (
        phred_from_qstring(apply_calibration(sample_q, a, b)),
        phred_from_qstring(apply_calibration_lut(sample_q, lut)),
    ):
        assert remapped.min() >= 0 and remapped.max() <= 93
    assert np.all(np.diff(lut) >= 0)

    all_q = np.concatenate([tq, hq])
    return {
        "reads": len(per_read),
        "train_reads": len(train),
        "heldout_reads": len(held),
        "bases": int(all_q.size),
        "distinct_predicted_q": int(np.unique(all_q).size),
        "predicted_q_range": [int(all_q.min()), int(all_q.max())],
        "mean_identity_pct": round(
            100 * float(np.mean([r[2] for r in per_read])), 3),
        "table": t_table.as_dict(),
        "fit": {"slope": round(a, 4), "offset": round(b, 4)},
        "lut": lut.tolist(),
        "heldout_weighted_mean_abs_phred_error": {
            "raw": round(err_raw, 3),
            "linear": round(err_lin, 3),
            "isotonic": round(err_iso, 3),
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--student", default=None, metavar="npz",
                    help="Calibrate this checkpoint instead of the teacher; "
                         "a literal '{model}' in the path is substituted "
                         "per model (checkpoints are architecture-specific)")
    ap.add_argument("--reads", type=int, default=48)
    ap.add_argument("--read-len", type=int, default=5000)
    ap.add_argument("--models", default=DEFAULT_MODELS,
                    help="Comma-separated flip-flop models to calibrate")
    ap.add_argument("--regime", choices=("gaussian", "fixture"),
                    default="gaussian",
                    help="gaussian: v2 iid-noise corpus (shrunk teacher); "
                         "fixture: v3 realistic tiled-fixture corpus "
                         "(full-width model, jitter-noise errors)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "QCAL_r4.json"))
    args = ap.parse_args()

    out = {
        "truth": (
            "full-width model Viterbi path on the CLEAN tiled-fixture "
            "read; calls are fb-decode basecalls of the jittered read"
            if args.regime == "fixture"
            else "synthetic-teacher Viterbi path (train/data.py machinery)"
        ),
        "regime": args.regime,
        "student": args.student or (
            "teacher (synthetic, full width)" if args.regime == "fixture"
            else "teacher (synthetic, H=64)"),
        "split": "per-read, every 3rd read held out; errors are held-out",
        "models": {},
    }
    fit = (calibrate_model_fixture if args.regime == "fixture"
           else calibrate_model)
    for model in args.models.split(","):
        model = model.strip()
        student = (args.student.replace("{model}", model)
                   if args.student else None)
        res = fit(model, args.reads, args.read_len, student)
        out["models"][model] = res
        e = res["heldout_weighted_mean_abs_phred_error"]
        print(f"{model}: fit q' = {res['fit']['slope']:.3f}*q + "
              f"{res['fit']['offset']:.3f}; held-out phred error "
              f"raw {e['raw']:.2f} -> linear {e['linear']:.2f} -> "
              f"isotonic {e['isotonic']:.2f} "
              f"({res['reads']} reads, {res['bases']} bases)", flush=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {os.path.normpath(args.out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
