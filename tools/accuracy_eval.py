"""Basecall accuracy harness: alignment identity vs known truth.

Counterpart to the reference's headline metric (RELEASES.md "+1.5%
over Guppy" is alignment identity); the reference repo ships no
harness, so truth here comes from two sources we control exactly:

1. ``fixture``: basecall the bundled real-signal fixture with the
   parity weights and align against the committed reference-oracle
   golden calls (tests/goldens/) — measures end-to-end agreement with
   the reference C pipeline as an identity%, expected ~100%.
2. ``teacher``: synthetic-teacher mapped reads (train/data.py): random
   signals labelled by a teacher model's own Viterbi path.  The
   teacher's posterior-decode calls vs its Viterbi truth calibrate the
   ceiling; ``--student ckpt.npz`` evaluates a trained student against
   the same truth (the metric a taiyaki-style training loop optimises).

Writes docs/ACCURACY_r3.json and prints one line per case.

    python tools/accuracy_eval.py [--student ckpt.npz] [--train-demo]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

BASES = "ACGTZ"
GOLDENS = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def bases_str(idx: np.ndarray) -> str:
    return "".join(BASES[i] for i in np.asarray(idx))


def fixture_cases(results: dict) -> None:
    import jax

    from flappie_tpu.accuracy import align_identity
    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.signal.preprocess import RawTable
    from tests.ref_harness.parity_models import PARITY_MODELS, parity_params
    from flappie_tpu.io.crp import read_crp

    man_path = os.path.join(GOLDENS, "manifest.json")
    if not os.path.exists(man_path):
        print("fixture: goldens not generated; skipping", file=sys.stderr)
        return
    with open(man_path) as fh:
        man = json.load(fh)

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.float32)[: man["nsample"]]
    raw_unit = np.float32(1373.41) / np.float32(8192.0)
    raw = ((adc + np.float32(16.0)) * raw_unit).astype(np.float32)

    for case in ("ff_fb_fastq", "ff_fb_fastq_h256", "ff_ckpt_fastq", "mc5_fb"):
        o = man["cases"].get(case)
        if o is None:
            continue
        with open(os.path.join(GOLDENS, o["output"])) as fh:
            truth = fh.read().splitlines()[1]
        if o.get("ckpt"):
            from tests.ref_harness.torch_ckpt import converted_params

            cfg, params = converted_params()
        else:
            from tests.ref_harness.parity_models import _shrink

            hid = o.get("hid")
            cfg = _shrink(o["model"], hid) if hid else PARITY_MODELS[o["model"]][0]
            params = parity_params(o["model"], hid)
        bc = Basecaller(cfg, params=params, chunk=0)
        rt = RawTable("x", raw.size, 0, raw.size, raw.copy())
        res = bc.basecall_read(rt)
        aln = align_identity(res.basecall, truth)
        results[f"fixture/{case}"] = {
            "identity_pct": 100 * aln.identity,
            "call_len": len(res.basecall),
            "truth_len": len(truth),
            "mismatches": aln.mismatches,
            "indels": aln.insertions + aln.deletions,
            "truth": "reference C oracle calls",
        }
        print(f"fixture/{case}: identity {100*aln.identity:.3f}% "
              f"({aln.matches}/{aln.columns} cols)", flush=True)


def teacher_cases(results: dict, student_npz: str | None, train_demo: bool) -> None:
    import jax
    import jax.numpy as jnp

    from flappie_tpu import native
    from flappie_tpu.accuracy import align_identity
    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.models.network import transitions
    from flappie_tpu.models.params import init_synthetic, load_npz
    from flappie_tpu.ops.crf import crf_viterbi
    from flappie_tpu.signal.preprocess import RawTable
    from flappie_tpu.train.data import path_to_bases
    from tests.ref_harness.parity_models import _shrink

    def run_eval(prefix, cfg, signals, truths, label, params, desc,
                 viterbi=True):
        """Basecall ``signals`` with ``params`` and align vs ``truths``."""
        bc = Basecaller(cfg, params=params, chunk=0, viterbi_only=viterbi)
        tables = [RawTable(f"r{i}", s.size, 0, s.size, s.copy())
                  for i, s in enumerate(signals)]
        calls = bc.basecall_raw_tables(tables)
        tot = np.zeros(5, np.int64)  # match mism ins del cols
        for res, truth in zip(calls, truths):
            a = align_identity(res.basecall if res else "", truth)
            tot += (a.matches, a.mismatches, a.insertions, a.deletions, a.columns)
        ident = 100 * tot[0] / max(tot[4], 1)
        results[f"{prefix}/{label}"] = {
            "identity_pct": float(ident),
            "matches": int(tot[0]), "mismatches": int(tot[1]),
            "insertions": int(tot[2]), "deletions": int(tot[3]),
            "columns": int(tot[4]), "truth": desc,
        }
        print(f"{prefix}/{label}: identity {ident:.3f}% over {tot[4]} cols",
              flush=True)

    def make_truths(cfg, teacher, signals):
        """Teacher Viterbi truth over signals preprocessed exactly as
        the Basecaller will preprocess them (default options)."""
        tables = [RawTable(f"r{i}", s.size, 0, s.size, s.copy())
                  for i, s in enumerate(signals)]
        segs = [rt.active() for rt in native.preprocess_batch(tables)
                if rt is not None]
        L = max(s.size for s in segs)
        buf = np.zeros((len(segs), L), np.float32)
        for i, s in enumerate(segs):
            buf[i, : s.size] = s
        lengths = jnp.asarray([s.size for s in segs], jnp.int32)
        trans, nblocks = transitions(
            jax.tree.map(jnp.asarray, teacher), cfg, jnp.asarray(buf),
            lengths, rnn_impl="scan",
        )
        _, path, _ = crf_viterbi(trans, nblocks, cfg.nbase)
        path, nblocks = np.asarray(path), np.asarray(nblocks)
        return [bases_str(path_to_bases(path[i], int(nblocks[i]), cfg.nbase))
                for i in range(len(segs))]

    cfg = _shrink("r941_native", 64)
    teacher = init_synthetic(cfg, seed=1234)
    rng = np.random.default_rng(7)
    signals = rng.normal(size=(8, 6000)).astype(np.float32)
    truths = make_truths(cfg, teacher, signals)

    # ceiling: the teacher's own viterbi calls vs its viterbi truth
    # (identical pipeline -> 100%; certifies the harness end to end)
    run_eval("teacher", cfg, signals, truths, "self_viterbi", teacher,
             "teacher Viterbi path (identical pipeline)")
    # decode-sensitivity row: posterior decode of the SAME weights vs
    # the viterbi truth (diffuse synthetic posteriors -> low agreement;
    # trained models are peaked and agree far more closely)
    run_eval("teacher", cfg, signals, truths, "self_fb", teacher,
             "teacher Viterbi path (fb decode of same weights)",
             viterbi=False)

    if student_npz:
        run_eval("teacher", cfg, signals, truths, "student",
                 load_npz(student_npz), "teacher Viterbi path")
    if train_demo:
        # CTC training demo on the config test_train proves converges:
        # the metric must move untrained -> trained
        import optax
        from dataclasses import replace as _rep

        from flappie_tpu.models.config import ConvSpec, ModelConfig, RnnSpec
        from flappie_tpu.train.ctc import make_ctc_train_step
        from flappie_tpu.train.data import batches, teacher_dataset

        tiny = ModelConfig(
            name="tiny", description="accuracy demo",
            convs=(ConvSpec(winlen=9, in_ch=1, out_ch=16, stride=2,
                            activation="tanh"),),
            rnns=(RnnSpec("lstm", 16, backward=True),
                  RnnSpec("lstm", 16, backward=False)),
            head="flipflop", nbase=4,
        )
        t_teacher = init_synthetic(tiny, seed=1)
        d_signals = rng.normal(size=(6, 4000)).astype(np.float32)
        d_truths = make_truths(tiny, t_teacher, d_signals)
        exs = teacher_dataset(tiny, jax.tree.map(jnp.asarray, t_teacher),
                              n_reads=8, read_len=1024, chunk=256, seed=3)
        student0 = init_synthetic(tiny, seed=99)
        run_eval("train_demo", tiny, d_signals, d_truths, "teacher_self",
                 t_teacher, "tiny teacher Viterbi path")
        run_eval("train_demo", tiny, d_signals, d_truths, "student_untrained",
                 student0, "tiny teacher Viterbi path")
        train_step, optimizer = make_ctc_train_step(tiny, optax.adam(3e-3))
        p, s = student0, optimizer.init(student0)
        nsteps = 0
        for sig, lens, states, tlen in batches(
            exs, 256, batch=8, nbase=tiny.nbase, seed=0, epochs=200
        ):
            p, s, loss = train_step(p, s, jnp.asarray(sig), jnp.asarray(lens),
                                    jnp.asarray(states), jnp.asarray(tlen))
            nsteps += 1
            if nsteps >= 300:
                break
        run_eval("train_demo", tiny, d_signals, d_truths,
                 f"student_trained_{nsteps}steps", p,
                 "tiny teacher Viterbi path")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--student", help="student checkpoint .npz to evaluate")
    ap.add_argument("--train-demo", action="store_true",
                    help="also train a student briefly and report its identity")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU XLA (the parity backend; avoids "
                         "remote TPU compiles for these small shapes)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "ACCURACY_r3.json"))
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    results: dict = {}
    fixture_cases(results)
    teacher_cases(results, args.student, args.train_demo)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(args.out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
