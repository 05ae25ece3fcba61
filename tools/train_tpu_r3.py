"""Extended training run on the real TPU chip.

The trainer's tests (tests/test_train.py) and the accuracy harness's
300-step CTC demo run on XLA:CPU; this tool exercises the SAME stack
on the real chip for an extended run and records the evidence: loss
curve, steps/s through the tunnel, and alignment identity of the
student's basecalls against the teacher's Viterbi truth before and
after training.  Teacher-student on synthetic signal (the repo has no
real training corpora — weights are LFS pointers upstream), same
self-consistent-target setup as tools/accuracy_eval.py --train-demo,
scaled up: the SAME tiny architecture as that demo (so the numbers
compare directly: 300 CPU steps reached 62.6% identity), with 8x the
mapped reads and 3,000 adam steps on the chip.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_tpu_r3.py
Writes docs/TRAIN_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS: dict = {}


def main() -> int:
    import jax
    import jax.numpy as jnp
    import optax

    from flappie_tpu.accuracy import align_identity
    from flappie_tpu.basecall import Basecaller
    from flappie_tpu.models.config import ConvSpec, ModelConfig, RnnSpec
    from flappie_tpu.models.network import transitions
    from flappie_tpu.models.params import init_synthetic
    from flappie_tpu.ops.crf import crf_viterbi
    from flappie_tpu.signal.preprocess import RawTable
    from flappie_tpu.train.ctc import make_ctc_train_step
    from flappie_tpu.train.data import batches, path_to_bases, teacher_dataset
    from flappie_tpu import native

    RESULTS["backend"] = jax.default_backend()
    BASES = "ACGTZ"

    cfg = ModelConfig(
        name="train_tpu_demo", description="on-chip training demo",
        convs=(ConvSpec(winlen=9, in_ch=1, out_ch=16, stride=2,
                        activation="tanh"),),
        rnns=(RnnSpec("lstm", 16, backward=True),
              RnnSpec("lstm", 16, backward=False)),
        head="flipflop", nbase=4,
    )
    teacher = init_synthetic(cfg, seed=1)
    student = init_synthetic(cfg, seed=99)

    # -- teacher truth for held-out eval signals ------------------------
    rng = np.random.default_rng(7)
    eval_signals = rng.normal(size=(8, 4000)).astype(np.float32)

    def make_truths(signals):
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
            lengths, rnn_impl="scan")
        _, path, _ = crf_viterbi(trans, nblocks, cfg.nbase)
        path, nblocks = np.asarray(path), np.asarray(nblocks)
        return [
            "".join(BASES[i] for i in
                    path_to_bases(path[i], int(nblocks[i]), cfg.nbase))
            for i in range(len(segs))
        ]

    truths = make_truths(eval_signals)

    def evaluate(label, params):
        bc = Basecaller(cfg, params=params, chunk=0, viterbi_only=True)
        tables = [RawTable(f"r{i}", s.size, 0, s.size, s.copy())
                  for i, s in enumerate(eval_signals)]
        calls = bc.basecall_raw_tables(tables)
        tot = np.zeros(2, np.int64)
        for res, truth in zip(calls, truths):
            a = align_identity(res.basecall if res else "", truth)
            tot += (a.matches, a.columns)
        ident = 100 * tot[0] / max(tot[1], 1)
        RESULTS[label] = {"identity_pct": float(ident),
                          "matches": int(tot[0]), "columns": int(tot[1])}
        print(f"{label}: identity {ident:.2f}% over {tot[1]} cols",
              flush=True)
        return ident

    evaluate("teacher_self", teacher)
    evaluate("student_untrained", student)

    # -- dataset + extended training ------------------------------------
    exs = teacher_dataset(cfg, jax.tree.map(jnp.asarray, teacher),
                          n_reads=64, read_len=1024, chunk=256, seed=3)
    RESULTS["n_examples"] = len(exs)
    print(f"dataset: {len(exs)} chunk examples", flush=True)

    NSTEPS, BATCH = 3000, 16
    schedule = optax.cosine_decay_schedule(3e-3, NSTEPS, alpha=0.1)
    train_step, optimizer = make_ctc_train_step(cfg, optax.adam(schedule))
    p = jax.tree.map(jnp.asarray, student)
    s = optimizer.init(p)

    losses = []
    nsteps = 0
    t0 = None
    for sig, lens, states, tlen in batches(
        exs, 256, batch=BATCH, nbase=cfg.nbase, seed=0, epochs=10_000
    ):
        p, s, loss = train_step(p, s, jnp.asarray(sig), jnp.asarray(lens),
                                jnp.asarray(states), jnp.asarray(tlen))
        nsteps += 1
        if nsteps == 1:
            loss.block_until_ready() if hasattr(loss, "block_until_ready") \
                else np.asarray(loss)
            t0 = time.perf_counter()  # exclude compile from steps/s
        if nsteps % 100 == 0 or nsteps == 1:
            l = float(np.asarray(loss))
            losses.append({"step": nsteps, "loss": round(l, 4)})
            print(f"step {nsteps:5d}  loss {l:.4f}", flush=True)
        if nsteps >= NSTEPS:
            break
    np.asarray(loss)
    wall = time.perf_counter() - t0
    RESULTS["loss_curve"] = losses
    RESULTS["steps"] = nsteps
    RESULTS["steps_per_s"] = round((nsteps - 1) / wall, 2)
    print(f"trained {nsteps} steps in {wall:.0f}s "
          f"({(nsteps-1)/wall:.2f} steps/s through the tunnel)", flush=True)

    evaluate(f"student_trained_{nsteps}steps", jax.tree.map(np.asarray, p))

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "TRAIN_r3.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
