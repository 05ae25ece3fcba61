"""Train a student to convergence through the fused-VJP path, then
basecall with its checkpoint on the real CLI (round-4 verdict next #3).

Round 4 proved the fused-kernel training step (2.39x over scan,
grad-checked) but never drove it to a converged model.  This tool is
the full taiyaki-replacement loop the reference ecosystem runs out of
band (misc/taiyaki_flipflop5_guppy.py:38-65: train -> dump -> compile
into the basecaller), TPU-native end to end:

1. Corpus: tiled-real-fixture ADC reads + per-read jitter (realistic
   signal statistics, NOT iid noise), preprocessed by the production
   pipeline (native trim + med-MAD normalise).
2. Teacher truth: the CLI's default synthetic r941_native weights
   (seed 0) Viterbi-label the preprocessed signal -- so the teacher's
   CLI output IS the truth an end user can reproduce.
3. Student: same architecture, different init (seed 7), trained on the
   supervised CRF block-path NLL (train/trainer.nll_loss) with
   rnn_impl="train": fused Pallas forward + recompute-gates custom VJP
   backward (ops/rnn_vjp.py) on TPU.
4. Convergence curve over >= 1k steps, then save a params-only npz and
   basecall a HELD-OUT corpus through the real CLI with --checkpoint,
   before vs after, reporting alignment identity vs the teacher calls.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_r5.py

Writes docs/TRAIN_r5.json and /tmp/train_r5/student_{init,trained}.npz.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = int(os.environ.get("TRAIN_R5_STEPS", 1500))
B = int(os.environ.get("TRAIN_R5_B", 32))
CHUNK = int(os.environ.get("TRAIN_R5_CHUNK", 2560))
N_TRAIN_READS = int(os.environ.get("TRAIN_R5_READS", 96))
N_EVAL_READS = int(os.environ.get("TRAIN_R5_EVAL_READS", 24))
LR = float(os.environ.get("TRAIN_R5_LR", 2e-4))
MODEL = os.environ.get("TRAIN_R5_MODEL", "r941_native")
WORK = f"/tmp/train_r5/{MODEL}" if MODEL != "r941_native" else "/tmp/train_r5"


def gen_adc_reads(n_reads: int, rng) -> list:
    from flappie_tpu.io.crp import read_crp

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    reads = []
    for _ in range(n_reads):
        n = int(rng.integers(16_000, 28_000))
        row = np.tile(adc, int(np.ceil(n / adc.size)))[:n]
        reads.append((row + rng.integers(-3, 4, size=n)).astype(np.int16))
    return reads


def preprocess(reads: list) -> list:
    """ADC reads -> normalised active segments (the CLI pipeline)."""
    from flappie_tpu import native
    from flappie_tpu.signal.preprocess import RawTable

    offset, rng_, dig = 16.0, 1373.41, 8192.0
    tables = [
        RawTable(
            uuid=f"t{i}", n=r.size, start=0, end=r.size,
            raw=(r.astype(np.float32) + np.float32(offset))
            * (np.float32(rng_) / np.float32(dig)),
            adc=r, cal=(np.float32(offset), np.float32(rng_) / np.float32(dig)),
        )
        for i, r in enumerate(reads)
    ]
    done = native.preprocess_batch(tables, trim_start=200, trim_end=10,
                                   varseg_chunk=100, varseg_thresh=0.0,
                                   delta=0.0)
    return [rt.active().copy() for rt in done if rt is not None]


def teacher_label(cfg, teacher, segs: list):
    """Viterbi block paths of the teacher over each segment."""
    import jax
    import jax.numpy as jnp

    from flappie_tpu.models.network import transitions
    from flappie_tpu.ops.crf import crf_viterbi

    @jax.jit
    def label(sig, lengths):
        trans, nblocks = transitions(teacher, cfg, sig, lengths,
                                     rnn_impl="auto")
        _, path, _ = crf_viterbi(trans, nblocks, cfg.nbase)
        return path, nblocks

    # ONE padded shape for every batch: a varying max-length per batch
    # would compile a fresh program per batch through the remote
    # compile service (minutes each)
    T = max(s.size for s in segs)
    T += (-T) % cfg.total_stride
    out = []
    bs = 16
    for ofs in range(0, len(segs), bs):
        part = segs[ofs:ofs + bs]
        sig = np.zeros((bs, T), np.float32)
        lengths = np.zeros(bs, np.int32)
        for j, s in enumerate(part):
            sig[j, : s.size] = s
            lengths[j] = s.size
        path, nblocks = label(jnp.asarray(sig), jnp.asarray(lengths))
        path, nblocks = np.asarray(path), np.asarray(nblocks)
        for j, s in enumerate(part):
            out.append(path[j, : nblocks[j] + 1])
    return out


def chunk_supervised(cfg, segs, paths):
    """Cut (signal, block path) into fixed-shape supervised chunks."""
    stride = cfg.total_stride
    chunk = CHUNK - CHUNK % stride
    xs, ys = [], []
    for sig, path in zip(segs, paths):
        for s in range(0, sig.size - chunk + 1, chunk):
            g0 = s // stride
            nblk = chunk // stride
            xs.append(sig[s:s + chunk])
            ys.append(path[g0:g0 + nblk + 1].astype(np.int32))
    return np.stack(xs), np.stack(ys)


def write_fast5_corpus(dirpath: str, reads: list) -> None:
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    os.makedirs(dirpath, exist_ok=True)
    for i, r in enumerate(reads):
        write_single_read_fast5(
            os.path.join(dirpath, f"read{i:04d}.fast5"), r,
            f"0f776a08-0000-4000-8000-{i:012d}")


def run_cli(reads_dir: str, out_path: str, checkpoint: str | None):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    # --viterbi on BOTH sides: the training labels are the teacher's
    # Viterbi paths, so the distillation metric is student-Viterbi vs
    # teacher-Viterbi agreement.  Evaluating against the teacher's
    # default fb-decode calls instead caps the metric at the teacher's
    # own fb-vs-Viterbi agreement -- measured at 77.9% on this corpus
    # (the teacher posterior is diffuse: per-block path prob ~0.53), a
    # decode-mode artifact, not a property of the student.
    args = [sys.executable, "-m", "flappie_tpu.cli.flappie",
            "--model", MODEL, "--viterbi"]
    if checkpoint:
        args += ["--checkpoint", checkpoint]
    args.append(reads_dir)
    with open(out_path, "w") as fh:
        proc = subprocess.run(args, stdout=fh, stderr=subprocess.PIPE,
                              text=True, env=env, timeout=5400)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    calls = {}
    with open(out_path) as fh:
        lines = fh.read().splitlines()
    for i, line in enumerate(lines):
        if line.startswith("@"):
            calls[line[1:].split()[0]] = lines[i + 1]
    if not calls:
        # a tunnel contention event can drop every dispatch (per-batch
        # "No basecall" isolation); recording that as 0% identity would
        # be a measurement bug, not a result (tools/train_eval_r5.py
        # re-runs the evaluation alone)
        raise RuntimeError(
            "CLI produced no calls (tunnel event?): "
            + "; ".join(line for line in proc.stderr.splitlines()
                        if "dropping" in line or "No basecall" in line)[:500])
    return calls


def main() -> int:
    from flappie_tpu.cli import enable_persistent_cache, honor_jax_platforms

    honor_jax_platforms()
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from flappie_tpu.accuracy import align_identity
    from flappie_tpu.models.config import get_model_config
    from flappie_tpu.models.params import init_synthetic, save_npz
    from flappie_tpu.train.trainer import nll_loss

    os.makedirs(WORK, exist_ok=True)
    results: dict = {"backend": jax.default_backend(), "steps": STEPS,
                     "batch": B, "chunk": CHUNK, "lr": LR, "model": MODEL,
                     "corpus": f"{N_TRAIN_READS} train / {N_EVAL_READS} "
                               "eval tiled-fixture reads (jittered)"}
    cfg = get_model_config(MODEL)
    teacher = init_synthetic(cfg, seed=0)  # == the CLI default weights
    student = init_synthetic(cfg, seed=7)

    rng = np.random.default_rng(5)
    print("# generating + labelling corpus", file=sys.stderr)
    train_reads = gen_adc_reads(N_TRAIN_READS, rng)
    segs = preprocess(train_reads)
    paths = teacher_label(cfg, teacher, segs)
    X, Y = chunk_supervised(cfg, segs, paths)
    results["n_chunks"] = int(X.shape[0])
    print(f"# {X.shape[0]} chunks of {X.shape[1]} samples", file=sys.stderr)

    optimizer = optax.adam(LR)
    opt_state = optimizer.init(student)

    @jax.jit
    def step_fn(params, opt_state, sig, path):
        lengths = jnp.full((sig.shape[0],), sig.shape[1], jnp.int32)
        loss, grads = jax.value_and_grad(
            lambda p: nll_loss(p, cfg, sig, lengths, path, rnn_impl="train")
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # teacher's own NLL on a probe batch = the convergence floor
    probe = (jnp.asarray(X[:B]), jnp.asarray(Y[:B]))
    floor = float(nll_loss(teacher, cfg, probe[0],
                           jnp.full((B,), X.shape[1], jnp.int32), probe[1],
                           rnn_impl="train"))
    results["teacher_nll_floor"] = round(floor, 4)

    params = student
    curve = []
    order = rng.permutation(X.shape[0])
    t0 = time.perf_counter()
    for step in range(STEPS):
        sel = order[(step * B) % X.shape[0]:][:B]
        if sel.size < B:
            order = rng.permutation(X.shape[0])
            sel = order[:B]
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(X[sel]), jnp.asarray(Y[sel]))
        if step % 50 == 0 or step == STEPS - 1:
            curve.append({"step": step, "loss": round(float(loss), 4)})
            print(f"# step {step}: loss {float(loss):.4f} "
                  f"(floor {floor:.4f})", file=sys.stderr)
    wall = time.perf_counter() - t0
    results["train_wall_s"] = round(wall, 1)
    results["steps_per_s"] = round(STEPS / wall, 2)
    results["curve"] = curve

    init_ckpt = os.path.join(WORK, "student_init.npz")
    trained_ckpt = os.path.join(WORK, "student_trained.npz")
    save_npz(init_ckpt, student, cfg)
    save_npz(trained_ckpt, jax.tree.map(np.asarray, params), cfg)

    # held-out CLI evaluation: teacher (default weights) vs student
    # (TRAIN_R5_SKIP_EVAL=1 skips it -- auxiliary students trained only
    # as qcal calibration subjects don't need the two CLI runs)
    if os.environ.get("TRAIN_R5_SKIP_EVAL") == "1":
        results["eval"] = "skipped (TRAIN_R5_SKIP_EVAL=1)"
        out = os.path.join(
            REPO, "docs",
            "TRAIN_r5.json" if MODEL == "r941_native"
            else f"TRAIN_r5_{MODEL}.json")
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {out} (no CLI eval)")
        return 0
    print("# CLI evaluation on held-out corpus", file=sys.stderr)
    eval_dir = os.path.join(WORK, "eval_reads")
    write_fast5_corpus(eval_dir, gen_adc_reads(N_EVAL_READS, rng))
    truth = run_cli(eval_dir, os.path.join(WORK, "teacher.fastq"), None)
    for tag, ckpt in (("before", init_ckpt), ("after", trained_ckpt)):
        calls = run_cli(eval_dir, os.path.join(WORK, f"student_{tag}.fastq"),
                        ckpt)
        idents = []
        for uuid, t_seq in truth.items():
            aln = align_identity(calls.get(uuid, ""), t_seq)
            idents.append(aln.identity)
        results[f"identity_{tag}"] = {
            "mean_pct": round(100 * float(np.mean(idents)), 2),
            "min_pct": round(100 * float(np.min(idents)), 2),
            "n_reads": len(idents),
        }
        print(f"# student {tag}: mean identity "
              f"{results[f'identity_{tag}']['mean_pct']}%", file=sys.stderr)

    results["model"] = MODEL
    out = os.path.join(
        REPO, "docs",
        "TRAIN_r5.json" if MODEL == "r941_native"
        else f"TRAIN_r5_{MODEL}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")
    print(json.dumps({k: results[k] for k in
                      ("identity_before", "identity_after", "steps_per_s")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
