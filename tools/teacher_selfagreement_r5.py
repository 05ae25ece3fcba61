"""Measure the teacher's SELF-agreement under ADC jitter.

docs/TRAIN_r5.json records the trained student's held-out identity vs
the teacher's calls.  That number's natural ceiling is not 100%: the
teacher's per-block NLL floor on its own Viterbi labels is ~0.64
(per-block path probability ~0.53), i.e. its posterior is diffuse and
its Viterbi path flips near-ties under per-sample jitter.  A student
distilled from teacher-on-jitter-A cannot agree with teacher-on-jitter-B
beyond the teacher's own agreement across jitters.

This tool measures that ceiling directly: the SAME clean tiled-fixture
reads are jittered twice independently (the train_r5 noise regime,
+-3 ADC counts), the teacher (CLI default weights) basecalls both
corpora through the real CLI in BOTH decode modes (posterior fb decode
and --viterbi), and pairwise alignment identity between the two call
sets per mode is the teacher's self-agreement band.  It also records
the fb-vs-Viterbi band on identical signal — the decode-mode gap that a
mixed-mode eval (Viterbi-labeled student scored against fb teacher
calls) silently conflates with distillation error; measured at ~78%
here, which is why train_r5/train_eval_r5 evaluate Viterbi-vs-Viterbi.
The result is folded into docs/TRAIN_r5.json as "teacher_self_agreement"
so the student's identity_after can be read against it.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/teacher_selfagreement_r5.py [NREADS]

Reference axis: the taiyaki training loop the reference points users at
(/root/reference/misc/taiyaki_flipflop5_guppy.py) measures students
against reference-aligned truth; with synthetic weights the teacher IS
the truth, so its self-consistency bounds any student's score.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("TRAIN_R5_WORK", "/tmp/train_r5_selfagree")


def run_cli(reads_dir: str, out_path: str, viterbi: bool = False) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    args = [sys.executable, "-m", "flappie_tpu.cli.flappie",
            "--model", "r941_native"]
    if viterbi:
        args.append("--viterbi")
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
        raise RuntimeError("CLI produced no calls (tunnel event?)")
    return calls


def main() -> int:
    from flappie_tpu.accuracy import align_identity
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    rng = np.random.default_rng(23)

    dirs = [os.path.join(WORK, f"jitter_{k}") for k in ("a", "b")]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    for i in range(n_reads):
        n = int(rng.integers(16_000, 28_000))
        clean = np.tile(adc, int(np.ceil(n / adc.size)))[:n]
        for d in dirs:
            noisy = (clean + rng.integers(-3, 4, size=n)).astype(np.int16)
            write_single_read_fast5(
                os.path.join(d, f"read{i:04d}.fast5"), noisy,
                f"0f776a08-0001-4000-8000-{i:012d}")

    def pairwise(calls_x: dict, calls_y: dict) -> dict:
        idents = [align_identity(seq, calls_y.get(uuid, "")).identity
                  for uuid, seq in calls_x.items()]
        return {
            "mean_pct": round(100 * float(np.mean(idents)), 2),
            "min_pct": round(100 * float(np.min(idents)), 2),
            "n_reads": len(idents),
        }

    # Four call sets: both decode modes on both jitters.  Self-agreement
    # (A-vs-B within a mode) is the distillation ceiling for a student
    # evaluated in that mode; fb-vs-Viterbi on the SAME signal is the
    # decode-mode band a mixed-mode eval would conflate with it.
    fb_a = run_cli(dirs[0], os.path.join(WORK, "teacher_a.fastq"))
    fb_b = run_cli(dirs[1], os.path.join(WORK, "teacher_b.fastq"))
    vit_a = run_cli(dirs[0], os.path.join(WORK, "teacher_a_vit.fastq"),
                    viterbi=True)
    vit_b = run_cli(dirs[1], os.path.join(WORK, "teacher_b_vit.fastq"),
                    viterbi=True)

    result = {
        "fb": pairwise(fb_a, fb_b),
        "viterbi": pairwise(vit_a, vit_b),
        "fb_vs_viterbi_same_signal": pairwise(fb_a, vit_a),
        "note": "teacher CLI calls on two independent +-3 ADC jitters of "
                "the SAME clean reads, in both decode modes; the per-mode "
                "A-vs-B band bounds any distilled student's identity vs "
                "teacher in that mode (per-block teacher path prob ~0.53); "
                "fb_vs_viterbi is the decode-mode band on identical signal",
    }
    for key in ("fb", "viterbi", "fb_vs_viterbi_same_signal"):
        r = result[key]
        print(f"# teacher {key}: mean {r['mean_pct']}% min {r['min_pct']}% "
              f"over {r['n_reads']} reads")

    art = os.path.join(REPO, "docs", "TRAIN_r5.json")
    with open(art) as fh:
        data = json.load(fh)
    data["teacher_self_agreement"] = result
    with open(art, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"updated {art}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
