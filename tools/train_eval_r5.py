"""Re-run the train_r5 CLI evaluation only (checkpoints already saved).

The tunnel can drop every dispatch during a contention event; the
pipeline correctly degrades to per-batch "No basecall" isolation, but
an eval harness that accepts an empty FASTQ records a meaningless 0%.
This tool re-drives the held-out evaluation from the saved checkpoints
and REFUSES empty call sets (retries once, then errors), updating the
identity_* fields of docs/TRAIN_r5.json in place.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_eval_r5.py
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

WORK = os.environ.get("TRAIN_R5_WORK", "/tmp/train_r5")
MODEL = os.environ.get("TRAIN_R5_MODEL", "r941_native")


def run_cli(reads_dir: str, out_path: str, checkpoint: str | None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    # --viterbi on both sides: labels are teacher Viterbi paths (see
    # tools/train_r5.py run_cli for the measured fb-vs-Viterbi 77.9%
    # decode-mode artifact this avoids)
    args = [sys.executable, "-m", "flappie_tpu.cli.flappie",
            "--model", MODEL, "--viterbi"]
    if checkpoint:
        args += ["--checkpoint", checkpoint]
    args.append(reads_dir)
    for attempt in range(2):
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
        if calls:
            return calls
        drops = [line for line in proc.stderr.splitlines()
                 if "dropping" in line or "No basecall" in line]
        print(f"# empty output ({len(drops)} drop lines; tunnel event?) "
              f"-- retrying in 60s", file=sys.stderr)
        time.sleep(60)
    raise RuntimeError(f"CLI produced no calls twice: {drops[:3]}")


def main() -> int:
    from flappie_tpu.accuracy import align_identity

    art = os.path.join(
        REPO, "docs",
        "TRAIN_r5.json" if MODEL == "r941_native"
        else f"TRAIN_r5_{MODEL}.json")
    with open(art) as fh:
        results = json.load(fh)

    eval_dir = os.path.join(WORK, "eval_reads")
    truth = run_cli(eval_dir, os.path.join(WORK, "teacher.fastq"), None)
    for tag in ("before", "after"):
        ckpt = os.path.join(
            WORK, "student_init.npz" if tag == "before"
            else "student_trained.npz")
        calls = run_cli(eval_dir, os.path.join(WORK, f"student_{tag}.fastq"),
                        ckpt)
        idents = [align_identity(calls.get(u, ""), t).identity
                  for u, t in truth.items()]
        results[f"identity_{tag}"] = {
            "mean_pct": round(100 * float(np.mean(idents)), 2),
            "min_pct": round(100 * float(np.min(idents)), 2),
            "n_reads": len(idents),
        }
        print(f"# student {tag}: {results[f'identity_{tag}']}",
              file=sys.stderr)

    with open(art, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"updated {art}")
    print(json.dumps({k: results[k]
                      for k in ("identity_before", "identity_after")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
