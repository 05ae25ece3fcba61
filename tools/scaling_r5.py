"""Assemble docs/SCALING_r5.json (round-4 verdict next #6).

Runs bench_scaling.py twice and merges the JSON lines into one
committed artifact:

  1. virtual 8-device CPU mesh (1/2/4/8) -- validates the data-parallel
     MECHANICS of the production d8 wire (wire-log-asserted shard span);
     on this 1-vCPU host all virtual devices share one core, so
     aggregate throughput is flat by construction and only the
     mechanics + per-device overhead shape are meaningful, which the
     artifact says explicitly;
  2. the real single TPU chip -- the absolute single-chip rate through
     the same path.

Reference scaling axis: the reference parallelises over READS with
`parallel -X flappie` (one process per file, no intra-read scaling,
/root/reference/README.md:81-83); this framework shards the packed
chunk wire over the mesh data axis inside ONE program.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/scaling_r5.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag: str, env_extra: dict, argv: list) -> list:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_scaling.py"), *argv],
        capture_output=True, text=True, timeout=7200, env=env, cwd=REPO)
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"bench_scaling {tag} failed")
    rows = [json.loads(line) for line in proc.stdout.splitlines()
            if line.strip().startswith("{")]
    for r in rows:
        print(f"# {tag} n={r['n_devices']}: {r['value']/1e6:.2f} Msamples/s "
              f"({r['per_device']/1e6:.2f} per device)", flush=True)
    return rows


def main() -> int:
    out = {
        "wire": "production packed d8 chunk batches, sharded over the "
                "mesh data axis (wire-log-asserted shard span per "
                "dispatch)",
        "virtual_cpu_mesh": {
            "note": "8 XLA host devices on ONE physical core: aggregate "
                    "throughput cannot scale; this run certifies the "
                    "sharding mechanics and measures the per-device "
                    "dispatch overhead shape only",
            "rows": run(
                "cpu-mesh",
                {"JAX_PLATFORMS": "cpu",
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
                ["--per-device-batch", "2", "--T", "8192",
                 "--devices", "1", "2", "4", "8"]),
        },
        "real_tpu": {
            "note": "one real v5e chip through the tunnel; the "
                    "single-chip absolute rate for the same path "
                    "(multi-chip hardware is not available in this "
                    "environment)",
            "rows": run("tpu", {}, ["--devices", "1",
                                    "--per-device-batch", "64",
                                    "--iters", "8"]),
        },
    }
    path = os.path.join(REPO, "docs", "SCALING_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
