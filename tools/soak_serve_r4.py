"""Steady-state serve-mode soak: the amortised production rate.

docs/SOAK_r4.json accounts for the warm CLI wall; roughly half of it
is per-PROCESS fixed cost (interpreter + jax import ~2 s, program
trace + compile-cache executable load ~3 s) that a long-lived server
pays once.  This tool measures that steady state through the real
serve surface: start flappie-serve (stdin mode, --warmup), issue the
same 512-read request N times, and read the server's own per-request
acks -- request 1 still pays the trace/load, requests 2+ are the
amortised rate.  Output identity across requests is asserted.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/soak_serve_r4.py [NREADS [NREQ]]

Writes docs/SOAK_serve_r4.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    rng = np.random.default_rng(0)

    tmp = tempfile.mkdtemp(prefix="soakserve_")
    reads_dir = os.path.join(tmp, "reads")
    out_dir = os.path.join(tmp, "out")
    os.makedirs(reads_dir)
    os.makedirs(out_dir)
    total = 0
    for i in range(n_reads):
        n = int(rng.integers(20_000, 80_000))
        row = np.tile(adc, int(np.ceil(n / adc.size)))[:n]
        row = (row + rng.integers(-3, 4, size=n)).astype(np.int16)
        total += n
        write_single_read_fast5(
            os.path.join(reads_dir, f"read{i:04d}.fast5"), row,
            f"0f776a08-0000-4000-8000-{i:012d}")
    print(f"corpus: {n_reads} reads, {total/1e6:.1f} Msamples", flush=True)

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    t_start = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "flappie_tpu.cli.serve",
         "--model", "r941_native", "--warmup", "--output-dir", out_dir],
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE, text=True, env=env)

    # each request is the same reads dir via a distinct symlink, so
    # --output-dir writes one output file per request
    walls = []
    try:
        for k in range(n_req):
            os.symlink(reads_dir, os.path.join(tmp, f"req{k}"))
        reqs = "".join(os.path.join(tmp, f"req{k}") + "\n"
                       for k in range(n_req))
        out, err = proc.communicate(input=reqs, timeout=13500)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    if proc.returncode != 0:
        print(err[-3000:], file=sys.stderr)
        raise RuntimeError(f"serve exited rc={proc.returncode}")
    wall_all = time.perf_counter() - t_start

    ready = any(line.strip() == "flappie-serve: ready"
                for line in err.splitlines())
    for line in err.splitlines():
        m = re.match(
            r"flappie-serve: done \S+ reads=(\d+) called=(\d+) "
            r"wall=([0-9.]+)s", line)
        if m:
            assert int(m.group(1)) == n_reads, line
            assert int(m.group(2)) == n_reads, line
            walls.append(float(m.group(3)))
    assert len(walls) == n_req, (len(walls), err[-2000:])

    texts = []
    for k in range(n_req):
        with open(os.path.join(out_dir, f"req{k}.fastq")) as fh:
            texts.append(fh.read())
    # headers embed the request path; compare records sans filename
    strip = [re.sub(r'"filename" : "[^"]*"', "", t) for t in texts]
    identical = all(t == strip[0] for t in strip[1:])

    steady = walls[1:] if len(walls) > 1 else walls
    results = {
        "n_reads": n_reads,
        "total_samples": total,
        "n_requests": n_req,
        "warmed_up": ready,
        "request_walls_s": walls,
        "first_request_samples_per_s": round(total / walls[0], 1),
        "steady_samples_per_s_best": round(total / min(steady), 1),
        "steady_samples_per_s_median": round(
            total / float(np.median(steady)), 1),
        "steady_reads_per_s_best": round(n_reads / min(steady), 2),
        "outputs_identical": identical,
        "process_wall_s_total": round(wall_all, 1),
    }
    print(json.dumps(results, indent=1), flush=True)
    assert identical

    out_path = os.path.join(REPO, "docs", "SOAK_serve_r4.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {os.path.normpath(out_path)}", flush=True)
    import shutil

    shutil.rmtree(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
