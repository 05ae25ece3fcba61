"""Serve steady state vs same-session dispatch-only rate (round-4 #2).

Round 4's serve steady state (7.66 Msamples/s best) was 35% of the
same-day dispatch-only rate; the phase ledger blamed ~2.8 s of
UNOVERLAPPED collect_wait per 512-read run (D2H materialised on the
caller thread) plus caller-thread uploads.  Round 5 moved both off the
critical path by default (_Pipeline collector thread +
FLAPPIE_TPU_UPLOAD_THREADS=1 on TPU).  This tool measures, in ONE
session (same tunnel weather):

  1. the dispatch-only rate of the same workload (prepacked d8 chunk
     batches through the production grouped program, pipelined), and
  2. the serve-mode steady state (N identical requests through the
     real server surface, request 1 pays trace/load), with the
     server's phase ledger captured at exit.

Done-condition: steady state >= 60% of the dispatch-only rate,
outputs byte-identical across requests.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/soak_serve_r5.py [NREADS [NREQ]]

Writes docs/SOAK_serve_r5.json.
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

    from flappie_tpu.cli import enable_persistent_cache, honor_jax_platforms

    honor_jax_platforms()
    enable_persistent_cache()

    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    rng = np.random.default_rng(0)

    tmp = tempfile.mkdtemp(prefix="soakserve5_")
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

    # -- 1. dispatch-only reference (same session) ----------------------
    from bench_common import pipelined
    from flappie_tpu import native
    from flappie_tpu.basecall import Basecaller, encode_d8
    from flappie_tpu.parallel.chunking import chunk_records, plan_chunks
    from flappie_tpu.signal.fast5 import read_raw

    CHUNK, OVERLAP, CB, G = 12800, 1600, 128, 4
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, overlap=OVERLAP, chunk_batch=CB)
    stride = caller.cfg.total_stride
    tables = [read_raw(os.path.join(reads_dir, f"read{i:04d}.fast5"))
              for i in range(n_reads)]
    jobs = []
    for rt in native.preprocess_batch(tables):
        if rt is None:
            continue
        seg = rt.adc[rt.start:rt.end]
        scal = np.array([rt.cal[0], rt.cal[1], rt.norm[0], rt.norm[1]],
                        np.float32)
        for r in chunk_records(plan_chunks(rt.end - rt.start, stride,
                                           CHUNK, OVERLAP)):
            jobs.append((seg, scal, r))
    bufs = []
    for ofs in range(0, len(jobs), CB):
        sl = jobs[ofs:ofs + CB]
        a = np.zeros((CB, CHUNK), np.int16)
        ln = np.full(CB, stride, np.int32)
        qlo = np.zeros(CB, np.int32)
        qhi = np.zeros(CB, np.int32)
        sc = np.zeros((CB, 4), np.float32)
        sc[:, 3] = 1.0
        for j, (seg, s, r) in enumerate(sl):
            a[j, : r.length] = seg[r.start : r.start + r.length]
            ln[j] = r.length
            qlo[j] = r.qlo
            qhi[j] = r.qhi
            sc[j] = s
        b8 = encode_d8(Basecaller.pack_chunk_inputs_i16(a, ln, qlo, qhi, sc))
        assert b8 is not None
        bufs.append(b8)
    grouped = [np.concatenate(bufs[o:o + G], axis=0)
               for o in range(0, len(bufs) - G + 1, G)]
    n_grouped_samples = total * len(grouped) * G // len(bufs)
    _ = np.asarray(caller.dispatch_packed_chunk_d8_grouped(grouped[0], G))
    d_rates = [
        pipelined(lambda b: caller.dispatch_packed_chunk_d8_grouped(b, G),
                  grouped, n_grouped_samples, 1,
                  submit=caller._submit_dispatch)
        for _ in range(3)
    ]
    dispatch_sps = max(d_rates)
    print(f"dispatch-only: best {dispatch_sps/1e6:.2f} Msamples/s "
          f"(epochs {[round(r/1e6, 2) for r in d_rates]})", flush=True)

    # -- 2. serve soak ---------------------------------------------------
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    phases_path = os.path.join(tmp, "serve_phases.json")
    env["FLAPPIE_TPU_PHASES"] = phases_path
    t_start = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "flappie_tpu.cli.serve",
         "--model", "r941_native", "--warmup", "--output-dir", out_dir],
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE, text=True, env=env)
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
    strip = [re.sub(r'"filename" : "[^"]*"', "", t) for t in texts]
    identical = all(t == strip[0] for t in strip[1:])

    phases = {}
    if os.path.exists(phases_path):
        with open(phases_path) as fh:
            phases = json.load(fh)

    steady = walls[1:] if len(walls) > 1 else walls
    steady_best = total / min(steady)

    # Host-bound decomposition: on a single-vCPU host the steady
    # request wall cannot drop below the request's total host CPU work
    # (fast5 decode + preprocess + pack + d8 encode + host assembly),
    # no matter how well device round trips overlap -- background
    # threads add overlap, not CPU capacity.  When the per-request
    # host-phase sum ~= the best steady wall, serve is at the host's
    # speed of light and steady_vs_dispatch is capped by host
    # preprocessing throughput (dispatch-only starts from prepacked
    # buffers, so it pays none of these phases).
    host_bound = {}
    ph = phases.get("phases", {}) if phases else {}
    host_keys = ("fast5_read", "preprocess", "pack", "encode_d8",
                 "collect_host")
    if ph and all(k in ph for k in ("fast5_read", "preprocess")):
        host_s = sum(ph[k]["wall_s"] for k in host_keys if k in ph) / n_req
        host_bound = {
            "host_cpu_phase_s_per_request": round(host_s, 2),
            "best_steady_request_wall_s": round(min(steady), 2),
            "host_share_of_best_request_pct": round(
                100 * host_s / min(steady), 1),
            "phases_counted": list(host_keys),
            "note": "single-vCPU host: request wall floor = host CPU "
                    "work per request; device work hides behind it",
        }
    results = {
        "n_reads": n_reads,
        "total_samples": total,
        "n_requests": n_req,
        "request_walls_s": walls,
        "first_request_samples_per_s": round(total / walls[0], 1),
        "steady_samples_per_s_best": round(steady_best, 1),
        "steady_samples_per_s_median": round(
            total / float(np.median(steady)), 1),
        "steady_reads_per_s_best": round(n_reads / min(steady), 2),
        "dispatch_only_samples_per_s": round(dispatch_sps, 1),
        "dispatch_only_epochs": [round(r, 1) for r in d_rates],
        "steady_vs_dispatch_pct": round(100 * steady_best / dispatch_sps, 1),
        "outputs_identical": identical,
        "host_bound_analysis": host_bound,
        "serve_phase_ledger": phases,
        "process_wall_s_total": round(wall_all, 1),
        "defaults": "upload_threads=1 (TPU), collector thread on",
    }
    print(json.dumps({k: v for k, v in results.items()
                      if k != "serve_phase_ledger"}, indent=1), flush=True)
    assert identical

    out_path = os.path.join(REPO, "docs", "SOAK_serve_r5.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {os.path.normpath(out_path)}", flush=True)
    import shutil

    shutil.rmtree(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
