"""Instrumented production soak: account for every second (round-4 #3).

Extends tools/soak_r3.py with the per-phase wall-clock breakdown the
round-3 verdict asked for: each CLI run exports FLAPPIE_TPU_PHASES so
the pipeline itself reports where the time goes (fast5 read, native
preprocess, d8 encode, pack, dispatch, upload wait, collect, format),
and a third warm run A/Bs FLAPPIE_TPU_UPLOAD_THREADS (background-pool
uploads overlapping pack/encode).  The dispatch-only reference runs the
same chunk workload through prepacked pipelined dispatch under the same
tunnel weather so CLI overhead is isolated from that day's bandwidth.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/soak_r4.py [NREADS]

Writes docs/SOAK_r4.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(reads_dir: str, tmp: str, tag: str, extra_env=None,
            timeout: int = 3600):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    phases_path = os.path.join(tmp, f"phases_{tag}.json")
    env["FLAPPIE_TPU_PHASES"] = phases_path
    if extra_env:
        env.update(extra_env)
    out_path = os.path.join(tmp, f"out_{tag}.fastq")
    t0 = time.perf_counter()
    with open(out_path, "w") as fh:
        proc = subprocess.run(
            [sys.executable, "-m", "flappie_tpu.cli.flappie",
             "--model", "r941_native", reads_dir],
            stdout=fh, stderr=subprocess.PIPE, text=True, env=env,
            timeout=timeout)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"CLI run {tag} failed rc={proc.returncode}")
    with open(out_path) as fh:
        lines = fh.read().splitlines()
    records = sum(1 for line in lines if line.startswith("@"))
    failures = [line for line in proc.stderr.splitlines()
                if "No basecall" in line]
    phases = {}
    if os.path.exists(phases_path):
        with open(phases_path) as fh:
            phases = json.load(fh)
    return {
        "records": records,
        "failures": len(failures),
        "wall_s": round(wall, 1),
        "phases": phases,
    }, out_path


def main() -> int:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    rng = np.random.default_rng(0)

    tmp = tempfile.mkdtemp(prefix="soak4_")
    reads_dir = os.path.join(tmp, "reads")
    os.makedirs(reads_dir)
    total_samples = 0
    t0 = time.perf_counter()
    for i in range(n_reads):
        n = int(rng.integers(20_000, 80_000))
        row = np.tile(adc, int(np.ceil(n / adc.size)))[:n]
        row = (row + rng.integers(-3, 4, size=n)).astype(np.int16)
        total_samples += n
        write_single_read_fast5(
            os.path.join(reads_dir, f"read{i:04d}.fast5"), row,
            f"0f776a08-0000-4000-8000-{i:012d}")
    print(f"generated {n_reads} reads, {total_samples/1e6:.1f} Msamples "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    results = {"n_reads": n_reads, "total_samples": total_samples}
    outs = {}
    # A/B/A/B: the tunnel's throughput swings widely between runs
    # (entire epochs can crater under external contention), so a single
    # warm-vs-threads pair can't attribute a difference to the code --
    # interleave two of each and compare the BEST of each config.
    runs = [
        ("cold", None),
        ("warm", None),
        ("warm_ut2", {"FLAPPIE_TPU_UPLOAD_THREADS": "2"}),
        ("warm_b", None),
        ("warm_ut2_b", {"FLAPPIE_TPU_UPLOAD_THREADS": "2"}),
    ]
    for tag, extra in runs:
        rec, out_path = run_cli(reads_dir, tmp, tag, extra)
        rec["samples_per_s"] = round(total_samples / rec["wall_s"], 1)
        rec["reads_per_s"] = round(rec["records"] / rec["wall_s"], 2)
        results[tag] = rec
        outs[tag] = out_path
        print(f"{tag}: wall {rec['wall_s']}s = "
              f"{rec['samples_per_s']/1e6:.2f} Msamples/s; phases: "
              f"{json.dumps(rec['phases'].get('phases', {}))}", flush=True)
        assert rec["records"] == n_reads, f"{n_reads - rec['records']} missing"
        assert not rec["failures"]
    texts = []
    for tag, _ in runs:
        with open(outs[tag]) as fh:
            texts.append(fh.read())
    results["outputs_identical"] = all(t == texts[0] for t in texts[1:])
    print(f"all {len(runs)} run outputs identical: "
          f"{results['outputs_identical']}", flush=True)

    # -- dispatch-only reference under the SAME tunnel weather ----------
    from flappie_tpu import native
    from flappie_tpu.basecall import Basecaller, encode_d8
    from flappie_tpu.parallel.chunking import chunk_records, plan_chunks
    from flappie_tpu.signal.fast5 import read_raw

    CHUNK, OVERLAP, CB, G = 12800, 1600, 128, 3
    caller = Basecaller("r941_native", seed=0, compute_trace=False,
                        chunk=CHUNK, overlap=OVERLAP, chunk_batch=CB)
    stride = caller.cfg.total_stride
    tables = [read_raw(os.path.join(reads_dir, f"read{i:04d}.fast5"))
              for i in range(n_reads)]
    jobs = []
    for rt in native.preprocess_batch(tables):
        if rt is None:
            continue
        adc_seg = rt.adc[rt.start : rt.end]
        scal = np.array([rt.cal[0], rt.cal[1], rt.norm[0], rt.norm[1]],
                        np.float32)
        n = rt.end - rt.start
        for r in chunk_records(plan_chunks(n, stride, CHUNK, OVERLAP)):
            jobs.append((adc_seg, scal, r))
    bufs = []
    for ofs in range(0, len(jobs), CB):
        sl = jobs[ofs : ofs + CB]
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
        b16 = Basecaller.pack_chunk_inputs_i16(a, ln, qlo, qhi, sc)
        b8 = encode_d8(b16)
        bufs.append(("d8", b8) if b8 is not None else ("i16", b16))
    d8_bufs = [b for k, b in bufs if k == "d8"]
    i16_bufs = [b for k, b in bufs if k == "i16"]
    grouped = [np.concatenate(d8_bufs[o : o + G], axis=0)
               for o in range(0, len(d8_bufs) - G + 1, G)]
    rest = d8_bufs[len(grouped) * G :]
    # warm EACH program that will be timed (independent ifs)
    if grouped:
        _ = np.asarray(caller.dispatch_packed_chunk_d8_grouped(grouped[0], G))
    if rest:
        _ = np.asarray(caller.dispatch_packed_chunk_d8(rest[0]))
    if i16_bufs:
        _ = np.asarray(caller.dispatch_packed_chunk_i16(i16_bufs[0]))
    t0 = time.perf_counter()
    pend = [caller.dispatch_packed_chunk_d8_grouped(b, G) for b in grouped]
    pend += [caller.dispatch_packed_chunk_d8(b) for b in rest]
    pend += [caller.dispatch_packed_chunk_i16(b) for b in i16_bufs]
    outs_d = [np.asarray(o) for o in pend]
    wall_d = time.perf_counter() - t0
    results["dispatch_only"] = {
        "chunk_batches": len(bufs),
        "i16_fallback_batches": len(i16_bufs),
        "wall_s": round(wall_d, 2),
        "samples_per_s": round(total_samples / wall_d, 1),
    }
    print(f"dispatch_only (same weather): {results['dispatch_only']}",
          flush=True)
    del outs_d

    out = os.path.join(REPO, "docs", "SOAK_r4.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    import shutil

    shutil.rmtree(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
