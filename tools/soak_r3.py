"""Production soak: the real CLI over a directory of fast5 reads.

bench.py measures prepacked device dispatch; this tool measures the
PRODUCT surface end to end on the chip: 512 single-read fast5 files of
varied length (tiled real fixture signal + per-read jitter) through
``python -m flappie_tpu.cli.flappie`` — fast5 IO, threaded native
preprocessing, d8 upload wire, chunked grouped dispatch, stitch, FASTQ
— asserting every read produces a record and recording reads/s and
samples/s.  Runs the CLI twice: ``cold`` populates the persistent
compilation cache (cli.enable_persistent_cache, on by default), and
``warm`` measures the repeat-invocation cost a production user
actually pays.  Writes docs/SOAK_r3.json.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/soak_r3.py [NREADS]
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


def main() -> int:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    adc = read_crp("/root/reference/src/test/raw_signal.crp").reshape(-1)
    adc = adc.astype(np.int16)
    rng = np.random.default_rng(0)

    tmp = tempfile.mkdtemp(prefix="soak_")
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
    t_gen = time.perf_counter() - t0
    print(f"generated {n_reads} reads, {total_samples/1e6:.1f} Msamples "
          f"({t_gen:.0f}s)", flush=True)

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    results = {"n_reads": n_reads, "total_samples": total_samples}
    for run in ("cold", "warm"):
        out_path = os.path.join(tmp, f"out_{run}.fastq")
        t0 = time.perf_counter()
        with open(out_path, "w") as fh:
            proc = subprocess.run(
                [sys.executable, "-m", "flappie_tpu.cli.flappie",
                 "--model", "r941_native", reads_dir],
                stdout=fh, stderr=subprocess.PIPE, text=True, env=env,
                timeout=3600)
        wall = time.perf_counter() - t0
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            return 1

        with open(out_path) as fh:
            lines = fh.read().splitlines()
        records = sum(1 for l in lines if l.startswith("@"))
        seq_bases = sum(len(lines[i + 1]) for i, l in enumerate(lines)
                        if l.startswith("@"))
        failures = [l for l in proc.stderr.splitlines() if "No basecall" in l]

        results[run] = {
            "records": records,
            "failures": len(failures),
            "bases_called": seq_bases,
            "wall_s": round(wall, 1),
            "reads_per_s": round(records / wall, 2),
            "samples_per_s": round(total_samples / wall, 1),
        }
        print(f"{run}: {results[run]}", flush=True)
        assert records == n_reads, f"{n_reads - records} reads missing"
        assert not failures, failures[:3]
    with open(os.path.join(tmp, "out_cold.fastq")) as a, \
         open(os.path.join(tmp, "out_warm.fastq")) as b:
        results["cold_warm_bytes_identical"] = a.read() == b.read()
    print(f"cold/warm outputs identical: "
          f"{results['cold_warm_bytes_identical']}", flush=True)

    # -- dispatch-only reference under the SAME tunnel weather ----------
    # The same chunk workload through bench-style prepacked pipelined
    # dispatch: the delta to the warm CLI wall isolates CLI overhead
    # (startup, fast5 IO, preprocessing, packing, FASTQ) from the
    # day's tunnel throughput.
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
        adc = np.zeros((CB, CHUNK), np.int16)
        ln = np.full(CB, stride, np.int32)
        qlo = np.zeros(CB, np.int32)
        qhi = np.zeros(CB, np.int32)
        sc = np.zeros((CB, 4), np.float32)
        sc[:, 3] = 1.0
        for j, (seg, s, r) in enumerate(sl):
            adc[j, : r.length] = seg[r.start : r.start + r.length]
            ln[j] = r.length
            qlo[j] = r.qlo
            qhi[j] = r.qhi
            sc[j] = s
        b16 = Basecaller.pack_chunk_inputs_i16(adc, ln, qlo, qhi, sc)
        b8 = encode_d8(b16)
        # encode_d8 is lossless-or-bust: a batch whose deltas blow the
        # exception budget returns None and must ride the i16 wire
        bufs.append(("d8", b8) if b8 is not None else ("i16", b16))
    d8_bufs = [b for k, b in bufs if k == "d8"]
    i16_bufs = [b for k, b in bufs if k == "i16"]
    grouped = [np.concatenate(d8_bufs[o : o + G], axis=0)
               for o in range(0, len(d8_bufs) - G + 1, G)]
    rest = d8_bufs[len(grouped) * G :]
    # warm EACH program that will be timed (independent ifs: when both
    # grouped and rest are non-empty -- the common case -- both the
    # grouped and the ungrouped d8 programs run in the timed loop)
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
    outs = [np.asarray(o) for o in pend]
    wall_d = time.perf_counter() - t0
    results["dispatch_only"] = {
        "chunk_batches": len(bufs),
        "i16_fallback_batches": len(i16_bufs),
        "wall_s": round(wall_d, 2),
        "samples_per_s": round(total_samples / wall_d, 1),
    }
    print(f"dispatch_only (same weather): {results['dispatch_only']}",
          flush=True)
    del outs

    out = os.path.join(REPO, "docs", "SOAK_r3.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", flush=True)
    import shutil

    shutil.rmtree(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
