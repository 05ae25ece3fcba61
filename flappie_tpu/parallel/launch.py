"""Multi-process / multi-host basecalling launcher.

The reference scales by ``find reads/ | parallel -P $(nproc) -X
flappie`` (/root/reference/README.md:81-83): independent processes,
outputs concatenated in whatever order they finish.  This launcher is
the productised TPU equivalent:

- one worker process per host (or per device group), each driving its
  LOCAL devices through the batched (and chunked) device pipeline --
  reads are independent, so inference needs no cross-host collectives;
  jax.distributed/ICI stays reserved for the training and
  tensor-parallel paths (parallel/mesh.py, tests/distributed_worker.py)
- deterministic STRIDED read assignment: worker r handles input files
  [r::nproc] of the expanded file list (every worker expands the same
  list, so the assignment needs no coordination)
- input-order output merge: workers write indexed part files; the
  launcher merges records back into the exact order a single process
  would have produced (unlike the reference's arbitrary concatenation)

Usage:

    # spawn N local workers and merge:
    python -m flappie_tpu.parallel.launch --nproc N -- \
        --model r941_native --output out.fastq reads/

    # or run one worker per host yourself (e.g. under slurm/k8s):
    python -m flappie_tpu.parallel.launch --nproc N --rank R -- ...
    python -m flappie_tpu.parallel.launch --merge N -- ...   # afterwards

Per-worker trace HDF5 files are sharded as <trace>.partR (the
reference does the same with --trace trace_{%}, RUNNIE.md:47-49).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import List, Optional


def _split_argv(argv):
    if "--" in argv:
        k = argv.index("--")
        return argv[:k], argv[k + 1 :]
    return argv, []


def build_parser():
    p = argparse.ArgumentParser(
        prog="flappie-launch",
        description="Run flappie workers across processes/hosts and merge "
        "their outputs in input order.  Arguments after `--` go to the "
        "flappie CLI unchanged.",
    )
    p.add_argument("--nproc", type=int, default=None,
                   help="Total number of workers")
    p.add_argument("--rank", type=int, default=None,
                   help="Run as worker RANK only (multi-host mode; merge "
                        "separately with --merge)")
    p.add_argument("--merge", action="store_true", default=False,
                   help="Merge existing part files (after all workers exit)")
    p.add_argument("--partdir", default=None,
                   help="Directory for part files (default: alongside the "
                        "output file, or CWD)")
    return p


def _part_path(partdir: str, rank: int) -> str:
    return os.path.join(partdir, f"flappie_part{rank}.jsonl")


def worker(rank: int, nproc: int, flappie_argv: List[str], partdir: str) -> int:
    """Basecall this worker's strided file shard; write an indexed part
    file so the merge step can restore input order."""
    from ..cli import flappie as cli

    args = cli.build_parser().parse_args(flappie_argv)
    if args.model not in cli.MODELS or args.format not in cli.OUTFORMATS:
        print("bad --model/--format", file=sys.stderr)
        return 1

    files = cli.expand_files(args.files)
    if args.limit > 0:
        files = files[: args.limit]
    my = [(gi, fn) for gi, fn in enumerate(files) if gi % nproc == rank]

    caller = cli.Basecaller(
        model=args.model,
        checkpoint=args.checkpoint,
        temperature=args.temperature,
        viterbi_only=args.viterbi,
        compute_trace=args.trace is not None,
        chunk=args.chunk,
        overlap=args.overlap,
        chunk_batch=args.chunk_batch,
    )

    from ..signal.fast5 import read_raw

    reads, idx = [], []
    for gi, fn in my:
        if args.multi:
            from ..signal.fast5 import iter_reads

            try:
                rts = list(iter_reads(fn, scale_to_pA=True))
            except Exception:
                rts = []
            if not rts:
                rts = [read_raw(fn, scale_to_pA=True)]
        else:
            rts = [read_raw(fn, scale_to_pA=True)]
        for ri, rt in enumerate(rts):
            reads.append(rt)
            idx.append((gi, ri, fn))

    trim_start, trim_end = args.trim
    varseg_chunk, varseg_thresh = args.segmentation
    results = caller.basecall_raw_tables(
        reads,
        trim_start=trim_start,
        trim_end=trim_end,
        varseg_chunk=varseg_chunk,
        varseg_thresh=varseg_thresh,
        delta=args.delta,
        reverse=args.reverse,
        max_batch=args.batch,
    )

    from ..io.fastx import format_read
    from ..io.trace_h5 import TraceWriter

    trace_path = f"{args.trace}.part{rank}" if args.trace else None
    os.makedirs(partdir, exist_ok=True)
    with open(_part_path(partdir, rank), "w") as part, TraceWriter(
        trace_path, args.hdf5_chunk, args.hdf5_compression
    ) as tracer:
        for (gi, ri, fn), res in zip(idx, results):
            if res is None:
                print(f"No basecall returned for {fn}", file=sys.stderr)
                continue
            name = os.path.basename(fn)
            rec = format_read(
                args.format, res.uuid, name, args.uuid, args.prefix, res
            )
            part.write(json.dumps({"i": [gi, ri], "rec": rec}) + "\n")
            tracer.write(res.uuid if args.uuid else name, res)
    return 0


def merge(nproc: int, flappie_argv: List[str], partdir: str) -> int:
    """Concatenate part files in global (file, read) input order; merge
    per-worker trace HDF5 shards into the single requested file (an
    improvement over the reference, which leaves traces sharded one
    file per process, RUNNIE.md:47-49)."""
    from ..cli import flappie as cli

    args = cli.build_parser().parse_args(flappie_argv)
    records = []
    for r in range(nproc):
        path = _part_path(partdir, r)
        if not os.path.exists(path):
            print(f"missing part file {path}", file=sys.stderr)
            return 1
        with open(path) as fh:
            for line in fh:
                d = json.loads(line)
                records.append((tuple(d["i"]), d["rec"]))
    records.sort(key=lambda t: t[0])
    out = open(args.output, "w") if args.output else sys.stdout
    for _, rec in records:
        out.write(rec)
    if out is not sys.stdout:
        out.close()
    for r in range(nproc):
        os.remove(_part_path(partdir, r))

    if args.trace:
        import h5py

        with h5py.File(args.trace, "w") as dst:
            for r in range(nproc):
                shard = f"{args.trace}.part{r}"
                if not os.path.exists(shard):
                    continue
                with h5py.File(shard, "r") as src:
                    for name in src:
                        src.copy(src[name], dst, name)
                os.remove(shard)
    return 0


def main(argv=None) -> int:
    from ..cli import honor_jax_platforms

    honor_jax_platforms()  # workers bypass cli.main(), so re-apply here
    argv = sys.argv[1:] if argv is None else argv
    own, flappie_argv = _split_argv(argv)
    args = build_parser().parse_args(own)
    if args.nproc is None or args.nproc < 1:
        print("--nproc is required", file=sys.stderr)
        return 2
    partdir = args.partdir or os.getcwd()

    if args.merge:
        return merge(args.nproc, flappie_argv, partdir)
    if args.rank is not None:
        return worker(args.rank, args.nproc, flappie_argv, partdir)

    # spawn-local mode: one subprocess per worker, then merge
    procs = []
    for r in range(args.nproc):
        cmd = [
            sys.executable, "-m", "flappie_tpu.parallel.launch",
            "--nproc", str(args.nproc), "--rank", str(r),
            "--partdir", partdir, "--",
        ] + flappie_argv
        procs.append(subprocess.Popen(cmd))
    rc = 0
    for p in procs:
        rc |= p.wait()
    if rc:
        return rc
    return merge(args.nproc, flappie_argv, partdir)


if __name__ == "__main__":
    sys.exit(main())
