"""flappie-compatible CLI (reference: src/flappie.c:42-399).

Flag surface, defaults, glob/dir expansion and per-read fault isolation
mirror the reference; the execution model is batched: reads are
collected, bucketed and basecalled in device batches instead of one
process per read.

Weights: ``--checkpoint`` loads an npz checkpoint; without one, a
deterministic synthetic checkpoint is used (the reference's compiled-in
weights are git-LFS pointers in this source tree).
"""

from __future__ import annotations

import argparse
import glob as globmod
import os
import sys

from ..basecall import Basecaller
from ..io.fastx import OUTFORMATS, format_read
from ..io.trace_h5 import TraceWriter
from ..models.config import FLAPPIE_MODELS, MODELS
from ..signal.fast5 import read_raw

DEFAULT_MODEL = "r941_native"


def model_help_text(default_model: str = DEFAULT_MODEL, models=FLAPPIE_MODELS) -> str:
    lines = []
    for name in models:
        cfg = MODELS[name]
        tag = "(default)" if name == default_model else ""
        lines.append(f"{name:>10} : {cfg.description}  {tag}")
    return "\n".join(lines) + "\n"


def trim_pair(arg: str):
    parts = arg.split(":")
    start = int(parts[0])
    end = int(parts[1]) if len(parts) > 1 and parts[1] else start
    if start < 0 or end < 0:
        raise argparse.ArgumentTypeError("trim values must be >= 0")
    return start, end


def segmentation_pair(arg: str):
    parts = arg.split(":")
    if len(parts) != 2:
        raise argparse.ArgumentTypeError("--segmentation should be of form chunk:percentile")
    chunk = int(parts[0])
    thresh = float(parts[1]) / 100.0
    if not (0.0 < thresh < 1.0):
        raise argparse.ArgumentTypeError("percentile must be in (0, 100)")
    return chunk, thresh


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flappie",
        description="Flappie basecaller -- basecall from raw signal",
    )
    # nargs="*" so --licence/--version work with no inputs (the
    # reference's ctest runs them bare: CMakeLists.txt:165-173);
    # main() errors when files are required but absent
    p.add_argument("files", nargs="*", metavar="fast5", help="fast5 file or directory")
    from .. import __version__

    p.add_argument("--version", action="version",
                   version=f"flappie {__version__} (flappie-tpu)")
    p.add_argument("--delta", "-d", type=float, default=0.0, metavar="factor",
                   help="Use delta samples with scaling factor")
    p.add_argument("--format", "-f", default="fastq", metavar="format",
                   help="Format to output reads (fasta, fastq or sam)")
    p.add_argument("--limit", "-l", type=int, default=0, metavar="nreads",
                   help="Maximum number of reads to call (0 is unlimited)")
    p.add_argument("--model", "-m", default=DEFAULT_MODEL, metavar="name",
                   help='Model to use ("help" to list)')
    p.add_argument("--output", "-o", default=None, metavar="filename",
                   help="Write to file rather than stdout")
    p.add_argument("--prefix", "-p", default="", metavar="string",
                   help="Prefix to append to name of each read")
    p.add_argument("--reverse", "-r", dest="reverse", action="store_true", default=False,
                   help="Reverse output base calls")
    p.add_argument("--no-reverse", dest="reverse", action="store_false",
                   help="Don't reverse output base calls")
    p.add_argument("--temperature", type=float, default=1.0, metavar="factor",
                   help="Temperature for weights")
    p.add_argument("--trim", "-t", type=trim_pair, default=(200, 10), metavar="start:end",
                   help="Number of samples to trim, as start:end")
    p.add_argument("--trace", "-T", default=None, metavar="filename",
                   help="Dump trace to HDF5 file")
    p.add_argument("--licence", "--license", action="store_true", default=False,
                   help="Print licensing information")
    p.add_argument("--segmentation", type=segmentation_pair, default=(100, 0.0),
                   metavar="chunk:percentile",
                   help="Chunk size and percentile for variance based segmentation")
    p.add_argument("--viterbi", "-v", dest="viterbi", action="store_true", default=False,
                   help="Use viterbi decoding only")
    p.add_argument("--no-viterbi", "--fb", dest="viterbi", action="store_false",
                   help="Use forward-backward followed by viterbi")
    p.add_argument("--hdf5-compression", type=int, default=1, metavar="level",
                   help="Gzip compression level for HDF5 output (0:off, 1:quickest, 9:best)")
    p.add_argument("--hdf5-chunk", type=int, default=200, metavar="size",
                   help="Chunk size for HDF5 output")
    p.add_argument("--uuid", dest="uuid", action="store_true", default=True,
                   help="Output UUID")
    p.add_argument("--no-uuid", dest="uuid", action="store_false",
                   help="Output read file")
    # flappie-tpu extensions
    p.add_argument("--checkpoint", default=None, metavar="npz",
                   help="Model weights (npz checkpoint); synthetic if omitted")
    p.add_argument("--batch", type=int, default=32, metavar="B",
                   help="Maximum device batch size")
    p.add_argument("--chunk", type=int, default=None, metavar="samples",
                   help="Chunked fast path: reads longer than this are "
                        "split into overlapping chunks batched through one "
                        "fixed-shape device program and stitched at overlap "
                        "midpoints (default: 2560 blocks x model stride = "
                        "12800 at stride 5; 0 disables - the full-read "
                        "serial path is the byte-parity reference)")
    p.add_argument("--overlap", type=int, default=1600, metavar="samples",
                   help="Chunk overlap; each stitched block sits at least "
                        "overlap/2 samples from its chunk's edges")
    p.add_argument("--chunk-batch", type=int, default=256, metavar="N",
                   help="Maximum chunks per device batch on the chunked path")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="Shard device batches data-parallel over the first N "
                        "local devices (0/1: single device).  Replaces the "
                        "reference's `parallel -P N -X flappie` fan-out; for "
                        "multi-host runs use python -m "
                        "flappie_tpu.parallel.launch")
    p.add_argument("--multi", action="store_true", default=False,
                   help="Basecall every read in multi-read fast5 files "
                        "(the reference only reads the first)")
    p.add_argument("--fast", action="store_true", default=False,
                   help="Speed mode: stream the recurrence layer tensors "
                        "in bfloat16 (FLAPPIE_TPU_RNN_STREAM=bf16; ~23%% "
                        "less device time at chunk shapes, measured "
                        "docs/BENCH_e2e_r3.json).  Outputs shift within a "
                        "measured accuracy band instead of being bit-exact "
                        "to the reference: ~98.9%% median identity vs the "
                        "exact stream, max phred shift 2, over 512 reads "
                        "per model family (tools/fast_mode_accuracy_r4.py "
                        "-> docs/ACCURACY_fast_r4.json).  Delta-mode "
                        "reads (--delta, e.g. dRNA) sit in a wider band "
                        "(p5 ~95.4%% vs ~98.3%%) born in the bf16 cast of "
                        "the delta-normalised stream -- mechanism matrix "
                        "in docs/ACCURACY_fast_r5.json; use the default "
                        "exact stream when that band matters")
    p.add_argument("--qcal", default=None, metavar="slope:offset|file",
                   help="Calibrate quality scores post-hoc: either "
                        "q' = slope*q + offset per base, or the path of "
                        "a QCAL JSON artifact with per-model isotonic "
                        "tables (docs/QCAL_r4.json; the entry matching "
                        "--model applies).  The reference's qualities "
                        "are explicitly uncalibrated (its "
                        "README.md:231-234).  Fit with "
                        "tools/qscore_calibrate.py against known-truth "
                        "reads; omit for raw model qualities (the "
                        "byte-parity default)")
    p.add_argument("--jax-profile", default=None, metavar="dir",
                   help="Capture a JAX/XLA device profile of the basecalling "
                        "loop into this directory (view with TensorBoard or "
                        "xprof; the reference's perf story is ad-hoc gprof)")
    return p


def jax_profiler_trace(logdir: str):
    """jax.profiler.trace context for --jax-profile."""
    import jax

    return jax.profiler.trace(logdir, create_perfetto_link=False)


def expand_files(args_files):
    """Directory -> dir/*.fast5 glob; warn on misses (flappie.c:338-362)."""
    out = []
    for f in args_files:
        pattern = os.path.join(f, "*.fast5") if os.path.isdir(f) else f
        matches = sorted(globmod.glob(pattern))
        if not matches:
            print(
                f'File or directory "{f}" does not exist or no fast5 files found.',
                file=sys.stderr,
            )
            continue
        out.extend(matches)
    return out


def main(argv=None) -> int:
    from . import enable_persistent_cache, honor_jax_platforms

    honor_jax_platforms()
    parser = build_parser()
    args = parser.parse_args(argv)

    if args.licence:
        print("flappie-tpu: a TPU-native reimplementation of the Flappie basecaller.")
        print("Original Flappie is (c) Oxford Nanopore Technologies, Ltd (ONT Public Licence).")
        return 0

    if args.model.lower() == "help":
        sys.stdout.write(model_help_text())
        return 0
    if args.model not in MODELS:
        print(f'Invalid Flappie model "{args.model}".')
        sys.stdout.write(model_help_text())
        return 1
    if args.format not in OUTFORMATS:
        print(f'Unrecognised output format "{args.format}".', file=sys.stderr)
        return 1
    if not args.temperature > 0.0:
        print(f"Invalid temperature {args.temperature} -- must be > 0.",
              file=sys.stderr)
        return 1
    qcal = None
    if args.qcal:
        # validate up front: a malformed pair/file must fail BEFORE the
        # expensive basecalling run, not after it
        from ..qcal import parse_qcal

        try:
            qcal = parse_qcal(args.qcal, model=args.model)
        except ValueError as exc:
            parser.error(str(exc))
    if not args.files:
        parser.error("the following arguments are required: fast5")
    # after the early exits: resolving the backend for the CPU gate
    # must not make --help/--licence connect to the device
    enable_persistent_cache()

    files = expand_files(args.files)
    if args.limit > 0:
        files = files[: args.limit]

    if args.fast:
        # must be set before the first trace: the kernels read the
        # policy at trace time (fresh processes only, like the C's
        # compile-time BLAS selection)
        os.environ.setdefault("FLAPPIE_TPU_RNN_STREAM", "bf16")

    caller_kw = dict(
        model=args.model,
        checkpoint=args.checkpoint,
        temperature=args.temperature,
        viterbi_only=args.viterbi,
        compute_trace=args.trace is not None,
        chunk=args.chunk,
        overlap=args.overlap,
        chunk_batch=args.chunk_batch,
    )
    if args.mesh and args.mesh > 1:
        import jax

        from ..parallel.mesh import make_mesh
        from ..parallel.pipeline import DistributedBasecaller

        if args.mesh > len(jax.devices()):
            print(
                f"--mesh {args.mesh} exceeds the {len(jax.devices())} "
                "visible devices", file=sys.stderr,
            )
            return 1
        mesh = make_mesh(n_data=args.mesh, n_model=1,
                         devices=jax.devices()[: args.mesh])
        caller = DistributedBasecaller(mesh=mesh, **caller_kw)
    else:
        caller = Basecaller(**caller_kw)

    out = open(args.output, "w") if args.output else sys.stdout

    from .. import timing

    # Prewarm the chunked production program on a background thread so
    # its per-process trace + compile-cache load (~3 s, the largest
    # fixed cost of a warm run -- docs/SOAK_r4.json) overlaps fast5
    # reading and preprocessing instead of serialising inside the
    # first real dispatch.  jit tracing is internally locked, so the
    # real dispatch shares (or waits for) this trace, never repeats
    # it.  FLAPPIE_TPU_PREWARM: auto (TPU only, default), 1 (always),
    # 0 (never).
    warm_thread = None
    prewarm = os.environ.get("FLAPPIE_TPU_PREWARM", "auto")
    if prewarm != "0" and len(files) > 1 and caller.chunk:
        import jax as _jax

        if prewarm == "1" or _jax.default_backend() == "tpu":
            import threading

            warm_thread = threading.Thread(
                target=caller.prewarm_chunked, daemon=True
            )
            warm_thread.start()

    reads, names, fnames = [], [], []
    if args.multi:
        with timing.phase("fast5_read"):
            for fn in files:
                from ..signal.fast5 import iter_reads

                try:
                    rts = list(iter_reads(fn, scale_to_pA=True))
                except Exception:
                    rts = []
                if not rts:
                    rts = [read_raw(fn, scale_to_pA=True)]
                for rt in rts:
                    reads.append(rt)
                    names.append(os.path.basename(fn))
                    fnames.append(fn)
    else:
        # lazy reads: one per file, materialised on the preprocessing
        # wave's background thread so fast5 IO overlaps dispatch
        # (read_raw returns an invalid RawTable on failure, so fault
        # isolation is unchanged)
        for fn in files:
            reads.append(lambda fn=fn: read_raw(fn, scale_to_pA=True))
            names.append(os.path.basename(fn))
            fnames.append(fn)
    if args.limit > 0:
        reads, names, fnames = reads[: args.limit], names[: args.limit], fnames[: args.limit]

    trim_start, trim_end = args.trim
    varseg_chunk, varseg_thresh = args.segmentation

    import contextlib

    profile_ctx = (
        jax_profiler_trace(args.jax_profile)
        if args.jax_profile
        else contextlib.nullcontext()
    )
    with profile_ctx:
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

    from ..qcal import apply_qcal

    with timing.phase("format_write"):
        with TraceWriter(args.trace, args.hdf5_chunk, args.hdf5_compression) as tracer:
            for fn, name, res in zip(fnames, names, results):
                if res is None:
                    print(f"No basecall returned for {fn}", file=sys.stderr)
                    continue
                res = apply_qcal(res, qcal)
                out.write(
                    format_read(args.format, res.uuid, name, args.uuid, args.prefix, res)
                )
                out.flush()
                tracer.write(res.uuid if args.uuid else name, res)

    if out is not sys.stdout:
        out.close()
    if warm_thread is not None:
        # When the run used the chunked program the prewarm thread
        # shared its trace and is already done (or finishing its ~1 s
        # dummy dispatch).  If the run never needed it (all-short
        # corpus), don't block exit on a possibly-queued compile: give
        # it a bounded window, then let the daemon thread die with the
        # process (the orphaned compile completes server-side).
        warm_thread.join(timeout=30)
    # FLAPPIE_TPU_PHASES=path|stderr: dump the per-phase wall-clock
    # accounting (fast5 read / preprocess / encode_d8 / pack / dispatch
    # / collect / format) so any run can account for every second
    timing.maybe_dump()
    if args.mesh and args.mesh > 1 and hasattr(caller, "wire_summary"):
        # one-line dispatch observability: which wires ran and over how
        # many devices each dispatch actually spanned (guards against
        # the silent-unsharded failure mode)
        import json as _json

        print(f"flappie-mesh: {_json.dumps(caller.wire_summary())}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
