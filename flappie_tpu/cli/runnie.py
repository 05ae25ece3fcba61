"""runnie-compatible CLI (reference: src/runnie.c).

Emits the ``.run`` text format: a ``# uuid`` line per read followed by
``base\\tshape\\tscale\\tdwell`` per called base.  Pipe through
``python -m flappie_tpu.cli.decode_runnie`` for FASTA (reference:
``runnie ... | decode_runnie.py``, RUNNIE.md:39-49).
"""

from __future__ import annotations

import argparse
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..basecall import bucket_length
from ..decode.runlength import rle_transpost, rle_viterbi, runs_from_path
from ..io.run_format import write_run_record
from ..models.config import get_model_config
from ..models.network import transitions
from ..models.params import init_synthetic, load_npz, validate
from ..signal.fast5 import read_raw
from ..signal.preprocess import normalise_signal, trim_and_segment
from .flappie import expand_files, segmentation_pair, trim_pair

MODEL = "rle_r941_native"


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only"))
def _device_runnie(params, signal, lengths, cfg, temperature, viterbi_only):
    out, nblocks = transitions(params, cfg, signal, lengths, temperature)
    if not viterbi_only:
        out = rle_transpost(out, nblocks, cfg.nbase)
    score, path = rle_viterbi(out, nblocks, cfg.nbase)
    return out, nblocks, score, path


def build_parser():
    p = argparse.ArgumentParser(
        prog="runnie", description="Runnie basecaller -- basecall from raw signal"
    )
    p.add_argument("files", nargs="+", metavar="fast5")
    p.add_argument("--delta", "-d", type=float, default=0.0, metavar="factor")
    p.add_argument("--limit", "-l", type=int, default=0, metavar="nreads")
    p.add_argument("--output", "-o", default=None, metavar="filename")
    p.add_argument("--prefix", "-p", default="", metavar="string")
    p.add_argument("--temperature", type=float, default=1.0, metavar="factor")
    p.add_argument("--trim", "-t", type=trim_pair, default=(200, 10), metavar="start:end")
    p.add_argument("--viterbi", "-v", dest="viterbi", action="store_true", default=False)
    p.add_argument("--no-viterbi", "--fb", dest="viterbi", action="store_false")
    p.add_argument("--licence", "--license", action="store_true", default=False)
    p.add_argument("--segmentation", type=segmentation_pair, default=(100, 0.0),
                   metavar="chunk:percentile")
    p.add_argument("--uuid", dest="uuid", action="store_true", default=True)
    p.add_argument("--no-uuid", dest="uuid", action="store_false")
    p.add_argument("--checkpoint", default=None, metavar="npz")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.licence:
        print("runnie-tpu: a TPU-native reimplementation of the Runnie basecaller.")
        print("Original Runnie is (c) Oxford Nanopore Technologies, Ltd (ONT Public Licence).")
        return 0

    cfg = get_model_config(MODEL)
    params = load_npz(args.checkpoint) if args.checkpoint else init_synthetic(cfg, seed=0)
    validate(params, cfg)
    params = jax.tree.map(jnp.asarray, params)

    files = expand_files(args.files)
    if args.limit > 0:
        files = files[: args.limit]

    out = open(args.output, "w") if args.output else sys.stdout
    trim_start, trim_end = args.trim
    varseg_chunk, varseg_thresh = args.segmentation

    for fn in files:
        rt = read_raw(fn, scale_to_pA=True)
        if rt.raw is None:
            print(f"No basecall returned for {fn}", file=sys.stderr)
            continue
        rt = trim_and_segment(rt, trim_start, trim_end, varseg_chunk, varseg_thresh)
        if not rt.valid:
            print(f"No basecall returned for {fn}", file=sys.stderr)
            continue
        normalise_signal(rt, args.delta)
        seg = rt.active()
        T = bucket_length(seg.size)
        buf = np.zeros((1, T), np.float32)
        buf[0, : seg.size] = seg
        mat, nblocks, score, path = _device_runnie(
            params,
            jnp.asarray(buf),
            jnp.asarray([seg.size], dtype=jnp.int32),
            cfg,
            args.temperature,
            args.viterbi,
        )
        nblk = int(np.asarray(nblocks)[0])
        runs = runs_from_path(
            np.asarray(mat)[0], np.asarray(path)[0], nblk, cfg.nbase
        )
        # Reference quirk: runnie parses --prefix/--uuid/--no-uuid but
        # the .run header is always "# <uuid>" with no prefix
        # (src/runnie.c:277 uses rt.uuid directly; args.prefix and
        # args.uuid are never read).  Replicated for output parity.
        write_run_record(out, rt.uuid, runs)
        out.flush()

    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
