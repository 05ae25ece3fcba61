"""runnie-compatible CLI (reference: src/runnie.c).

Emits the ``.run`` text format: a ``# uuid`` line per read followed by
``base\\tshape\\tscale\\tdwell`` per called base.  Pipe through
``python -m flappie_tpu.cli.decode_runnie`` for FASTA (reference:
``runnie ... | decode_runnie.py``, RUNNIE.md:39-49).
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..basecall import _unpack_i16, bucket_length
from ..decode.runlength import rle_transpost, rle_viterbi, runs_from_selected
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
    """Batched forward + RLE decode.

    Only the path and the path-selected shape/scale weights leave the
    device (~9 bytes/block) -- runs_from_selected rebuilds the .run
    records from them bit-for-bit.
    """
    out, nblocks = transitions(params, cfg, signal, lengths, temperature)
    if not viterbi_only:
        out = rle_transpost(out, nblocks, cfg.nbase)
    score, path = rle_viterbi(out, nblocks, cfg.nbase)
    base = jnp.where(path < cfg.nbase, path, path - cfg.nbase)
    shape_sel = jnp.take_along_axis(out, base[..., None], axis=-1)[..., 0]
    scale_sel = jnp.take_along_axis(out, (cfg.nbase + base)[..., None], axis=-1)[..., 0]
    return nblocks, score, path.astype(jnp.int8), shape_sel, scale_sel


def _pack_runnie_out(nblocks, path, shape_sel, scale_sel):
    B, T = path.shape
    bc = jax.lax.bitcast_convert_type
    return jnp.concatenate(
        [
            path.astype(jnp.uint8),
            bc(shape_sel, jnp.uint8).reshape(B, 4 * T),
            bc(scale_sel, jnp.uint8).reshape(B, 4 * T),
            bc(nblocks.astype(jnp.int32), jnp.uint8).reshape(B, 4),
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only"))
def _device_runnie_packed(params, buf, cfg, temperature, viterbi_only):
    """One [B, bucket+4] f32 array in, one byte matrix out (every
    transfer through a tunneled device is a blocking round trip):
    [B, T path | 4T shape f32 | 4T scale f32 | 4 nblocks i32]."""
    sig = buf[:, :-4]
    lengths = buf[:, -4].astype(jnp.int32)
    nblocks, _, path, shape_sel, scale_sel = _device_runnie(
        params, sig, lengths, cfg, temperature, viterbi_only
    )
    return _pack_runnie_out(nblocks, path, shape_sel, scale_sel)


@partial(jax.jit, static_argnames=("cfg", "temperature", "viterbi_only"))
def _device_runnie_packed_i16(params, buf, cfg, temperature, viterbi_only):
    """Halved-bytes twin of _device_runnie_packed: one [B, bucket+16]
    int16 array in (original ADC counts + bitcast calibration and
    normalisation scalars), normalised on device by the exact host
    pipeline (basecall._unpack_i16); same byte matrix out."""
    sig, lengths, _qlo, _qhi = _unpack_i16(buf)
    nblocks, _, path, shape_sel, scale_sel = _device_runnie(
        params, sig, lengths, cfg, temperature, viterbi_only
    )
    return _pack_runnie_out(nblocks, path, shape_sel, scale_sel)


def _unpack_runnie(buf: np.ndarray, T: int):
    path = buf[:, :T].astype(np.int8)
    shape_sel = buf[:, T : 5 * T].copy().view(np.float32)
    scale_sel = buf[:, 5 * T : 9 * T].copy().view(np.float32)
    nblocks = buf[:, 9 * T : 9 * T + 4].copy().view(np.int32)[:, 0]
    return nblocks, path, shape_sel, scale_sel


def build_parser():
    p = argparse.ArgumentParser(
        prog="runnie", description="Runnie basecaller -- basecall from raw signal"
    )
    # nargs="*" so --licence/--version work with no inputs (the
    # reference's ctest runs them bare: CMakeLists.txt:165-173)
    p.add_argument("files", nargs="*", metavar="fast5")
    from .. import __version__

    p.add_argument("--version", action="version",
                   version=f"runnie {__version__} (flappie-tpu)")
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
    p.add_argument("--batch", type=int, default=32, metavar="B",
                   help="Maximum device batch size (the reference decodes "
                        "one read per process; here reads bucket and batch "
                        "through the engine like the flappie CLI)")
    p.add_argument("--fast", action="store_true", default=False,
                   help="Speed mode: stream the recurrence layer tensors in "
                        "bfloat16 (FLAPPIE_TPU_RNN_STREAM=bf16); outputs "
                        "shift within the measured band (~98.3%% median "
                        "identity over 512 RLE reads, "
                        "docs/ACCURACY_fast_r4.json) instead of being "
                        "bit-exact (see the flappie CLI's --fast)")
    return p


def main(argv=None) -> int:
    from . import enable_persistent_cache, honor_jax_platforms

    honor_jax_platforms()
    args = build_parser().parse_args(argv)
    if args.licence:
        print("runnie-tpu: a TPU-native reimplementation of the Runnie basecaller.")
        print("Original Runnie is (c) Oxford Nanopore Technologies, Ltd (ONT Public Licence).")
        return 0
    if not args.files:
        build_parser().error("the following arguments are required: fast5")
    # after the early exits: the CPU cache gate resolves the backend,
    # which must not happen for --help/--licence
    enable_persistent_cache()

    if args.fast:
        # must be set before the first trace: the kernels read the
        # policy at trace time (fresh processes only)
        os.environ.setdefault("FLAPPIE_TPU_RNN_STREAM", "bf16")

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

    # Preprocess every read, bucket by padded length, batch within
    # bucket (the flappie-CLI execution model; the reference decodes
    # one read per process).  Results are written in input order.
    prepped = []  # (input position, rt)
    order = []  # per input position: rt or None
    for fn in files:
        rt = read_raw(fn, scale_to_pA=True)
        if rt.raw is not None:
            rt = trim_and_segment(rt, trim_start, trim_end, varseg_chunk, varseg_thresh)
        if rt.raw is None or not rt.valid:
            print(f"No basecall returned for {fn}", file=sys.stderr)
            order.append(None)
            continue
        normalise_signal(rt, args.delta)
        prepped.append((len(order), rt))
        order.append(rt)

    results = {}  # input position -> list[RunRecord]
    by_bucket: dict = {}
    for pos, rt in prepped:
        by_bucket.setdefault(bucket_length(rt.active().size), []).append((pos, rt))

    from ..basecall import Basecaller, _Pipeline, _i16_capable, _upload_mode

    def _dispatch(items, bucket):
        B = len(items)
        lengths = np.zeros(B, np.int32)
        zeros = np.zeros(B, np.int32)
        if _upload_mode() != "f32" and all(_i16_capable(rt) for _, rt in items):
            adc = np.zeros((B, bucket), np.int16)
            scal = np.zeros((B, 4), np.float32)
            scal[:, 3] = 1.0  # pad rows: mad=1 -> exact zero signal
            for j, (_, rt) in enumerate(items):
                L = rt.end - rt.start
                adc[j, :L] = rt.adc[rt.start : rt.end]
                lengths[j] = L
                scal[j] = (rt.cal[0], rt.cal[1], rt.norm[0], rt.norm[1])
            buf = Basecaller.pack_chunk_inputs_i16(adc, lengths, zeros, zeros, scal)
            return (items, bucket), _device_runnie_packed_i16(
                params, jnp.asarray(buf), cfg, args.temperature, args.viterbi
            )
        sig = np.zeros((B, bucket), np.float32)
        for j, (_, rt) in enumerate(items):
            seg = rt.active()
            sig[j, : seg.size] = seg
            lengths[j] = seg.size
        buf = Basecaller.pack_chunk_inputs(sig, lengths, zeros, zeros)
        return (items, bucket), _device_runnie_packed(
            params, jnp.asarray(buf), cfg, args.temperature, args.viterbi
        )

    def _collect(tag, out):
        items, bucket = tag
        T = -(-bucket // cfg.total_stride)
        nblocks, path, shape_sel, scale_sel = _unpack_runnie(out, T)
        for j, (pos, _) in enumerate(items):
            results[pos] = runs_from_selected(
                path[j], shape_sel[j], scale_sel[j], int(nblocks[j]), cfg.nbase
            )

    pipe = _Pipeline(_collect)
    for bucket, items in sorted(by_bucket.items()):
        for ofs in range(0, len(items), args.batch):
            pipe.push(*_dispatch(items[ofs : ofs + args.batch], bucket))
    pipe.drain()

    for pos, rt in enumerate(order):
        if rt is None or pos not in results:
            continue
        # Reference quirk: runnie parses --prefix/--uuid/--no-uuid but
        # the .run header is always "# <uuid>" with no prefix
        # (src/runnie.c:277 uses rt.uuid directly; args.prefix and
        # args.uuid are never read).  Replicated for output parity.
        write_run_record(out, rt.uuid, results[pos])
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
