"""Trace viewer: plot signal + per-state flip-flop probabilities.

Equivalent of misc/trace_flipflop.py for flappie-tpu trace HDF5 files
(and Guppy-style fast5 trace tables): top panel the normalised signal,
bottom panel the per-base state-occupancy bands - flip states solid,
flop states dashed (or negated with --flipflops).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

BASE = "ACGTZ"
COLOURS = {
    "classic": {"A": "green", "C": "blue", "G": "black", "T": "red", "Z": "purple"},
    "friendly": {"A": "#1b9e77", "C": "#7570b3", "G": "#666666", "T": "#d95f02", "Z": "#e7298a"},
}


def build_parser():
    p = argparse.ArgumentParser(prog="trace_flipflop", description=__doc__)
    p.add_argument("--colours", "--colors", default="classic", choices=sorted(COLOURS))
    p.add_argument("--depop", default=None, type=float,
                   help="Zero signal values with magnitude above threshold")
    p.add_argument("--limit", default=10, type=int, help="Maximum reads to plot")
    p.add_argument("--flipflops", default=False, action="store_true",
                   help="Plot the flop states as negative probabilities")
    p.add_argument("--output", default=None,
                   help="Write plots to PNG files with this prefix instead of showing")
    p.add_argument("hdf5")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import h5py
    import matplotlib

    if args.output:
        matplotlib.use("Agg")
    import matplotlib.pyplot as pp

    colours = COLOURS[args.colours]
    nplotted = 0
    with h5py.File(args.hdf5, "r") as h5:
        for read in list(h5.keys()):
            if nplotted >= args.limit:
                break
            try:
                sig = h5[read]["signal"][()]
                trace = h5[read]["trace"][()] / 255.0
            except KeyError:
                print(f"Error: failed to read signal and trace for {read}", file=sys.stderr)
                continue
            nbase = trace.shape[1] // 2
            assert nbase * 2 == trace.shape[1], "Trace table incorrect shape"
            if args.flipflops:
                trace[:, nbase:] *= -1
            if args.depop is not None:
                sig = np.where(np.abs(sig) > args.depop, 0.0, sig)
            down = round(len(sig) / float(len(trace)))

            fig = pp.figure(figsize=(12, 6))
            ax1 = pp.subplot(211)
            pp.title(read)
            pp.ylabel("Normalised signal")
            pp.plot(np.arange(len(sig)), sig, color="grey", linewidth=0.5)
            pp.subplot(212, sharex=ax1)
            pp.xlabel("time (samples)")
            pp.ylabel("State probability")
            x2 = down * np.arange(len(trace))
            for i in range(nbase):
                c = colours[BASE[i]]
                pp.fill_between(x2, trace[:, i], color=c, alpha=0.3)
                pp.fill_between(x2, trace[:, i + nbase], color=c, alpha=0.3)
                pp.plot(x2, trace[:, i], color=c)
                pp.plot(x2, trace[:, i + nbase], color=c, linestyle="dashed")
            pp.grid()
            if args.output:
                fname = f"{args.output}{read}.png"
                fig.savefig(fname, dpi=100)
                print(f"wrote {fname}")
                pp.close(fig)
            else:
                pp.show()
            nplotted += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
