"""Trace/summary HDF5 output, format-compatible with the reference.

Reference: src/fast5_interface.c:59-197,320-349.  Per-read group (named
by uuid or read filename) containing:
- ``signal``: float32 [nsample] - the trimmed (normalised) signal
- ``trace``: uint8 [nblk+1, nstate] - state occupancy probabilities x255

Both datasets use gzip+shuffle chunked compression when
compression_level > 0 (chunk = (chunk_size,) / (chunk_size, nstate)).
"""

from __future__ import annotations

from typing import Optional

import h5py
import numpy as np

from .fastx import BasecallResult


class TraceWriter:
    """Equivalent of open_or_create_hdf5 + write_summary."""

    def __init__(self, filename: Optional[str], chunk_size: int = 200, compression_level: int = 1):
        self._fh = h5py.File(filename, "a") if filename else None
        self.chunk_size = chunk_size
        self.compression_level = compression_level

    def write(self, readname: str, res: BasecallResult) -> None:
        if self._fh is None or res.trace is None:
            return
        if readname in self._fh:  # re-run into an existing file, or a
            del self._fh[readname]  # duplicated read id: last write wins
        grp = self._fh.create_group(readname)
        kw = {}
        if self.compression_level > 0:
            kw = dict(compression="gzip", compression_opts=self.compression_level, shuffle=True)
        sig = np.asarray(res.signal, np.float32)
        grp.create_dataset(
            "signal",
            data=sig,
            dtype="<f4",
            chunks=(min(self.chunk_size, max(sig.size, 1)),) if kw else None,
            **kw,
        )
        trace = np.asarray(res.trace, np.uint8)
        grp.create_dataset(
            "trace",
            data=trace,
            dtype="<u1",
            chunks=(min(self.chunk_size, trace.shape[0]), trace.shape[1]) if kw else None,
            **kw,
        )

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
