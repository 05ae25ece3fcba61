"""flappie-serve: the long-lived server yields byte-identical records
to the one-shot CLI, isolates bad requests, and supports watch mode.

Outputs are compared across SUBPROCESSES with identical process config
(same contract as test_launch.py: XLA:CPU numerics are only pinned
between identically-configured processes, which is the deployment
contract anyway).
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = "/root/reference/src/test"


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    return env


@pytest.fixture(scope="module")
def serve_fixture(tmp_path_factory):
    """One short fast5 read + the one-shot CLI's output for it."""
    from flappie_tpu.io.crp import read_crp
    from flappie_tpu.signal.fast5 import write_single_read_fast5

    d = tmp_path_factory.mktemp("serve")
    raw = read_crp(f"{FIX}/raw_signal.crp").reshape(-1)
    f5 = d / "a.fast5"
    write_single_read_fast5(str(f5), raw[:9000], "serve-read-a")

    expected_path = d / "expected.fastq"
    proc = subprocess.run(
        [sys.executable, "-m", "flappie_tpu.cli.flappie",
         str(f5), "--output", str(expected_path)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    expected = expected_path.read_text()
    assert expected.startswith("@serve-read-a  ")
    return str(f5), expected


def test_serve_stdin_repeat_and_isolation(serve_fixture):
    """Two identical requests return identical records (the warm path
    really re-runs); a bogus request in between is isolated."""
    f5, expected = serve_fixture
    requests = f"{f5}\n/does/not/exist.fast5\n{f5}\n"
    proc = subprocess.run(
        [sys.executable, "-m", "flappie_tpu.cli.serve"],
        input=requests, cwd=REPO, env=_env(),
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout == expected + expected
    acks = [l for l in proc.stderr.splitlines() if l.startswith("flappie-serve:")]
    assert acks[0] == "flappie-serve: ready"
    done = [a for a in acks if " done " in a]
    assert len(done) == 3  # bogus request acks done with reads=0
    assert "reads=1 called=1" in done[0] and "reads=1 called=1" in done[2]
    assert "reads=0 called=0" in done[1]


def test_serve_watch_mode_atomic_outputs(serve_fixture, tmp_path):
    """Watch mode picks up files as they arrive, writes atomic
    per-request outputs, and stops on the STOP sentinel."""
    f5, expected = serve_fixture
    watch = tmp_path / "incoming"
    outdir = tmp_path / "called"
    watch.mkdir()
    proc = subprocess.Popen(
        [sys.executable, "-m", "flappie_tpu.cli.serve",
         "--watch", str(watch), "--output-dir", str(outdir),
         "--poll", "0.2"],
        cwd=REPO, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )
    try:
        # drop the read in AFTER the server started: tmp+rename so the
        # watcher never sees a partial file
        import shutil

        shutil.copy(f5, str(watch / ".a.fast5.tmp"))
        os.replace(str(watch / ".a.fast5.tmp"), str(watch / "a.fast5"))
        dest = outdir / "a.fastq"
        deadline = time.monotonic() + 600
        while not dest.exists() and time.monotonic() < deadline:
            assert proc.poll() is None, proc.stderr.read()[-2000:]
            time.sleep(0.2)
        assert dest.exists(), "watch mode never produced the output"
        assert dest.read_text() == expected
        assert not (outdir / "a.fastq.tmp").exists()
        (watch / "STOP").touch()
        out, err = proc.communicate(timeout=60)
    except Exception:
        proc.kill()
        raise
    assert proc.returncode == 0, err[-2000:]
    assert "stopping" in err


def test_serve_qcal_applies_remap(serve_fixture):
    """--qcal remaps the quality line exactly like qcal.apply_calibration
    and leaves every other record byte alone."""
    from flappie_tpu.qcal import apply_calibration

    f5, expected = serve_fixture
    proc = subprocess.run(
        [sys.executable, "-m", "flappie_tpu.cli.serve", "--qcal", "2.0:1.0"],
        input=f"{f5}\n", cwd=REPO, env=_env(),
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    header, seq, plus, qual = expected.splitlines()
    want = "\n".join([header, seq, plus, apply_calibration(qual, 2.0, 1.0)]) + "\n"
    assert proc.stdout == want


def test_watch_scan_stability_gating():
    """A file is ready only after its (size, mtime) signature has been
    stable for min_age of WALL time (not a poll count — polls are
    back-to-back whenever the previous poll produced work): growing
    files wait, renamed-in files go once they are old enough."""
    from flappie_tpu.cli.serve import watch_scan

    AGE = 1.0
    seen, pending = set(), {}
    # t=0: a.fast5 appears (atomic rename) -> pending, not ready
    assert watch_scan([("a", (100, 1))], seen, pending, 0.0, AGE) == []
    # t=0.01: unchanged but NOT old enough (back-to-back poll) -> waits
    assert watch_scan([("a", (100, 1))], seen, pending, 0.01, AGE) == []
    # t=1.2: unchanged and stable for >= min_age -> ready exactly once
    assert watch_scan([("a", (100, 1))], seen, pending, 1.2, AGE) == ["a"]
    assert "a" in seen and "a" not in pending
    # still listed, already seen -> nothing (idempotent)
    assert watch_scan([("a", (100, 1))], seen, pending, 2.0, AGE) == []

    # a growing file is never picked up while it grows: every signature
    # change resets its stability clock
    assert watch_scan([("b", (50, 5))], seen, pending, 2.0, AGE) == []
    assert watch_scan([("b", (80, 6))], seen, pending, 3.5, AGE) == []
    assert watch_scan([("b", (80, 7))], seen, pending, 5.0, AGE) == []  # mtime bump
    assert watch_scan([("b", (80, 7))], seen, pending, 5.5, AGE) == []  # too young
    assert watch_scan([("b", (80, 7))], seen, pending, 6.1, AGE) == ["b"]

    # two files stabilising at different times keep their own clocks
    assert watch_scan([("c", (1, 1)), ("d", (2, 1))], seen, pending, 10.0, AGE) == []
    assert watch_scan([("c", (1, 1)), ("d", (9, 2))], seen, pending, 11.1, AGE) == ["c"]
    assert watch_scan([("d", (9, 2))], seen, pending, 12.2, AGE) == ["d"]


def test_serve_output_dest_collision_and_tmp_cleanup(tmp_path):
    """Requests from different directories sharing a basename get
    distinct outputs; repeats of the SAME request keep their name; a
    failing request leaves no .tmp file behind."""
    from flappie_tpu.cli.serve import Server

    srv = Server.__new__(Server)  # skip the heavy Basecaller init
    srv._dest_owner = {}

    class A:
        output_dir = str(tmp_path)
        format = "fastq"

    srv.args = A()

    def fake_handle(request, out):
        out.write(f"rec:{request}\n")
        return 1, 1

    srv.handle = fake_handle
    _, _, d1 = srv.handle_to_dest("/run1/a.fast5")
    _, _, d2 = srv.handle_to_dest("/run2/a.fast5")
    assert d1 != d2 and os.path.exists(d1) and os.path.exists(d2)
    with open(d1) as fh:
        assert fh.read() == "rec:/run1/a.fast5\n"
    with open(d2) as fh:
        assert fh.read() == "rec:/run2/a.fast5\n"
    _, _, d1b = srv.handle_to_dest("/run1/a.fast5")  # idempotent
    assert d1b == d1

    def boom(request, out):
        out.write("partial")
        raise RuntimeError("injected")

    srv.handle = boom
    with pytest.raises(RuntimeError):
        srv.handle_to_dest("/run3/b.fast5")
    leftovers = [p.name for p in tmp_path.iterdir() if p.name.endswith(".tmp")]
    assert leftovers == []


def test_qcal_malformed_fails_before_basecalling(tmp_path):
    """A malformed --qcal pair is an argparse error BEFORE any expensive
    work (and before the input files are even touched)."""
    proc = subprocess.run(
        [sys.executable, "-m", "flappie_tpu.cli.flappie",
         "--qcal", "1.5", str(tmp_path / "missing.fast5")],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 2  # argparse error exit
    assert "slope:offset" in proc.stderr


def test_serve_rejects_bad_model():
    proc = subprocess.run(
        [sys.executable, "-m", "flappie_tpu.cli.serve", "--model", "nope"],
        input="", cwd=REPO, env=_env(),
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 1
    assert "Invalid Flappie model" in proc.stdout


def test_handle_to_dest_defers_publish_on_retry(tmp_path):
    """A zero-read attempt that WILL be retried must never publish its
    output file (ADVICE r3: appearance-triggered consumers must not
    ingest an empty result that is silently replaced by the retry)."""
    from flappie_tpu.cli.serve import Server

    srv = Server.__new__(Server)
    srv._dest_owner = {}

    class A:
        output_dir = str(tmp_path)
        format = "fastq"

    srv.args = A()

    def empty_handle(request, out):
        out.write("")  # zero reads called
        return 1, 0

    srv.handle = empty_handle
    n, called, dest = srv.handle_to_dest(
        "/run/x.fast5", publish_if=lambda n_, c_: c_ > 0
    )
    assert (n, called, dest) == (1, 0, None)
    assert list(tmp_path.iterdir()) == []  # nothing published, no tmp

    def good_handle(request, out):
        out.write("rec\n")
        return 1, 1

    srv.handle = good_handle
    n, called, dest = srv.handle_to_dest(
        "/run/x.fast5", publish_if=lambda n_, c_: c_ > 0
    )
    assert called == 1 and dest is not None and os.path.exists(dest)


def test_flappie_rejects_bad_temperature(tmp_path):
    """--temperature <= 0 is a user-facing error (not an assert that
    python -O strips)."""
    from flappie_tpu.cli import flappie as cli

    rc = cli.main(["--temperature", "0", str(tmp_path / "missing.fast5")])
    assert rc == 1
