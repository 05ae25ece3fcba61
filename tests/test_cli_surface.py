"""CLI smoke parity with the reference's ctest tier.

The reference registers `flappie --licence`, `flappie --help`,
`flappie --version` (and the runnie trio) as ctests, all invoked with
NO input files (reference CMakeLists.txt:162-173).  These must exit 0
and print without touching jax device state.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(mod, *argv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", f"flappie_tpu.cli.{mod}", *argv],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )


@pytest.mark.parametrize("mod,name", [("flappie", "flappie"), ("runnie", "runnie")])
def test_licence_help_version_need_no_files(mod, name):
    p = _run(mod, "--licence")
    assert p.returncode == 0, p.stderr[-500:]
    assert "Oxford Nanopore" in p.stdout

    p = _run(mod, "--help")
    assert p.returncode == 0
    assert p.stdout.startswith(f"usage: {name}")

    p = _run(mod, "--version")
    assert p.returncode == 0
    assert p.stdout.startswith(f"{name} ")


@pytest.mark.parametrize("mod", ["flappie", "runnie"])
def test_no_files_still_errors(mod):
    p = _run(mod)
    assert p.returncode == 2
    assert "required: fast5" in p.stderr
