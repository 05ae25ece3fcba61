"""Test configuration: run JAX on a virtual 8-device CPU mesh.

A pytest plugin (jaxtyping) imports jax before this conftest runs, so
env vars alone are too late - jax captures JAX_PLATFORMS at import.
The backend itself is not initialised yet, so jax.config.update works.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# hermeticity: in-process CLI tests must not point the GLOBAL jax
# compilation cache at the user's dir (and serializing XLA:CPU
# executables of the big fused programs has segfaulted);
# test_persistent_cache_knob overrides this explicitly
os.environ.setdefault("FLAPPIE_TPU_JAX_CACHE", "off")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    return REFERENCE


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; backend was initialised too early"
    )
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
