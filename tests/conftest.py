"""Test configuration: run JAX on a virtual 8-device CPU mesh.

A pytest plugin (jaxtyping) imports jax before this conftest runs, so
env vars alone are too late - jax captures JAX_PLATFORMS at import.
The backend itself is not initialised yet, so jax.config.update works.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
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
