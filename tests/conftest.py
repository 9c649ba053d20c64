"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
compile and execute without TPU hardware.  These env vars must be set
before jax is imported anywhere.
"""

import os
from pathlib import Path

# The axon sitecustomize pins JAX_PLATFORMS=axon and imports jax at
# interpreter startup, so env vars alone don't stick: override via the
# config API before any backend is initialised.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["AFESP_JAX_CACHE"] = ""  # don't litter the repo cache with CPU builds
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = Path(
    os.environ.get("AFESP_REFERENCE_DATA", "/root/reference/sample_data")
)


@pytest.fixture(scope="session")
def sample_data():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference sample_data not available")
    return REFERENCE_DATA


def fixture_dir(name: str) -> Path:
    return REFERENCE_DATA / name
