"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run against
8 virtual CPU devices, matching how the driver dry-runs multi-chip code.
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pathlib

import jax
import pytest

# persistent XLA compilation cache: repeat test runs skip the ~40s scans
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_SAMPLES = pathlib.Path("/root/reference/adder-codec-rs/tests/samples")


@pytest.fixture(scope="session")
def samples_dir() -> pathlib.Path:
    if not REFERENCE_SAMPLES.is_dir():
        pytest.skip("reference sample fixtures unavailable")
    return REFERENCE_SAMPLES
