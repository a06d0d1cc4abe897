"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run against
8 virtual CPU devices, matching how the driver dry-runs multi-chip code.
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# CLI tools launched as subprocesses by tests read this in
# adder_tpu.runtime.configure_platform (a config-level pin; the env var
# alone is overridden by preregistered accelerator plugins)
os.environ.setdefault("ADDER_TPU_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pathlib

import jax

# The env var alone is not enough: environments that pre-register an
# accelerator plugin at interpreter startup (sitecustomize) override
# JAX_PLATFORMS, silently putting the suite on the accelerator. Pin the
# platform by config before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import pytest

# persistent XLA compilation cache: repeat test runs skip the ~40s scans.
# Keyed by host CPU model (see runtime.host_cache_key): XLA:CPU AOT
# executables from a different machine load with mismatched feature sets and
# produced off-by-1-ulp division results, breaking bit-parity assertions.
from adder_tpu.runtime import host_cache_key

jax.config.update(
    "jax_compilation_cache_dir", f"/root/.cache/jax_test_{host_cache_key()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_SAMPLES = pathlib.Path("/root/reference/adder-codec-rs/tests/samples")


@pytest.fixture(scope="session")
def samples_dir() -> pathlib.Path:
    if not REFERENCE_SAMPLES.is_dir():
        pytest.skip("reference sample fixtures unavailable")
    return REFERENCE_SAMPLES


# One pytest process compiles thousands of distinct XLA programs; each live
# executable holds several anonymous JIT-code mappings, and the suite was
# observed to segfault (LLVM, inside backend_compile_and_load) when the
# process crossed vm.max_map_count (65530). Purge JAX's executable caches
# whenever the mapping count nears the limit; the persistent compilation
# cache turns the recompiles into disk loads.
from adder_tpu.runtime import bound_jit_mappings


@pytest.fixture(autouse=True)
def _bound_process_mappings(request):
    yield
    import os as _os
    if _os.environ.get("ADDER_TPU_MAPS_LOG"):
        from adder_tpu.runtime import process_map_count
        with open(_os.environ["ADDER_TPU_MAPS_LOG"], "a") as f:
            f.write(f"{process_map_count()} {request.node.nodeid}\n")
    bound_jit_mappings()
