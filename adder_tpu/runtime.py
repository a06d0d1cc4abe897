"""Runtime configuration: persistent XLA compilation cache.

The transcode interval graph is large (DEPTH-unrolled arena walk with
exact-rounding division); XLA's first compilation of it costs minutes on
both the CPU and TPU backends, while recompiles of supersets take seconds.
A persistent compilation cache makes every process after the first start in
seconds. Called on package import; override the location with
ADDER_TPU_XLA_CACHE, disable with ADDER_TPU_XLA_CACHE=0.
"""

from __future__ import annotations

import os
import pathlib

_configured = False


def host_cache_key() -> str:
    """Short key identifying the host CPU model.

    XLA:CPU AOT executables cached on one machine load on another with
    mismatched feature sets ("could lead to execution errors such as
    SIGILL") and were observed to produce 1-ulp-different division results,
    breaking bit-parity. Scoping the cache directory per host model avoids
    reusing foreign executables."""
    import hashlib
    import platform
    import re

    model = platform.processor() or platform.machine() or "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        m = re.search(r"model name\s*:\s*(.+)", info)
        if m:
            model = m.group(1)
        # Same model name does not imply same ISA surface (VMs mask
        # features); foreign AOT executables warn "could lead to
        # execution errors such as SIGILL". Key by the flag set too.
        f = re.search(r"flags\s*:\s*(.+)", info)
        if f:
            model += "|" + " ".join(sorted(f.group(1).split()))
    except OSError:
        pass
    # Two VM shapes of the same CPU family can still report identical
    # model+flags while LLVM target tuning differs (observed: AOT entries
    # with +prefer-no-scatter/-gather loading on a host without them).
    # The core count separates the shapes.
    model += f"|ncpu={os.cpu_count()}"
    return hashlib.sha1(model.encode()).hexdigest()[:12]


def configure_platform() -> None:
    """Pin the JAX platform from ADDER_TPU_PLATFORM, by config (not env):
    environments that pre-register an accelerator plugin at interpreter
    startup override JAX_PLATFORMS, so subprocesses (CLI tools under test)
    can only be steered reliably through jax.config. No-op once a backend
    is initialized."""
    plat = os.environ.get("ADDER_TPU_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def process_map_count() -> int:
    """Number of memory mappings of this process (0 if unknowable)."""
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def bound_jit_mappings(threshold: int = 40_000) -> bool:
    """Drop JAX's in-process executable caches when the process nears the
    kernel's mapping limit; returns True when a purge happened.

    Every XLA:CPU executable holds several anonymous JIT-code mappings for
    the life of the process (JAX's global caches keep all of them alive).
    A process that compiles thousands of distinct programs — a long test
    session, a long-lived transcoding service crossing many capacity
    steps — runs into `vm.max_map_count` (default 65530), at which point
    the next mmap fails and LLVM SIGSEGVs mid-compile (diagnosed on a
    full-suite run: 60k+ anonymous mappings, deterministic crash in
    backend_compile_and_load). Re-compiles after a purge are mostly disk
    loads thanks to the persistent compilation cache."""
    if process_map_count() < threshold:
        return False
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
    return True


def configure_compilation_cache() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    configure_platform()
    loc = os.environ.get("ADDER_TPU_XLA_CACHE")
    if loc == "0":
        return
    if not loc:
        loc = str(
            pathlib.Path(__file__).resolve().parent.parent
            / ".cache"
            / f"xla_{host_cache_key()}"
        )
    try:
        import jax

        pathlib.Path(loc).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail import over it
