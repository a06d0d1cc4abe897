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


def configure_compilation_cache() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    loc = os.environ.get("ADDER_TPU_XLA_CACHE")
    if loc == "0":
        return
    if not loc:
        loc = str(pathlib.Path(__file__).resolve().parent.parent / ".cache" / "xla")
    try:
        import jax

        pathlib.Path(loc).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail import over it
