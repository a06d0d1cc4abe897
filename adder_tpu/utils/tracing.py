"""Per-stage tracing / profiling surface.

The reference has only ad-hoc `Instant` prints (SURVEY section 5: ADU
decompression ns in compressed/stream.rs:393-409, simulproc ms/frame,
adder-viz runtime plots). This module is the structured equivalent for the
TPU build:

- `stage(name)`: context manager accumulating wall time + call counts per
  stage into a process-global registry (thread-safe).
- `report()` / `summary_table()`: snapshot of per-stage totals, means, and
  rates.
- `hard_sync(tree)`: fetches one leaf via device_get — the only reliable
  sync through high-latency device links (jax.block_until_ready can
  return early through the test-harness tunnel; see NOTES.md).
- `device_trace(dir)`: jax.profiler trace context (XLA/TPU timeline into
  TensorBoard format) for kernel-level inspection.

Enable with ADDER_TPU_TRACE=1 (stages become no-ops otherwise, so the hot
path pays one dict lookup only); `tools/adder_simulproc.py --trace` and
the Video pipeline use it.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

_ENABLED = os.environ.get("ADDER_TPU_TRACE", "0") not in ("", "0")
_LOCK = threading.Lock()


@dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0
    max_s: float = 0.0
    items: int = 0  # optional unit count (pixels, events, bytes)

    @property
    def mean_ms(self) -> float:
        return self.total_s / self.calls * 1e3 if self.calls else 0.0


_REGISTRY: Dict[str, StageStats] = {}


def enabled() -> bool:
    return _ENABLED


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def stage(name: str, items: int = 0):
    """Accumulate wall time under `name`; `items` adds to a unit counter
    so report() can derive rates (px/s, events/s)."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            s = _REGISTRY.setdefault(name, StageStats())
            s.calls += 1
            s.total_s += dt
            s.max_s = max(s.max_s, dt)
            s.items += items


def add_items(name: str, items: int) -> None:
    if not _ENABLED:
        return
    with _LOCK:
        _REGISTRY.setdefault(name, StageStats()).items += items


def report() -> Dict[str, StageStats]:
    with _LOCK:
        return {k: StageStats(**vars(v)) for k, v in _REGISTRY.items()}


def reset() -> None:
    with _LOCK:
        _REGISTRY.clear()


def summary_table() -> str:
    rows = ["stage                          calls   total_ms   mean_ms     rate"]
    for name, s in sorted(report().items(), key=lambda kv: -kv[1].total_s):
        rate = (
            f"{s.items / s.total_s / 1e6:8.2f}M/s" if s.items and s.total_s
            else "        -"
        )
        rows.append(
            f"{name:<30} {s.calls:>5} {s.total_s*1e3:>10.1f}"
            f" {s.mean_ms:>9.2f} {rate}"
        )
    return "\n".join(rows)


def hard_sync(tree) -> None:
    """Force completion of a jax computation reliably (device_get of one
    leaf; block_until_ready is not a hard sync through the harness link)."""
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        jax.device_get(leaves[0])


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace (TensorBoard format) around a region; no-op when
    log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
