"""Runtime setup helpers: compilation cache, platform forcing, timing.

The observability counterpart of the reference's voxblox timing::Timer +
node_evaluator hooks (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict

import jax

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (TPU compiles through the
    tunnel are 10-100 s; the cache makes repeat runs near-instant)."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    path = path or os.path.expanduser("~/.cache/coxgraph_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CACHE_ENABLED = True


def force_cpu(n_devices: int = 8) -> None:
    """Force the CPU backend with a virtual device mesh. Must run before
    any computation. Note: the axon TPU plugin ignores JAX_PLATFORMS, so
    this uses jax.config (see tests/conftest.py)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")


class Timers:
    """Aggregating scoped wall-clock timers (device-synchronizing), after
    voxblox timing::Timer / timing::Timing::Print (tsdf_recover.h:63-93)."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def report(self) -> str:
        lines = ["timers:"]
        for k in sorted(self.total):
            n = self.count[k]
            tot = self.total[k]
            lines.append(
                f"  {k:32s} n={n:6d} total={tot:8.3f}s mean={tot / n * 1e3:8.2f}ms"
            )
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps(
            {k: {"n": self.count[k], "total_s": self.total[k]}
             for k in self.total}
        )
