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
    # 0, not the 0.5 default: through the axon tunnel even a trivial
    # broadcast/convert compiles in ~0.35 s (never locally), and a cold
    # process dispatches dozens of them — ~12 s of pure tiny-op compile
    # per run that the default threshold refused to persist. A cache hit
    # is ~0.03 s. (Measured round 3; see docs/PERFORMANCE.md.)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _CACHE_ENABLED = True


_CB_SUPPORTED: bool | None = None


def host_callbacks_supported() -> bool:
    """Whether the active backend supports host callbacks
    (jax.debug.callback / io_callback / pure_callback). The axon TPU
    tunnel plugin raises UNIMPLEMENTED on any host send/recv callback —
    a program containing one fails at RUN time, so callback-bearing
    traces must be gated at trace time (ops/tsdf window-overflow
    warning; HostMapper uses an async scalar readback there instead)."""
    global _CB_SUPPORTED
    if _CB_SUPPORTED is None:
        try:
            pv = getattr(jax.devices()[0].client, "platform_version", "")
        except Exception:
            pv = ""
        _CB_SUPPORTED = "axon" not in pv
    return _CB_SUPPORTED


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


class ResourceSampler:
    """Process CPU/memory sampling — the node_evaluator equivalent
    (reference: per-node ["cpu","mem"] eval modes,
    evaluation_config.yaml:1-2). Reads /proc; sample() returns deltas
    since the previous call. start(rate_hz)/stop() run the periodic
    sampling loop the reference's node_evaluator runs per node;
    summary() is the end-of-experiment rollup (its plot_dir output,
    :9)."""

    def __init__(self):
        self._last = None
        self.samples = []
        self._thread = None
        self._stop = None

    def start(self, rate_hz: float = 1.0) -> "ResourceSampler":
        """Sample periodically on a daemon thread until stop()."""
        import threading

        if self._thread is not None:
            return self
        self._stop = threading.Event()
        self.sample()                       # baseline for the first delta

        def loop():
            while not self._stop.wait(1.0 / rate_hz):
                self.sample()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        if self._thread is not None:
            self._stop.set()
            self._thread.join()
            self._thread = None
        return self.summary()

    def summary(self) -> dict:
        if not self.samples:
            return {"n": 0}
        cpu = [s["cpu_pct"] for s in self.samples]
        rss = [s["rss_mb"] for s in self.samples]
        return {"n": len(self.samples),
                "cpu_pct_mean": sum(cpu) / len(cpu),
                "cpu_pct_max": max(cpu),
                "rss_mb_max": max(rss)}

    @staticmethod
    def _read():
        import os
        import time as _t
        with open(f"/proc/{os.getpid()}/stat") as f:
            parts = f.read().split()
        utime, stime = int(parts[13]), int(parts[14])
        rss_pages = int(parts[23])
        tick = os.sysconf("SC_CLK_TCK")
        page = os.sysconf("SC_PAGE_SIZE")
        return (_t.monotonic(), (utime + stime) / tick, rss_pages * page)

    def sample(self) -> dict:
        now = self._read()
        if self._last is None:
            self._last = now
            return {"cpu_pct": 0.0, "rss_mb": now[2] / 1e6}
        dt = max(now[0] - self._last[0], 1e-9)
        cpu = 100.0 * (now[1] - self._last[1]) / dt
        self._last = now
        rec = {"cpu_pct": cpu, "rss_mb": now[2] / 1e6}
        self.samples.append(rec)
        return rec
