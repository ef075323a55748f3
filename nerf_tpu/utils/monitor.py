"""Performance monitoring: honest device-synchronized timing + peak memory.

Capability parity with the reference's ``performance_monitor`` context manager
(``base_renderer.py:118-154``): it fenced with ``torch.mps/cuda.synchronize()``
and polled psutil RSS from a background thread. The TPU-native equivalent:

- fencing via ``jax.block_until_ready`` on the result (the caller passes the
  output pytree to ``stop``), so timings exclude dispatch-only laziness;
- device memory from ``device.memory_stats()`` (peak_bytes_in_use) where the
  backend exposes it (TPU does; CPU jax does not), plus host RSS polling as
  the fallback, same 10 ms cadence as the reference.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import numpy as np

try:
    import psutil

    _PSUTIL = True
except Exception:  # pragma: no cover
    _PSUTIL = False


@dataclass
class PerfStats:
    wall_time_s: float = 0.0
    peak_host_rss_mb: float = 0.0
    peak_device_mb: Optional[float] = None
    device_kind: str = "unknown"


class PerformanceMonitor:
    """Usage::

        mon = PerformanceMonitor(device)
        mon.start()
        out = fn(...)
        stats = mon.stop(out)   # blocks on out, then reads clocks/memory
    """

    def __init__(self, device: Optional[jax.Device] = None, poll_interval_s: float = 0.01):
        self.device = device if device is not None else jax.devices()[0]
        self.poll_interval_s = poll_interval_s
        self._peak_rss = 0.0
        self._stop_evt: Optional[threading.Event] = None
        self._thread: Optional[threading.Thread] = None
        self._t0 = 0.0

    def _poll(self, evt: threading.Event) -> None:
        proc = psutil.Process()
        while not evt.is_set():
            self._peak_rss = max(self._peak_rss, proc.memory_info().rss / 1e6)
            evt.wait(self.poll_interval_s)

    def start(self) -> "PerformanceMonitor":
        self._peak_rss = 0.0
        if _PSUTIL:
            self._stop_evt = threading.Event()
            self._thread = threading.Thread(
                target=self._poll, args=(self._stop_evt,), daemon=True
            )
            self._thread.start()
        self._t0 = time.perf_counter()
        return self

    def stop(self, result: Any = None) -> PerfStats:
        if result is not None:
            sync(result)
        wall = time.perf_counter() - self._t0
        if self._stop_evt is not None:
            self._stop_evt.set()
            self._thread.join(timeout=1.0)
        stats = PerfStats(
            wall_time_s=wall,
            peak_host_rss_mb=self._peak_rss,
            peak_device_mb=device_peak_memory_mb(self.device),
            device_kind=self.device.device_kind,
        )
        return stats


def sync(result: Any) -> None:
    """Fence on a computation's completion. ``jax.block_until_ready`` alone is
    not sufficient on every backend (the experimental remote-TPU platform
    returns immediately); fetching one element to the host is a hard
    synchronization point, and one leaf suffices because a single executable
    produces all outputs of a jitted call."""
    jax.block_until_ready(result)
    leaves = jax.tree.leaves(result)
    if leaves:
        first = leaves[0]
        if hasattr(first, "ravel"):
            np.asarray(first.ravel()[0:1])


def device_peak_memory_mb(device: Optional[jax.Device] = None) -> Optional[float]:
    device = device if device is not None else jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    for key in ("peak_bytes_in_use", "bytes_in_use"):
        if key in stats:
            return stats[key] / 1e6
    return None


class profile_trace:
    """Context manager writing a ``jax.profiler`` trace (viewable in
    TensorBoard / Perfetto) — the TPU-native upgrade of the reference's
    wall-clock-only monitor (``base_renderer.py:118-147``; SURVEY.md §5.1).
    Falls back to a no-op if the backend can't trace."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        try:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        except Exception as e:  # pragma: no cover
            print(f"profiler trace unavailable: {e}")
        return self

    def __exit__(self, *exc):
        if self._active:
            try:
                jax.profiler.stop_trace()
            except Exception:  # pragma: no cover
                pass
        return False


def device_info_string(device: Optional[jax.Device] = None) -> str:
    """Label for benchmark rows (reference ``base_renderer.py:156-163``)."""
    device = device if device is not None else jax.devices()[0]
    return f"{device.platform.upper()} - {device.device_kind}"
