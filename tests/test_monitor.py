"""Perf-monitor tests (reference analog: ``test_system.py:221-287`` device
detection + memory tests, ``base_renderer.py:118-154`` monitor)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.utils.monitor import (
    PerformanceMonitor,
    device_info_string,
    profile_trace,
    sync,
)


def test_monitor_times_real_work():
    mon = PerformanceMonitor()
    mon.start()
    x = jnp.ones((512, 512))
    for _ in range(3):
        x = x @ x / 512.0
    stats = mon.stop(x)
    assert stats.wall_time_s > 0
    assert stats.peak_host_rss_mb > 0  # psutil thread sampled at least once
    assert "CPU" in stats.device_kind.upper() or stats.device_kind


def test_monitor_includes_sleep_time():
    mon = PerformanceMonitor()
    mon.start()
    time.sleep(0.05)
    stats = mon.stop(jnp.zeros(1))
    assert stats.wall_time_s >= 0.045


def test_sync_forces_completion():
    x = jnp.ones((64, 64)) * 2.0
    sync(x @ x)  # must not raise; covers ravel/one-element fetch


def test_device_info_string():
    s = device_info_string()
    assert isinstance(s, str) and "-" in s


def test_memory_stays_bounded():
    """Render-scale allocation does not leak >500MB of host RSS across
    repeats (the reference's memory-increase gate, ``test_system.py:258-287``)."""
    import psutil

    proc = psutil.Process()
    before = proc.memory_info().rss / 1e6
    for _ in range(5):
        x = jnp.ones((1024, 256))
        y = (x @ x.T).block_until_ready()
        del x, y
    after = proc.memory_info().rss / 1e6
    assert after - before < 500, f"memory grew {after - before:.0f} MB"


def test_profile_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with profile_trace(d):
        x = jnp.ones((128, 128))
        (x @ x).block_until_ready()
    # jax writes plugins/profile/... under the log dir when tracing worked
    found = any("profile" in r for r, _, _ in os.walk(d))
    assert found or not os.path.isdir(d)  # no-op fallback acceptable off-TPU
