"""Heartbeat-based multi-host failure detection (parallel/health.py)."""

import time

from onebit_tpu.parallel.health import (
    HeartbeatMonitor,
    HeartbeatWriter,
    barrier_sync,
)


def test_heartbeat_live_and_dead(tmp_path):
    d = str(tmp_path)
    w0 = HeartbeatWriter(d, 0, interval=0.05).start()
    w1 = HeartbeatWriter(d, 1, interval=0.05).start()
    mon = HeartbeatMonitor(d, timeout=0.5)
    time.sleep(0.15)
    assert set(mon.ages()) == {0, 1}
    assert mon.stale() == []

    # kill process 1's writer; it goes stale, 0 stays live
    w1.stop()
    time.sleep(0.7)
    assert mon.stale() == [1]
    assert 0 not in mon.stale()
    w0.stop()


def test_on_failure_fires_once(tmp_path):
    d = str(tmp_path)
    w = HeartbeatWriter(d, 7, interval=10.0)
    w.beat()
    events = []
    mon = HeartbeatMonitor(d, timeout=0.1,
                           on_failure=lambda dead: events.append(dead))
    time.sleep(0.2)
    assert mon.check() == [7]
    assert mon.check() == [7]     # still dead…
    assert events == [[7]]        # …but reported exactly once


def test_monitor_watch_thread(tmp_path):
    d = str(tmp_path)
    HeartbeatWriter(d, 3, interval=10.0).beat()
    events = []
    mon = HeartbeatMonitor(d, timeout=0.1,
                           on_failure=lambda dead: events.append(dead))
    mon.watch(poll_interval=0.05)
    time.sleep(0.4)
    mon.stop()
    assert events == [[3]]


def test_barrier_sync_single_process():
    # one process: the global barrier completes immediately
    barrier_sync("test", timeout=30.0)


def test_barrier_sync_timeout_reports_stale(tmp_path, monkeypatch):
    d = str(tmp_path)
    HeartbeatWriter(d, 5, interval=10.0).beat()
    time.sleep(0.2)

    from jax.experimental import multihost_utils

    def hang(name):
        time.sleep(10)

    monkeypatch.setattr(multihost_utils, "sync_global_devices", hang)
    import pytest
    with pytest.raises(TimeoutError, match=r"stale heartbeats: \[5\]"):
        barrier_sync("b", timeout=0.3, heartbeat_dir=d,
                     stale_after=0.1)
