"""Multi-host failure detection for serving deployments.

The reference has NO failure detection (SURVEY.md §5: recovery = HF
``resume_from_checkpoint`` only).  Training keeps that checkpoint-resume
contract (train/run_kd.py); long-running multi-host *serving* additionally
needs to notice a dead peer promptly — a hung host otherwise stalls every
collective on the next dispatch with no diagnosis.

Design: out-of-band heartbeats on shared storage (the one medium TPU pods
reliably share — GCS/NFS; in-band XLA collectives cannot signal failure
because a dead peer blocks them).  Each process runs a
:class:`HeartbeatWriter` thread touching ``<dir>/<pid>.hb`` every
``interval``; any process (or an external supervisor) polls
:class:`HeartbeatMonitor` for peers whose file age exceeds ``timeout``.
On detection the deployment follows the same contract as training:
restart the job from the last checkpoint (there is no elastic resize —
XLA programs are compiled for a fixed mesh).

``barrier_sync`` wraps ``jax.experimental.multihost_utils`` with a
watchdog so a startup barrier reports *which* hosts are absent instead of
hanging forever.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Callable, Dict, List, Optional


class HeartbeatWriter:
    """Background thread stamping this process's liveness file."""

    def __init__(self, directory: str, process_id: int,
                 interval: float = 1.0, payload: Optional[dict] = None):
        self.directory = directory
        self.process_id = process_id
        self.interval = interval
        self.payload = payload or {}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        os.makedirs(directory, exist_ok=True)

    @property
    def path(self) -> str:
        return os.path.join(self.directory, f"{self.process_id}.hb")

    def beat(self) -> None:
        """One heartbeat: atomic write of timestamp + payload."""
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"t": time.time(), "pid": os.getpid(),
                       **self.payload}, f)
        os.replace(tmp, self.path)

    def start(self) -> "HeartbeatWriter":
        self.beat()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def _loop(self):
        while not self._stop.wait(self.interval):
            try:
                self.beat()
            except OSError:
                pass   # transient shared-fs hiccup; next beat retries

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=self.interval + 1)


class HeartbeatMonitor:
    """Poll peers' heartbeat files; report stale (presumed-dead) hosts."""

    def __init__(self, directory: str, timeout: float = 5.0,
                 on_failure: Optional[Callable[[List[int]], None]] = None):
        self.directory = directory
        self.timeout = timeout
        self.on_failure = on_failure
        self._reported: set = set()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def ages(self) -> Dict[int, float]:
        """process_id → seconds since its last heartbeat."""
        now = time.time()
        out: Dict[int, float] = {}
        try:
            names = os.listdir(self.directory)
        except FileNotFoundError:
            return out
        for name in names:
            if not name.endswith(".hb"):
                continue
            try:
                with open(os.path.join(self.directory, name)) as f:
                    out[int(name[:-3])] = now - json.load(f)["t"]
            except (OSError, ValueError, KeyError):
                continue   # mid-write or corrupt: skip this poll
        return out

    def stale(self) -> List[int]:
        return sorted(p for p, age in self.ages().items()
                      if age > self.timeout)

    def check(self) -> List[int]:
        """One poll; fires ``on_failure`` once per newly-dead process."""
        dead = self.stale()
        fresh = [p for p in dead if p not in self._reported]
        self._reported.update(fresh)
        if fresh and self.on_failure:
            self.on_failure(fresh)
        return dead

    def watch(self, poll_interval: float = 1.0) -> "HeartbeatMonitor":
        """Continuous background polling."""
        def loop():
            while not self._stop.wait(poll_interval):
                self.check()
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)


def barrier_sync(name: str = "barrier", timeout: float = 300.0,
                 heartbeat_dir: Optional[str] = None,
                 stale_after: float = 5.0) -> None:
    """Cross-host barrier with a watchdog.

    Runs ``multihost_utils.sync_global_devices`` on a worker thread; if it
    does not complete within ``timeout``, raises with the set of hosts
    whose heartbeats are stale (when ``heartbeat_dir`` given) instead of
    hanging silently — the failure mode the reference's NCCL launcher has
    no answer for.
    """
    from jax.experimental import multihost_utils

    done = threading.Event()
    err: List[BaseException] = []

    def go():
        try:
            multihost_utils.sync_global_devices(name)
        except BaseException as e:   # surfaced to the caller below
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=go, daemon=True)
    t.start()
    if not done.wait(timeout):
        missing = ""
        if heartbeat_dir:
            stale = HeartbeatMonitor(heartbeat_dir,
                                     timeout=stale_after).stale()
            missing = f"; stale heartbeats: {stale}"
        raise TimeoutError(
            f"barrier {name!r} did not complete in {timeout}s{missing}")
    if err:
        raise err[0]
