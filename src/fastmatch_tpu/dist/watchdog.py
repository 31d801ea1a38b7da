"""In-engine failure detection (SURVEY.md §6.3, VERDICT r1 #9).

JAX's failure mode on peer/host loss is a silent hang: dispatch is async,
and a collective whose participant died never completes — the surviving
process blocks forever inside ``block_until_ready`` with no exception to
catch. A SLAM engine on a pod slice must turn that hang into a bounded
detection + checkpoint-restart (the recovery model is checkpoint-restart,
not elastic: SURVEY.md §6.3).

Two mechanisms, both host-side and backend-agnostic:

- ``Watchdog.wait(tree)`` — time-bounded readback. The blocking
  ``jax.block_until_ready`` runs in a daemon thread; if it does not
  complete within ``timeout_s`` the watchdog fires ``on_timeout`` (e.g.
  flush a final orbax snapshot marker) and raises ``CollectiveTimeout``
  in the CALLER's thread, which can then abort cleanly for the supervisor
  to restart from the last checkpoint. The orphaned blocker thread is a
  daemon: it cannot be cancelled (XLA owns the wait), but it no longer
  holds the engine hostage — process exit proceeds.
- ``Heartbeat`` — a per-process liveness file (mtime = last beat) written
  by a daemon thread, plus ``stale_peers`` for a supervisor or process 0
  to distinguish "peer died" from "collective merely slow" before
  deciding to restart the slice.

The distributed pipeline (dist/pipeline.py) arms a Watchdog around every
sharded BA readback when ``DistConfig.collective_timeout_s > 0``; the
kill-one-process-mid-BA fault-injection test (tests/test_watchdog.py)
drives detection + orbax restart end-to-end over two real processes.
"""

from __future__ import annotations

import os
import threading
import time


class CollectiveTimeout(RuntimeError):
    """A device readback (collective) failed to complete in time —
    treat as peer/host loss and restart from the last checkpoint."""


class Watchdog:
    """Time-bounded ``block_until_ready`` for distributed steps."""

    def __init__(self, timeout_s: float, on_timeout=None):
        if timeout_s <= 0:
            raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
        self.timeout_s = float(timeout_s)
        self.on_timeout = on_timeout

    def wait(self, tree):
        """Block until every array in ``tree`` is ready, or raise
        CollectiveTimeout after ``timeout_s`` seconds. Returns ``tree``.
        Exceptions raised by the readback itself (e.g. the coordination
        service noticing a dead peer first) are re-raised unchanged."""
        import jax

        done = threading.Event()
        err: list[BaseException] = []

        def blocker():
            try:
                jax.block_until_ready(tree)
            except BaseException as e:  # noqa: BLE001 — relay to caller
                err.append(e)
            finally:
                done.set()

        th = threading.Thread(target=blocker, daemon=True,
                              name="fastmatch-watchdog-blocker")
        th.start()
        if not done.wait(self.timeout_s):
            if self.on_timeout is not None:
                self.on_timeout()
            raise CollectiveTimeout(
                f"device readback did not complete within "
                f"{self.timeout_s:.1f}s — peer/host loss assumed; restart "
                f"from the last checkpoint")
        if err:
            raise err[0]
        return tree


class Heartbeat:
    """Per-process liveness file: mtime = last beat.

    ``Heartbeat(path).start()`` touches ``path`` every ``interval_s`` from
    a daemon thread; a supervisor (or process 0) calls
    ``stale_peers(paths, stale_s)`` to identify dead processes before
    tearing the slice down."""

    def __init__(self, path: str, interval_s: float = 2.0):
        self.path = path
        self.interval_s = float(interval_s)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def beat(self):
        with open(self.path, "a"):
            os.utime(self.path, None)

    def start(self) -> "Heartbeat":
        self.beat()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="fastmatch-heartbeat")
        self._thread.start()
        return self

    def _loop(self):
        while not self._stop.wait(self.interval_s):
            self.beat()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval_s + 1)


def stale_peers(paths: dict, stale_s: float, now: float | None = None):
    """{name: heartbeat_path} -> [names] whose file is missing or whose
    last beat is older than ``stale_s`` seconds."""
    now = time.time() if now is None else now
    dead = []
    for name, path in paths.items():
        try:
            if now - os.path.getmtime(path) > stale_s:
                dead.append(name)
        except OSError:
            dead.append(name)
    return dead
