"""Metrics/observability (component T24, SURVEY.md §6.5).

Structured counters + timers written as JSONL (one object per event) and
mirrored to tensorboard scalars when available. Profiling hooks wrap
``jax.profiler.trace`` behind a flag so production runs pay nothing.
"""

from __future__ import annotations

import contextlib
import json
import time


class MetricsLogger:
    """JSONL metrics sink; host-0-only in multi-host runs."""

    def __init__(self, path: str | None = None, tensorboard_dir: str | None = None):
        import jax

        self.enabled = jax.process_index() == 0
        self._fh = open(path, "a") if (path and self.enabled) else None
        self._tb = None
        if tensorboard_dir and self.enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None
        self._step = 0

    def log(self, event: str, **fields):
        if not self.enabled:
            return
        rec = {"ts": time.time(), "event": event, "step": self._step, **fields}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb:
            for k, v in fields.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{event}/{k}", v, self._step)
        self._step += 1

    @contextlib.contextmanager
    def timer(self, name: str, **fields):
        t0 = time.perf_counter()
        yield
        self.log(name, seconds=time.perf_counter() - t0, **fields)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace region, no-op when logdir is None."""
    import jax

    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
