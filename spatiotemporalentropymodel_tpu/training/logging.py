"""Training observability: scalar metrics logging + profiler hooks.

Parity: the reference logs TensorBoard scalars (trainSTEM.py:155,220-234) and
append-mode text logs (evalSTEM.py:221-230). Here: a TensorBoard writer when
``torch.utils.tensorboard`` is importable, always mirrored to a JSONL file
(machine-readable, consumed by the plot CLI), plus ``jax.profiler`` trace
helpers — the systematic tracing the reference lacks (SURVEY.md §5).
"""

import json
import os
import time
from contextlib import contextmanager
from typing import Optional


class MetricsLogger:
    def __init__(self, logdir: str, name: str = "train"):
        os.makedirs(logdir, exist_ok=True)
        self.jsonl_path = os.path.join(logdir, f"{name}_metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(logdir, name))
        except Exception:
            self._tb = None

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Per-stage wall-clock timers (replaces the reference's ad-hoc
    time.time() prints, spatiotemporalpriors.py:360-390)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_ms": 1e3 * self.totals[name] / self.counts[name]}
            for name in self.totals
        }
