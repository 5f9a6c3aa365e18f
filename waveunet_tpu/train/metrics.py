"""Training observability: JSONL metric log + optional TensorBoard scalars.

Reference logs a `sep_loss` scalar per step and `test_loss` per eval to
TensorBoard (`/root/reference/Training.py:80-81,105-106`, `Test.py:81-82`);
we write an append-only JSONL stream (machine-readable, survives crashes) and
mirror to tensorboardX when available. `jax.profiler` traces can be toggled for
xprof-compatible device profiling.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, experiment_id: str,
                 use_tensorboard: bool = True):
        self.dir = os.path.join(log_dir, str(experiment_id))
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(self.dir)
            except Exception:
                self._tb = None

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def start_profiler_trace(log_dir: str):
    """Begin a jax.profiler trace (TensorBoard/xprof-compatible)."""
    import jax
    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    import jax
    jax.profiler.stop_trace()
