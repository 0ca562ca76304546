"""Metrics logging & observability (SURVEY.md §5 "Metrics / logging").

The jitted step returns a small metrics dict (no host callbacks inside the
compiled program); this logger consumes it on host: stdout lines, a JSONL
metrics file (TensorBoard-free but machine-readable), and step/data timing
so input-bound training is visible from day one.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque

import jax


class MetricLogger:
    def __init__(self, log_dir: str | None = None, window: int = 100,
                 tensorboard: bool = True):
        self.log_dir = log_dir
        self._file = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if tensorboard:
                # pure-Python tfevents writer (utils/tensorboard.py) — no
                # TensorBoard import needed to WRITE; any stock install
                # reads the result.
                from ssd_tpu.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
        self._step_times = deque(maxlen=window)
        self._data_times = deque(maxlen=window)
        self._last = time.perf_counter()

    def reset_clock(self) -> None:
        """Restart the step/data timers (call right before the loop)."""
        self._last = time.perf_counter()

    def tick_data(self) -> None:
        """Call after the next batch is ready (measures input-pipeline time)."""
        now = time.perf_counter()
        self._data_times.append(now - self._last)
        self._last = now

    def tick_step(self) -> None:
        """Call after the train step is dispatched.

        Dispatch is async, so a single tick measures host-side time plus
        queue backpressure; the windowed average still converges to true
        step time because ``log()`` fetches metrics (a device sync) every
        ``log_every`` steps.
        """
        now = time.perf_counter()
        self._step_times.append(now - self._last)
        self._last = now

    def log(self, step: int, metrics: dict, extra: dict | None = None) -> None:
        record = {"step": step}
        for k, v in metrics.items():
            record[k] = float(jax.device_get(v))
        if self._step_times:
            record["step_time_s"] = sum(self._step_times) / len(self._step_times)
        if self._data_times:
            record["data_time_s"] = sum(self._data_times) / len(self._data_times)
        if extra:
            record.update(extra)
        line = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        print(line, flush=True)
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb:
            self._tb.add_scalars(
                {k: v for k, v in record.items()
                 if k != "step" and isinstance(v, (int, float))}, step)
            self._tb.flush()

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
