"""Structured logging + run statistics.

Covers both of the reference's loggers (SURVEY.md §5 metrics row):
- ``SSRG/logger.py:6-66`` — file + stdout python-logging wrapper with
  per-message flush (:func:`get_logger`).
- ``/root/reference/logger.py:3-43`` — multi-run best-val→final-test
  statistics in the OGB-examples style (:class:`RunLogger`).

Plus a JSONL metrics writer for machine-readable training curves, which the
reference lacks.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Optional

import numpy as np


def get_logger(name: str = "ssrg_tpu", log_file: Optional[str] = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    stream = logging.StreamHandler(sys.stdout)
    stream.setFormatter(fmt)
    logger.addHandler(stream)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class RunLogger:
    """Per-run (best-val, final-test) tracking with mean±std summary
    (reference top-level logger.py Logger)."""

    def __init__(self, runs: int):
        self.results = [[] for _ in range(runs)]

    def add_result(self, run: int, result) -> None:
        # result = (train_acc, val_acc, test_acc)
        self.results[run].append(tuple(result))

    def best_of_run(self, run: int):
        r = np.asarray(self.results[run])
        best_epoch = int(r[:, 1].argmax())
        return r[best_epoch, 1], r[best_epoch, 2]

    def print_statistics(self, run: Optional[int] = None) -> str:
        if run is not None:
            val, test = self.best_of_run(run)
            msg = f"Run {run + 1:02d}: best val {val:.4f}, final test {test:.4f}"
        else:
            pairs = [self.best_of_run(i) for i in range(len(self.results)) if self.results[i]]
            vals = np.asarray([p[0] for p in pairs])
            tests = np.asarray([p[1] for p in pairs])
            std_v = vals.std(ddof=1) if len(vals) > 1 else 0.0
            std_t = tests.std(ddof=1) if len(tests) > 1 else 0.0
            msg = (
                f"All runs: val {vals.mean():.4f} ± {std_v:.4f}, "
                f"test {tests.mean():.4f} ± {std_t:.4f}"
            )
        print(msg)
        return msg


class MetricsWriter:
    """Append-only JSONL metrics sink."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a")

    def write(self, **metrics) -> None:
        metrics.setdefault("ts", time.time())
        self._fh.write(json.dumps(metrics) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


class device_trace:
    """Capture a ``jax.profiler`` device trace around a code region.

    TPU-native upgrade of the reference's ad-hoc ``time.time()`` prints
    (SURVEY.md §5 tracing row): writes a TensorBoard-loadable trace directory
    with per-op device timelines, HBM traffic, and fusion boundaries.

    >>> with device_trace("/tmp/trace"):
    ...     hops = propagate(adj_dev, x, 3)
    ...     jax.block_until_ready(hops)

    No-ops gracefully (with a warning) if the backend cannot trace.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        import jax

        try:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        except Exception as exc:  # tracing unsupported on this backend
            get_logger().warning("device_trace disabled: %r", exc)
        return self

    def __exit__(self, *exc):
        if self._active:
            import jax

            jax.profiler.stop_trace()
        return False


class PhaseTimer:
    """Named phase timing (the reference sprinkles ad-hoc time.time() deltas;
    SURVEY.md §5 tracing row). Also computes edges/s given a work count."""

    def __init__(self):
        self.phases = {}

    def measure(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.phases[name] = time.perf_counter() - self.t0

        return _Ctx()

    def rate(self, name: str, work: float) -> float:
        return work / self.phases[name] if self.phases.get(name) else 0.0
