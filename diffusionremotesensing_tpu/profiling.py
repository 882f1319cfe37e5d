"""Tracing, per-step timing, and structured metrics.

The reference has no profiling or metrics beyond tqdm bars and loss prints
(SURVEY.md §5). This module provides the TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard-compatible trace directory.
* :class:`StepTimer` — wall-clock steps/sec with warmup exclusion (always
  call ``block_until_ready`` on step outputs before ``tick`` for honest
  numbers; dispatch is async).
* :class:`MetricsLogger` — append-only JSONL of per-step/per-epoch scalars
  ({"step": ..., "loss": ..., "steps_per_sec": ...}); plain files, no
  TensorBoard/W&B dependency.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

__all__ = ["trace", "StepTimer", "MetricsLogger", "annotate"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines
    (jax.profiler.TraceAnnotation passthrough)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steps/sec with the first ``warmup`` steps (compile) excluded."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self._t0: Optional[float] = None

    def tick(self) -> None:
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self.count <= self.warmup:
            return 0.0
        return (self.count - self.warmup) / (time.perf_counter() - self._t0)


class MetricsLogger:
    """Append-only JSONL metrics file."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        else:
            self._fh = None

    def log(self, **metrics: Any) -> None:
        if self._fh is None:
            return
        metrics.setdefault("ts", time.time())
        self._fh.write(json.dumps(_to_plain(metrics)) + "\n")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def _to_plain(tree: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        try:
            out[k] = float(v) if hasattr(v, "__float__") and not isinstance(v, (int, bool)) else v
        except (TypeError, ValueError):
            out[k] = str(v)
    return out
