"""Logging / metrics infrastructure.

Parity with the reference's observability layer (T17: `setup_logger`
utils.py:179-192, `AverageMeter`/`ProgressMeter` :58-96, TensorBoard
`Logger` :99-176): stdout+file logging, streaming averages, and a
TensorBoard writer (tensorboardX) when available.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from datetime import datetime
from typing import Dict, Optional


def setup_logger(log_dir: Optional[str] = None,
                 level=logging.INFO) -> logging.Logger:
    """stdout + timestamped-file logging (reference utils.py:179-192)."""
    root = logging.getLogger()
    root.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(levelname).1s %(name)s: "
                            "%(message)s")
    for h in list(root.handlers):
        root.removeHandler(h)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir,
                            datetime.now().strftime("%Y%m%d_%H%M%S.log"))
        fh = logging.FileHandler(path)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root


class AverageMeter:
    """Streaming average (reference utils.py:58-77)."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
                ).format(**self.__dict__)


class MetricsLogger:
    """TensorBoard-style scalar logging with AverageMeters per tag
    (reference `Logger`, utils.py:99-176). Falls back to JSONL when
    tensorboardX is unavailable."""

    def __init__(self, log_dir: Optional[str] = None):
        self.meters: Dict[str, AverageMeter] = {}
        self.writer = None
        self.jsonl = None
        if log_dir:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(log_dir)
            except ImportError:
                self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"),
                                  "a")

    def update(self, tag: str, value: float, step: Optional[int] = None):
        self.meters.setdefault(tag, AverageMeter(tag, ":.4f")).update(value)
        if self.writer is not None and step is not None:
            self.writer.add_scalar(tag, value, step)
        elif self.jsonl is not None:
            import json
            self.jsonl.write(json.dumps({"tag": tag, "value": value,
                                         "step": step}) + "\n")

    def averages(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.jsonl is not None:
            self.jsonl.close()


class Timer:
    """Phase wall-clock timer (the reference logs per-phase timings ad hoc;
    SURVEY §5). Usage: ``with Timer() as t: ...; t.seconds``."""

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.seconds = time.time() - self.start
        return False


def profile_trace(log_dir: str):
    """Context manager producing a jax.profiler trace viewable in
    TensorBoard/Perfetto (the TPU-native replacement for the reference's
    wall-clock-only tracing, SURVEY §5)."""
    import jax
    return jax.profiler.trace(log_dir)


__all__ = ["setup_logger", "AverageMeter", "MetricsLogger", "Timer",
           "profile_trace"]
