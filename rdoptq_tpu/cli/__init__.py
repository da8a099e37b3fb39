"""Command-line drivers: calibrate (task-oriented RDO PTQ), quantize
(light one-shot INT8/BF16), sweep (BD-rate harness)."""

from . import calibrate, evaluate, quantize, sweep

__all__ = ["calibrate", "evaluate", "quantize", "sweep"]
