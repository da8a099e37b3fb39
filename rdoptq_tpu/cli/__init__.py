"""Command-line drivers: calibrate (task-oriented RDO PTQ), quantize
(light one-shot INT8/BF16), sweep (BD-rate harness)."""

from . import calibrate, codec, evaluate, quantize, sweep

__all__ = ["calibrate", "codec", "evaluate", "quantize", "sweep"]
