"""Utilities: config, logging/metrics, checkpointing, torch conversion."""

from . import checkpoint, config, logging_utils, torch_convert
from .checkpoint import load_pytree, save_pytree
from .config import RunConfig, parse_args
from .logging_utils import AverageMeter, MetricsLogger, Timer, setup_logger

__all__ = ["checkpoint", "config", "logging_utils", "torch_convert",
           "load_pytree", "save_pytree", "RunConfig", "parse_args",
           "AverageMeter", "MetricsLogger", "Timer", "setup_logger"]
