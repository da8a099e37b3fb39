"""Core numerical ops: quantizers, AdaRound, entropy models, metrics."""

from . import adaround, quant
from .quant import QParams, fake_quant, round_ste

__all__ = ["adaround", "quant", "QParams", "fake_quant", "round_ste"]
