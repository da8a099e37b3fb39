"""Quantization engines: functional model 'surgery', light uniform PTQ,
and the task-oriented RDO (AdaRound) calibration engine."""

from . import light, rdo, wrap
from .light import LightConfig, quantize_model
from .rdo import PTQState, RDOConfig, calibrate_model, calibrate_unit
from .wrap import WeightQuantConfig, find_quant_leaves

__all__ = ["light", "rdo", "wrap", "LightConfig", "quantize_model",
           "PTQState", "RDOConfig", "calibrate_model", "calibrate_unit",
           "WeightQuantConfig", "find_quant_leaves"]
