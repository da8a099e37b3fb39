"""Evaluation: dataset harnesses (Kodak/Tecnick/CLIC), BD-rate."""

from . import bdrate, datasets, harness
from .bdrate import bd_psnr, bd_rate
from .harness import EvalResult, evaluate, make_eval_fn

__all__ = ["bdrate", "datasets", "harness", "bd_psnr", "bd_rate",
           "EvalResult", "evaluate", "make_eval_fn"]
