"""LIC model zoo: functional JAX models over parameter pytrees."""

from . import base, layers
from .cheng2020 import Cheng2020, cheng2020
from .minnen2018 import Minnen2018, minnen2018

__all__ = ["base", "layers", "Minnen2018", "minnen2018", "Cheng2020",
           "cheng2020"]
