"""LIC model zoo: functional JAX models over parameter pytrees."""

from . import base, layers
from .cheng2020 import Cheng2020, cheng2020
from .lu2022 import Lu2022, lu2022
from .minnen2018 import Minnen2018, minnen2018
from .tinylic import TinyLIC, tinylic

__all__ = ["base", "layers", "Minnen2018", "minnen2018", "Cheng2020",
           "cheng2020", "Lu2022", "lu2022", "TinyLIC", "tinylic"]
