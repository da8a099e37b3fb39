"""LIC model zoo: functional JAX models over parameter pytrees."""

# NOTE: the quality-indexed factory functions (minnen2018, cheng2020,
# lu2022, tinylic) share names with their submodules, so they are NOT
# re-exported here — use `models.registry.build_model` or import them from
# their submodule directly.
from . import base, layers
from .cheng2020 import Cheng2020
from .lu2022 import Lu2022
from .minnen2018 import Minnen2018
from .tinylic import TinyLIC

__all__ = ["base", "layers", "Minnen2018", "Cheng2020", "Lu2022",
           "TinyLIC"]
