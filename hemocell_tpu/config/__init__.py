from . import defaults
from .units import Parameters
from .xmlconfig import Config, ConfigNode, load_directories

__all__ = ["Config", "ConfigNode", "Parameters", "defaults", "load_directories"]
