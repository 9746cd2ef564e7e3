from . import cellinfo
from .profiler import Profiler

__all__ = ["cellinfo", "Profiler"]
