from . import d3q19, lbm
from .lbm import (
    collide,
    equilibrium,
    equilibrium_dev,
    initial_state,
    macroscopic,
    shear_rate_magnitude,
    strain_rate_tensor,
    stream,
    stream_collide,
)

__all__ = [
    "d3q19",
    "lbm",
    "collide",
    "equilibrium",
    "equilibrium_dev",
    "initial_state",
    "macroscopic",
    "shear_rate_magnitude",
    "strain_rate_tensor",
    "stream",
    "stream_collide",
]
