from .coupling import cap_force, interpolate, on_boundary, spread, stencil

__all__ = ["cap_force", "interpolate", "on_boundary", "spread", "stencil"]
