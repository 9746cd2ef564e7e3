"""Per-cell observables: volume, area, position, velocity, bounding box,
stretch — the gathering-functional statistics of the reference
(helper/cellInfo.{h,cpp} ``CellInformationFunctionals``), as plain jnp
reductions over the global cell arrays (no MPI gather needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mechanics.forces import cell_area, cell_volume


def volumes(pos, tri):
    """[NC] signed volumes."""
    return jax.vmap(lambda p: cell_volume(p, tri))(pos)


def areas(pos, tri):
    return jax.vmap(lambda p: cell_area(p, tri))(pos)


def centers(pos):
    """[NC, 3] mean vertex position."""
    return pos.mean(axis=1)


def velocities(vel):
    return vel.mean(axis=1)


def bounding_boxes(pos):
    """[NC, 6]: xmin xmax ymin ymax zmin zmax (reference bbox order,
    helper/cellInfo.h)."""
    mins = pos.min(axis=1)
    maxs = pos.max(axis=1)
    return jnp.stack(
        [mins[:, 0], maxs[:, 0], mins[:, 1], maxs[:, 1], mins[:, 2], maxs[:, 2]],
        axis=1,
    )


def stretch(pos):
    """[NC] largest x-extent (optical-tweezers observable)."""
    return pos[:, :, 0].max(axis=1) - pos[:, :, 0].min(axis=1)


def mean_force_magnitude(force, alive):
    """Mean |F| over vertices of live cells (pipeflow oracle:
    test_pipeflow.cpp:106 asserts < 4 pN)."""
    mag = jnp.linalg.norm(force, axis=-1)  # [NC, NV]
    w = alive.astype(force.dtype)[:, None]
    return jnp.sum(mag * w) / jnp.maximum(jnp.sum(w) * force.shape[1], 1)
