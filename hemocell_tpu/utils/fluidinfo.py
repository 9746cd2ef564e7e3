"""Domain-wide fluid and particle statistics.

Equivalents of ``FluidInfo`` (helper/fluidInfo.{h,cpp}) and ``ParticleInfo``
(helper/particleInfo.{h,cpp}): min/max/mean of velocity and force over the
fluid domain / all live vertices — plain reductions, no MPI gather needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config.defaults import FLAG_FLUID
from ..fluid import lbm


class Stats(NamedTuple):
    min: float
    max: float
    avg: float


def velocity_statistics(f, force, flags) -> Stats:
    """|u| stats over fluid nodes (FluidInfo::calculateVelocityStatistics)."""
    _, u = lbm.macroscopic(f, force)
    mag = jnp.linalg.norm(u, axis=0)
    fluid = flags == FLAG_FLUID
    n = jnp.maximum(fluid.sum(), 1)
    mag_f = jnp.where(fluid, mag, 0.0)
    return Stats(
        float(jnp.where(fluid, mag, jnp.inf).min()),
        float(mag_f.max()),
        float(mag_f.sum() / n),
    )


def force_statistics_fluid(force_field, flags) -> Stats:
    mag = jnp.linalg.norm(force_field, axis=0)
    fluid = flags == FLAG_FLUID
    n = jnp.maximum(fluid.sum(), 1)
    mag_f = jnp.where(fluid, mag, 0.0)
    return Stats(
        float(jnp.where(fluid, mag, jnp.inf).min()),
        float(mag_f.max()),
        float(mag_f.sum() / n),
    )


def particle_force_statistics(cells) -> Stats:
    """|F| stats over live vertices of all types
    (ParticleInfo::calculateForceStatistics)."""
    mags = []
    weights = []
    for cs in cells:
        mag = jnp.linalg.norm(cs.force + cs.force_repulsion, axis=-1)
        w = cs.alive.astype(mag.dtype)[:, None] * jnp.ones_like(mag)
        mags.append(mag.reshape(-1))
        weights.append(w.reshape(-1))
    mag = jnp.concatenate(mags)
    w = jnp.concatenate(weights)
    n = jnp.maximum(w.sum(), 1)
    return Stats(
        float(jnp.where(w > 0, mag, jnp.inf).min()),
        float((mag * w).max()),
        float((mag * w).sum() / n),
    )


def particle_velocity_statistics(cells) -> Stats:
    mags = []
    weights = []
    for cs in cells:
        mag = jnp.linalg.norm(cs.vel, axis=-1)
        w = cs.alive.astype(mag.dtype)[:, None] * jnp.ones_like(mag)
        mags.append(mag.reshape(-1))
        weights.append(w.reshape(-1))
    mag = jnp.concatenate(mags)
    w = jnp.concatenate(weights)
    n = jnp.maximum(w.sum(), 1)
    return Stats(
        float(jnp.where(w > 0, mag, jnp.inf).min()),
        float((mag * w).max()),
        float((mag * w).sum() / n),
    )
