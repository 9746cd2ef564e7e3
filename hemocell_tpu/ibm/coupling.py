"""Immersed-boundary coupling: velocity interpolation and force spreading.

TPU-native replacement for the reference IBM kernel
(core/immersedBoundaryMethod.h:62-138 ``interpolationCoefficientsPhi2`` and
the per-particle loops in core/hemoCellParticleField.cpp:819-863).

The reference's phi2 kernel over a 3^3 window has at most 8 nonzero weights —
exactly the trilinear stencil on the 2^3 cell containing the vertex — so we
compute that directly:

  * ``stencil``: per vertex, the 8 node indices (periodic wrap) and weights;
    weights are zeroed on boundary nodes (walls / velocity nodes) and
    renormalised to 1 (immersedBoundaryMethod.h:104-137).
  * ``interpolate``: v = sum_j w_j u(x_j)  — one gather.
  * ``spread``: scatter-add of (capped) vertex forces into the force field —
    XLA's sorted scatter keeps this deterministic across shardings.

All vertices of all cells are processed as one flat [P, ...] batch; dead
cells participate with zero weight (fixed shapes, no migration machinery).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import FLAG_FLUID

# 8 corner offsets of the unit cell, lexicographic
_OFFSETS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


def stencil(pos, flags, weight_mask=None, return_total=False,
            has_boundaries=True):
    """Trilinear stencil with boundary-aware renormalisation.

    pos:   [P, 3] vertex positions in lattice units (any real values;
           wrapped periodically onto the grid)
    flags: [X, Y, Z] uint8 node flags; weight on any non-fluid node is zeroed
    weight_mask: optional [P] multiplier (0 for dead cells)
    has_boundaries: static; pass False for wall-free domains to skip the
           (expensive on TPU) per-node flag gather — weights are then pure
           trilinear and already sum to 1.

    Returns (idx [P, 8, 3] int32, w [P, 8] pos.dtype)
    [, w_fluid_total [P] — raw trilinear weight landing on fluid nodes,
     the renormalisation denominator, when return_total].
    """
    shape = jnp.asarray(flags.shape, dtype=jnp.int32)
    base = jnp.floor(pos).astype(jnp.int32)  # [P, 3]
    frac = pos - jnp.floor(pos)  # [P, 3] in [0,1)

    offs = jnp.asarray(_OFFSETS)  # [8, 3]
    idx = base[:, None, :] + offs[None, :, :]  # [P, 8, 3]
    idx = jnp.mod(idx, shape[None, None, :])

    # per-axis weights: (1-frac) for offset 0, frac for offset 1
    w_axis = jnp.where(
        offs[None, :, :] == 0, (1.0 - frac)[:, None, :], frac[:, None, :]
    )  # [P, 8, 3]
    w = jnp.prod(w_axis, axis=-1)  # [P, 8]

    if has_boundaries:
        node_flags = flags[idx[..., 0], idx[..., 1], idx[..., 2]]  # [P, 8]
        w = jnp.where(node_flags == FLAG_FLUID, w, 0.0)
        total = jnp.sum(w, axis=-1)
        w = w / jnp.maximum(total, 1e-30)[:, None]
    else:
        total = jnp.ones(pos.shape[0], dtype=pos.dtype)
    if weight_mask is not None:
        w = w * weight_mask[:, None]
    if return_total:
        return idx, w.astype(pos.dtype), total.astype(pos.dtype)
    return idx, w.astype(pos.dtype)


def interpolate(field, idx, w):
    """Gather-interpolate a [3, X, Y, Z] field to vertices: [P, 3]."""
    vals = field[:, idx[..., 0], idx[..., 1], idx[..., 2]]  # [3, P, 8]
    return jnp.einsum("cpk,pk->pc", vals, w)


def spread(forces, idx, w, shape, dtype=None):
    """Scatter-add vertex forces into a [3, X, Y, Z] force field.

    forces: [P, 3] (already capped / masked)
    """
    dtype = dtype or forces.dtype
    X, Y, Z = shape
    flat_idx = (idx[..., 0] * Y + idx[..., 1]) * Z + idx[..., 2]  # [P, 8]
    contrib = w[..., None] * forces[:, None, :]  # [P, 8, 3]
    out = jnp.zeros((X * Y * Z, 3), dtype=dtype)
    out = out.at[flat_idx.reshape(-1)].add(contrib.reshape(-1, 3))
    return out.reshape(X, Y, Z, 3).transpose(3, 0, 1, 2)


def cap_force(force, f_limit):
    """Stability force cap applied at spreading
    (core/hemoCellParticleField.cpp:848-852): rescale vectors whose magnitude
    exceeds f_limit."""
    mag = jnp.linalg.norm(force, axis=-1, keepdims=True)
    scale = jnp.where(mag > f_limit, f_limit / jnp.maximum(mag, 1e-30), 1.0)
    return force * scale


def on_boundary(pos, flags):
    """True where the nearest lattice node to a vertex is a wall
    (particle-deletion criterion, core/hemoCellParticleField.cpp:566-588)."""
    shape = jnp.asarray(flags.shape, dtype=jnp.int32)
    node = jnp.mod(jnp.floor(pos + 0.5).astype(jnp.int32), shape[None, :])
    return flags[node[..., 0], node[..., 1], node[..., 2]] != FLAG_FLUID
