"""Inter-cell and boundary repulsion forces.

TPU-native replacement for the particle-grid pair loops
(reference: core/hemoCellParticleField.cpp:677-743 ``applyRepulsionForce``
and :865-918 ``applyBoundaryRepulsionForce``).

Force law (inner_loop macro, hemoCellParticleField.cpp:686-694): for vertices
of *different* cells closer than ``cutoff``::

    F = k_rep * (cutoff / d) * (dv / d)        on the local vertex, +;
                                               reaction on the neighbour, -.

Neighbour search: vertices are binned to their nearest lattice node and each
vertex scans the 27 surrounding bins — same structure as the reference's
per-node particle grid (cap ``PARTICLES_PER_NODE``,
hemoCellParticleField.h), but realised as a sort + searchsorted gather with
fixed candidate capacity so shapes stay static under jit.

Boundary repulsion needs no particle list at all: wall nodes adjacent to
fluid are a precomputed mask, and every vertex checks its 27 surrounding
nodes against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import FLAG_FLUID, FLAG_WALL

# 27-neighbourhood offsets
_NBR = np.array(
    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=np.int32,
)

# matches the reference particle-grid capacity (PARTICLES_PER_NODE)
BIN_CAPACITY = 10


def repulsion_forces(
    pos_flat, cell_gid, active, shape, k_rep, cutoff, bin_capacity=BIN_CAPACITY
):
    """Pairwise repulsion between vertices of different cells.

    pos_flat: [P, 3] all vertices (all types), lattice units (unwrapped)
    cell_gid: [P] int32 global cell id per vertex
    active:   [P] float 0/1 (dead cells excluded)
    shape:    lattice (X, Y, Z)
    Returns [P, 3] repulsion force per vertex.
    """
    X, Y, Z = (int(s) for s in shape)
    P = pos_flat.shape[0]
    nbins = X * Y * Z
    shp = jnp.asarray([X, Y, Z], dtype=jnp.int32)

    pos_w = jnp.mod(pos_flat, shp.astype(pos_flat.dtype)[None, :])
    node = jnp.mod(jnp.floor(pos_w + 0.5).astype(jnp.int32), shp[None, :])
    bin_id = (node[:, 0] * Y + node[:, 1]) * Z + node[:, 2]
    # dead vertices into a virtual overflow bin
    bin_id = jnp.where(active > 0, bin_id, nbins)

    order = jnp.argsort(bin_id)
    sorted_bins = bin_id[order]

    # candidate gather: for each vertex, 27 neighbour bins x capacity slots
    nbr = jnp.asarray(_NBR)  # [27,3]
    nbr_nodes = jnp.mod(node[:, None, :] + nbr[None, :, :], shp[None, None, :])
    nbr_bins = (nbr_nodes[..., 0] * Y + nbr_nodes[..., 1]) * Z + nbr_nodes[..., 2]

    starts = jnp.searchsorted(sorted_bins, nbr_bins.reshape(-1)).reshape(P, 27)
    slot = jnp.arange(bin_capacity, dtype=jnp.int32)
    cand_rank = starts[:, :, None] + slot[None, None, :]  # [P, 27, C]
    cand_rank_c = jnp.minimum(cand_rank, P - 1)
    cand_idx = order[cand_rank_c]  # [P, 27, C]
    # valid: slot within this bin's run and not past the array
    cand_bin = sorted_bins[cand_rank_c]
    valid = (cand_rank < P) & (cand_bin == nbr_bins[:, :, None])

    cand_pos = pos_w[cand_idx]  # [P, 27, C, 3]
    cand_gid = cell_gid[cand_idx]
    cand_active = active[cand_idx] > 0

    dv = pos_w[:, None, None, :] - cand_pos  # [P,27,C,3]
    # minimum-image for periodic wrap
    fshp = shp.astype(pos_flat.dtype)
    dv = dv - jnp.round(dv / fshp) * fshp
    d2 = jnp.sum(dv * dv, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-30))

    pair_ok = (
        valid
        & cand_active
        & (cand_gid != cell_gid[:, None, None])
        & (d < cutoff)
    )
    mag = jnp.where(pair_ok, k_rep * (cutoff / d) / d, 0.0)
    force = jnp.sum(mag[..., None] * dv, axis=(1, 2))  # [P, 3]
    return force * active[:, None]


def boundary_neighbor_mask(flags: np.ndarray) -> np.ndarray:
    """Wall nodes with at least one fluid neighbour in their 27-neighbourhood
    (populateBoundaryParticles, core/hemoCellParticleField.cpp:865-889)."""
    wall = flags == FLAG_WALL
    fluid = flags == FLAG_FLUID
    near_fluid = np.zeros_like(fluid)
    for dx, dy, dz in _NBR:
        near_fluid |= np.roll(fluid, (-dx, -dy, -dz), axis=(0, 1, 2))
    return (wall & near_fluid).astype(np.uint8)


def boundary_repulsion_forces(pos_flat, active, bmask, shape, k_rep, cutoff):
    """Repulsion from wall nodes adjacent to fluid
    (applyBoundaryRepulsionForce, core/hemoCellParticleField.cpp:891-918):
    F += k * (cutoff/d) * (dv/d) for each such node within cutoff.

    bmask: [X,Y,Z] uint8 from boundary_neighbor_mask.
    """
    shp = jnp.asarray(shape, dtype=jnp.int32)
    fshp = shp.astype(pos_flat.dtype)
    pos_w = jnp.mod(pos_flat, fshp[None, :])
    node = jnp.mod(jnp.floor(pos_w + 0.5).astype(jnp.int32), shp[None, :])
    nbr = jnp.asarray(_NBR)
    nbr_nodes = jnp.mod(node[:, None, :] + nbr[None, :, :], shp[None, None, :])
    is_b = bmask[nbr_nodes[..., 0], nbr_nodes[..., 1], nbr_nodes[..., 2]] > 0
    dv = pos_w[:, None, :] - nbr_nodes.astype(pos_flat.dtype)
    dv = dv - jnp.round(dv / fshp) * fshp
    d = jnp.sqrt(jnp.maximum(jnp.sum(dv * dv, axis=-1), 1e-30))
    ok = is_b & (d < cutoff)
    mag = jnp.where(ok, k_rep * (cutoff / d) / d, 0.0)
    force = jnp.sum(mag[..., None] * dv, axis=1)
    return force * active[:, None]
