"""Membrane constitutive models as pure force functions.

TPU-native re-design of the reference mechanics
(mechanics/{rbcHighOrderModel,pltSimpleModel,wbcHighOrderModel,
rbcMalariaModel}.cpp): instead of per-particle pointer loops, each model is a
pure function ``(pos[nv,3], vel[nv,3]) -> forces`` over one cell built from
gathers over precomputed index arrays and ``.at[].add`` segment-sums, and is
``vmap``-ed over all cells of a type.  All force terms, nonlinearities, and
stability clamps match the reference formulas exactly; see per-function
citations.

The topology arrives as a dict of device arrays (from ``CellTopology``), the
coefficients as ``MaterialConstants``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import (
    MAX_CELL_BENDING_ANGLE,
    MAX_CELL_PERSISTENCE_LENGTH,
    MAX_CELL_SURFACE_AREA_CHANGE,
    MAX_CELL_VOLUMETRIC_CHANGE,
    MAX_PLT_BENDING_ANGLE,
)
from ..mesh.topology import CellTopology

# The reference clamps the membrane-viscosity force magnitude at
# FORCE_LIMIT/4 with FORCE_LIMIT the raw macro value 50 interpreted in lattice
# units (rbcHighOrderModel.cpp:195-197) — effectively inactive; kept for
# parity.
_VISC_CLAMP = 50.0 / 4.0


class ForceTerms(NamedTuple):
    """Per-vertex force decomposition (mirrors the six aliasable output
    vectors, core/hemoCellParticle.h:78-83)."""

    total: jnp.ndarray
    area: jnp.ndarray
    volume: jnp.ndarray
    link: jnp.ndarray
    bending: jnp.ndarray
    visc: jnp.ndarray
    inner_link: jnp.ndarray


def topology_device_arrays(topo: CellTopology, dtype=jnp.float32) -> dict:
    """Upload topology to fixed device arrays used by the force kernels."""
    f = lambda x: jnp.asarray(x, dtype=dtype)
    i = lambda x: jnp.asarray(x, dtype=jnp.int32)
    return {
        "tri": i(topo.triangles),
        "edges": i(topo.edges),
        "edge_len_eq": f(topo.edge_len_eq),
        "edge_angle_eq": f(topo.edge_angle_eq),
        "tri_area_eq": f(topo.tri_area_eq),
        "bend_outer": i(topo.bend_outer),
        "bend_tri": i(topo.bend_tri),
        "ring": i(np.where(topo.ring < 0, 0, topo.ring)),
        "ring_n": f(topo.ring_n),
        "ring_pairs": i(topo.ring_pairs),
        "ring_mask": f(topo.ring_mask),
        "patch_dist_eq": f(topo.patch_dist_eq),
        "inner_edges": i(topo.inner_edges),
        "inner_edge_len_eq": f(topo.inner_edge_len_eq),
        "volume_eq": f(topo.volume_eq),
        "area_mean_eq": f(topo.area_mean_eq),
        "edge_mean_eq": f(topo.edge_mean_eq),
        "num_vertices": topo.num_vertices,
    }


def _triangle_geometry(pos, tri):
    v0 = pos[tri[:, 0]]
    v1 = pos[tri[:, 1]]
    v2 = pos[tri[:, 2]]
    cr = jnp.cross(v1 - v0, v2 - v0)
    dbl_area = jnp.linalg.norm(cr, axis=1)
    area = 0.5 * dbl_area
    normal = cr / jnp.maximum(dbl_area, 1e-30)[:, None]
    # signed volume contribution v0 . (v1 x v2) / 6 summed later
    vol6 = jnp.einsum("ij,ij->i", v0, jnp.cross(v1, v2))
    return v0, v1, v2, area, normal, vol6


def _area_volume_forces(pos, t, k_area, k_volume, fa, fv):
    """Shared area + volume force terms (identical between the HO and PLT
    models; rbcHighOrderModel.cpp:56-124, pltSimpleModel.cpp:59-122)."""
    tri = t["tri"]
    v0, v1, v2, area, normal, vol6 = _triangle_geometry(pos, tri)
    volume = jnp.sum(vol6) / 6.0

    area_ratio = (area - t["tri_area_eq"]) / t["tri_area_eq"]
    afm = k_area * (
        area_ratio
        + area_ratio / jnp.abs(MAX_CELL_SURFACE_AREA_CHANGE - area_ratio * area_ratio)
    )
    centroid = (v0 + v1 + v2) / 3.0
    fa = fa.at[tri[:, 0]].add(afm[:, None] * (centroid - v0))
    fa = fa.at[tri[:, 1]].add(afm[:, None] * (centroid - v1))
    fa = fa.at[tri[:, 2]].add(afm[:, None] * (centroid - v2))

    volume_frac = (volume - t["volume_eq"]) / t["volume_eq"]
    volume_force = -k_volume * volume_frac / jnp.abs(
        MAX_CELL_VOLUMETRIC_CHANGE - volume_frac * volume_frac
    )
    local_vf = (volume_force * normal) * (area / t["area_mean_eq"])[:, None]
    fv = fv.at[tri[:, 0]].add(local_vf)
    fv = fv.at[tri[:, 1]].add(local_vf)
    fv = fv.at[tri[:, 2]].add(local_vf)
    return fa, fv, volume


def _link_visc_forces(pos, vel, t, k_link, eta_m, fl, fviz):
    """Shared edge link + membrane-viscosity terms
    (rbcHighOrderModel.cpp:168-204)."""
    e = t["edges"]
    p0, p1 = pos[e[:, 0]], pos[e[:, 1]]
    ev = p1 - p0
    el = jnp.linalg.norm(ev, axis=1)
    uv = ev / el[:, None]
    frac = (el - t["edge_len_eq"]) / t["edge_len_eq"]
    efs = k_link * (
        frac + frac / jnp.abs(MAX_CELL_PERSISTENCE_LENGTH - frac * frac)
    )
    force = uv * efs[:, None]
    fl = fl.at[e[:, 0]].add(force)
    fl = fl.at[e[:, 1]].add(-force)

    rel_vel = vel[e[:, 1]] - vel[e[:, 0]]
    proj = jnp.einsum("ij,ij->i", rel_vel, uv)[:, None] * uv
    fvm = eta_m * proj
    mag = jnp.linalg.norm(fvm, axis=1, keepdims=True)
    fvm = jnp.where(mag > _VISC_CLAMP, fvm * (_VISC_CLAMP / jnp.maximum(mag, 1e-30)), fvm)
    fviz = fviz.at[e[:, 0]].add(fvm)
    fviz = fviz.at[e[:, 1]].add(-fvm)
    return fl, fviz, uv, el


def _patch_bending_forces(pos, t, k_bend, fb):
    """High-order patch-normal bending (rbcHighOrderModel.cpp:126-166):
    deviation of the 1-ring centroid along the local patch normal vs its
    equilibrium value, normalised by the mean eq edge length."""
    ring = t["ring"]  # [nv, 6]
    mask = t["ring_mask"]  # [nv, 6] float 0/1
    ring_n = t["ring_n"]  # [nv]
    pairs = t["ring_pairs"]  # [nv, 6, 2]

    nbr = pos[ring]  # [nv, 6, 3]
    centroid = jnp.sum(nbr * mask[..., None], axis=1) / ring_n[:, None]
    dev = centroid - pos

    a = pos[pairs[..., 0]] - pos[:, None, :]  # [nv, 6, 3]
    b = pos[pairs[..., 1]] - pos[:, None, :]
    tn = jnp.cross(a, b)
    tn = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-30)
    patch = jnp.sum(tn * mask[..., None], axis=1)
    patch = patch / jnp.maximum(jnp.linalg.norm(patch, axis=-1, keepdims=True), 1e-30)

    ndev = jnp.einsum("ij,ij->i", patch, dev)
    ddev = (ndev - t["patch_dist_eq"]) / t["edge_mean_eq"]
    mag = k_bend * (ddev + ddev / jnp.abs(MAX_CELL_BENDING_ANGLE - ddev * ddev))
    bf = mag[:, None] * patch  # [nv, 3]
    fb = fb + bf
    # reaction: -bf/n distributed over the ring members
    neg = -(bf / ring_n[:, None])[:, None, :] * mask[..., None]  # [nv,6,3]
    fb = fb.at[ring.reshape(-1)].add(neg.reshape(-1, 3))
    return fb


def _dihedral_bending_forces(pos, t, k_bend, fb):
    """Platelet bending via the signed dihedral angle between adjacent
    triangle pairs (pltSimpleModel.cpp:154-184)."""
    e = t["edges"]
    tri = t["tri"]
    bt = t["bend_tri"]
    outer = t["bend_outer"]

    def tri_normal(tid):
        a, b, c = tri[tid, 0], tri[tid, 1], tri[tid, 2]
        cr = jnp.cross(pos[b] - pos[a], pos[c] - pos[a])
        return cr / jnp.maximum(jnp.linalg.norm(cr, axis=-1, keepdims=True), 1e-30)

    n1 = tri_normal(bt[:, 0])
    n2 = tri_normal(bt[:, 1])
    ev = pos[e[:, 1]] - pos[e[:, 0]]
    uv = ev / jnp.maximum(jnp.linalg.norm(ev, axis=1, keepdims=True), 1e-30)
    angle = jnp.arctan2(
        jnp.einsum("ij,ij->i", jnp.cross(n1, n2), uv),
        jnp.einsum("ij,ij->i", n1, n2),
    )
    frac = angle - t["edge_angle_eq"]
    mag = k_bend * (frac + frac / jnp.abs(MAX_PLT_BENDING_ANGLE - frac * frac))
    bf = mag[:, None] * (n1 + n2) * 0.5
    fb = fb.at[e[:, 0]].add(bf)
    fb = fb.at[e[:, 1]].add(bf)
    fb = fb.at[outer[:, 0]].add(-bf)
    fb = fb.at[outer[:, 1]].add(-bf)
    return fb


def _inner_link_forces(pos, t, k, fi, linear_scale=5.0):
    """Linear transverse stiffening springs (pltSimpleModel.cpp:186-206,
    rbcMalariaModel.cpp:199-218): F = k * linear_scale * strain."""
    ie = t["inner_edges"]
    if ie.shape[0] == 0:
        return fi
    p0, p1 = pos[ie[:, 0]], pos[ie[:, 1]]
    ev = p1 - p0
    el = jnp.linalg.norm(ev, axis=1)
    uv = ev / el[:, None]
    frac = (el - t["inner_edge_len_eq"]) / t["inner_edge_len_eq"]
    efs = k * linear_scale * frac
    force = uv * efs[:, None]
    fi = fi.at[ie[:, 0]].add(force)
    fi = fi.at[ie[:, 1]].add(-force)
    return fi


def _wbc_core_forces(pos, t, k_cyto, k_rigid, radius, core_radius, fi):
    """WBC rigid-core repulsive inner links (wbcHighOrderModel.cpp:201-223)."""
    ie = t["inner_edges"]
    if ie.shape[0] == 0:
        return fi
    p0, p1 = pos[ie[:, 0]], pos[ie[:, 1]]
    ev = p1 - p0
    el = jnp.linalg.norm(ev, axis=1)
    uv = ev / el[:, None]
    f1 = jnp.where(el < 2 * radius, (1.0 - el / (2 * radius)) * k_cyto, 0.0)
    f2 = jnp.where(
        el < 2 * core_radius, (1.0 - el / (2 * core_radius)) * k_rigid, 0.0
    )
    force = uv * (f1 + f2)[:, None]
    fi = fi.at[ie[:, 0]].add(-force)
    fi = fi.at[ie[:, 1]].add(force)
    return fi


def _zeros(pos):
    return jnp.zeros_like(pos)


def _pack(fa, fv, fl, fb, fviz, fi):
    total = fa + fv + fl + fb + fviz + fi
    return ForceTerms(total, fa, fv, fl, fb, fviz, fi)


# ---------------------------------------------------------------------------
# Models


def rbc_ho_forces(pos, vel, t, mc) -> ForceTerms:
    """RbcHighOrderModel (mechanics/rbcHighOrderModel.cpp:38-207)."""
    fa = fv = fl = fb = fviz = fi = _zeros(pos)
    fa, fv, _ = _area_volume_forces(pos, t, mc["k_area"], mc["k_volume"], fa, fv)
    fb = _patch_bending_forces(pos, t, mc["k_bend"], fb)
    fl, fviz, _, _ = _link_visc_forces(pos, vel, t, mc["k_link"], mc["eta_m"], fl, fviz)
    return _pack(fa, fv, fl, fb, fviz, fi)


def plt_simple_forces(pos, vel, t, mc) -> ForceTerms:
    """PltSimpleModel (mechanics/pltSimpleModel.cpp:44-215)."""
    fa = fv = fl = fb = fviz = fi = _zeros(pos)
    fa, fv, _ = _area_volume_forces(pos, t, mc["k_area"], mc["k_volume"], fa, fv)
    fl, fviz, _, _ = _link_visc_forces(pos, vel, t, mc["k_link"], mc["eta_m"], fl, fviz)
    fb = _dihedral_bending_forces(pos, t, mc["k_bend"], fb)
    # note: PLT inner links use k_link (pltSimpleModel.cpp:199)
    fi = _inner_link_forces(pos, t, mc["k_link"], fi)
    return _pack(fa, fv, fl, fb, fviz, fi)


def wbc_ho_forces(pos, vel, t, mc) -> ForceTerms:
    """WbcHighOrderModel (mechanics/wbcHighOrderModel.cpp): RBC terms plus a
    repulsive rigid core over the inner edges."""
    fa = fv = fl = fb = fviz = fi = _zeros(pos)
    fa, fv, _ = _area_volume_forces(pos, t, mc["k_area"], mc["k_volume"], fa, fv)
    fb = _patch_bending_forces(pos, t, mc["k_bend"], fb)
    fl, fviz, _, _ = _link_visc_forces(pos, vel, t, mc["k_link"], mc["eta_m"], fl, fviz)
    fi = _wbc_core_forces(
        pos, t, mc["k_cytoskeleton"], mc["k_inner_rigid"], mc["radius"],
        mc["core_radius"], fi,
    )
    return _pack(fa, fv, fl, fb, fviz, fi)


def rbc_malaria_forces(pos, vel, t, mc) -> ForceTerms:
    """RbcMalariaModel (mechanics/rbcMalariaModel.cpp): RBC terms plus linear
    inner links with k_inner_link."""
    fa = fv = fl = fb = fviz = fi = _zeros(pos)
    fa, fv, _ = _area_volume_forces(pos, t, mc["k_area"], mc["k_volume"], fa, fv)
    fb = _patch_bending_forces(pos, t, mc["k_bend"], fb)
    fl, fviz, _, _ = _link_visc_forces(pos, vel, t, mc["k_link"], mc["eta_m"], fl, fviz)
    fi = _inner_link_forces(pos, t, mc["k_inner_link"], fi)
    return _pack(fa, fv, fl, fb, fviz, fi)


def noop_forces(pos, vel, t, mc) -> ForceTerms:
    """NoOp model for passive tracer particles (mechanics/NoOp.h)."""
    z = _zeros(pos)
    return ForceTerms(z, z, z, z, z, z, z)


MODEL_REGISTRY = {
    "RbcHighOrderModel": rbc_ho_forces,
    "PltSimpleModel": plt_simple_forces,
    "WbcHighOrderModel": wbc_ho_forces,
    "RbcMalariaModel": rbc_malaria_forces,
    "NoOp": noop_forces,
}


def cell_volume(pos, tri):
    """Signed volume of one cell (same expansion the models use)."""
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    return jnp.sum(jnp.einsum("ij,ij->i", v0, jnp.cross(v1, v2))) / 6.0


def cell_area(pos, tri):
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    return 0.5 * jnp.sum(jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=1))
