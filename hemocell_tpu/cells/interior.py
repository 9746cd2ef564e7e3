"""Interior viscosity: classify lattice nodes inside cell membranes and
raise their relaxation time.

TPU-native equivalent of the reference's octree raycast + dynamics swap
(helper/interiorViscosity.{h,cpp}, helper/octree.{h,cpp},
core/hemoCellParticleField.cpp:746-807): instead of recursive octrees and
per-node dynamics objects, each cell's interior is found by a vectorised
Möller–Trumbore ray-parity test over a fixed-size local box, and the result
is an omega field (1/tau_interior inside, 1/tau outside) consumed by the
masked collision kernel.

All shapes are static: the local box edge ``box`` must cover the largest
cell diameter; the per-cell test is lax.map-ed to bound memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _cell_inside_local(pos, tri, box):
    """Inside-parity for one cell on a box^3 local grid anchored at
    floor(min(pos)) - 1.  Rays along +x; crossing parity per column.

    pos: [NV, 3] vertex positions (lattice units, unwrapped)
    tri: [NT, 3] int32
    Returns (anchor [3] int32, inside [box, box, box] bool).
    """
    anchor = jnp.floor(pos.min(axis=0)).astype(jnp.int32) - 1
    local = pos - anchor.astype(pos.dtype)  # in [1, box-2] for a fitting cell
    # irrational sub-voxel shift so rays never pass exactly through shared
    # triangle edges/vertices (which would break crossing parity)
    local = local + jnp.asarray(
        [0.0, 2.347e-4 * 2 ** 0.5, 1.731e-4 * 3 ** 0.5], dtype=pos.dtype
    )

    v0 = local[tri[:, 0]]
    e1 = local[tri[:, 1]] - v0
    e2 = local[tri[:, 2]] - v0

    ys = jnp.arange(box, dtype=pos.dtype)
    zs = jnp.arange(box, dtype=pos.dtype)

    hy = -e2[:, 2]
    hz = e2[:, 1]
    a = e1[:, 1] * hy + e1[:, 2] * hz
    ok = jnp.abs(a) > 1e-12
    inv_a = jnp.where(ok, 1.0 / jnp.where(ok, a, 1.0), 0.0)

    sy = ys[None, :, None] - v0[:, 1][:, None, None]  # [NT, box, 1]
    sz = zs[None, None, :] - v0[:, 2][:, None, None]  # [NT, 1, box]
    u = (sy * hy[:, None, None] + sz * hz[:, None, None]) * inv_a[:, None, None]
    sx = -v0[:, 0][:, None, None]
    qx = sy * e1[:, 2][:, None, None] - sz * e1[:, 1][:, None, None]
    qy = sz * e1[:, 0][:, None, None] - sx * e1[:, 2][:, None, None]
    qz = sx * e1[:, 1][:, None, None] - sy * e1[:, 0][:, None, None]
    vv = qx * inv_a[:, None, None]
    tt = (
        e2[:, 0][:, None, None] * qx
        + e2[:, 1][:, None, None] * qy
        + e2[:, 2][:, None, None] * qz
    ) * inv_a[:, None, None]
    hit = ok[:, None, None] & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt > 0)

    # node x inside iff crossings with tt > x are odd
    xs = jnp.arange(box, dtype=pos.dtype)
    # [NT, box(x), box(y), box(z)]
    beyond = hit[:, None, :, :] & (tt[:, None, :, :] > xs[None, :, None, None])
    count = jnp.sum(beyond.astype(jnp.int32), axis=0)
    return anchor, (count % 2) == 1


@partial(jax.jit, static_argnames=("shape", "box", "x_extent", "y_extent"))
def interior_mask(pos, tri, alive, shape, box, x_origin=0, x_extent=None,
                  y_origin=0, y_extent=None):
    """Union of cell interiors on the periodic lattice.

    pos: [NC, NV, 3]; tri [NT, 3]; alive [NC] bool.
    Returns bool [X, Y, Z].

    ``x_origin``/``x_extent`` (and ``y_origin``/``y_extent`` on 2-D tile
    decompositions) restrict the output to a local tile of the global
    domain (shard_map mode: each shard computes the update for its own
    rows; out-of-tile scatter indices are dropped by JAX's jit scatter
    semantics)."""
    X, Y, Z = shape
    xe = X if x_extent is None else int(x_extent)
    ye = Y if y_extent is None else int(y_extent)
    shp = jnp.asarray(shape, jnp.int32)

    def one(args):
        p, a = args
        anchor, inside = _cell_inside_local(p, tri, box)
        return anchor, inside & a

    anchors, insides = jax.lax.map(one, (pos, alive))

    # scatter local boxes into the (local-tile) mask (periodic wrap)
    bx = jnp.arange(box)
    grid = jnp.stack(
        jnp.meshgrid(bx, bx, bx, indexing="ij"), axis=-1
    )  # [box,box,box,3]
    mask = jnp.zeros((xe, ye, Z), dtype=jnp.int32)
    xo = jnp.asarray(x_origin, jnp.int32)
    yo = jnp.asarray(y_origin, jnp.int32)

    def body(k, mask):
        nodes = jnp.mod(anchors[k][None, None, None, :] + grid, shp)
        xl = jnp.mod(nodes[..., 0] - xo, X)  # >= xe rows drop (OOB scatter)
        yl = jnp.mod(nodes[..., 1] - yo, Y)
        return mask.at[
            xl, yl, nodes[..., 2]
        ].max(insides[k].astype(jnp.int32))

    mask = jax.lax.fori_loop(0, pos.shape[0], body, mask)
    return mask > 0


def omega_field_from_mask(mask, omega_bulk, omega_interior):
    """Per-node relaxation frequency (hemoCellField.cpp:100 tau mapping)."""
    return jnp.where(mask, omega_interior, omega_bulk)


def membrane_omega_update(om, pos, tri, alive, omega_interior, omega_bg,
                          edge_mean_eq, shape, x_origin=0, x_extent=None,
                          y_origin=0, y_extent=None):
    """Cheap interior-viscosity refresh at the membrane — the reference's
    second (fast) timescale (``internalGridPointsMembrane``,
    core/hemoCellParticleField.cpp:746-773): each vertex classifies its
    2x2x2 kernel nodes by the sign of dot(node - vertex, outward normal);
    nodes within ``edge_mean_eq`` of a vertex flip to the interior omega
    (inside) or back to the background (outside).  Far-from-membrane nodes
    keep whatever the last FULL raycast set — drift is bounded because the
    membrane sweep re-tags every node the surface passes over.

    om: [X, Y, Z] omega field; pos: [NC, NV, 3] unwrapped vertex positions.
    When several vertices claim one node, the NEAREST vertex's tangent
    plane decides (packed scatter-min over squared distance) — more
    accurate and deterministic, unlike the reference's particle-order
    last-writer-wins.

    ``x_origin``/``x_extent``: local-slab mode (see interior_mask) — om is
    then the [x_extent, Y, Z] local field."""
    NC, NV, _ = pos.shape
    X, Y, Z = (int(s) for s in shape)
    xe = X if x_extent is None else int(x_extent)
    ye = Y if y_extent is None else int(y_extent)
    dtype = om.dtype

    def cell_normals(p):
        v0, v1, v2 = p[tri[:, 0]], p[tri[:, 1]], p[tri[:, 2]]
        tn = jnp.cross(v1 - v0, v2 - v0)  # outward (consistent winding)
        n = jnp.zeros_like(p)
        for i in range(3):
            n = n.at[tri[:, i]].add(tn)
        return n

    normals = jax.vmap(cell_normals)(pos).reshape(-1, 3)
    p = pos.reshape(-1, 3)
    act = jnp.repeat(alive, NV)
    base = jnp.floor(p)
    r2max = jnp.asarray(edge_mean_eq * edge_mean_eq, dtype)

    # all 8 stencil nodes per vertex in one batch -> one scatter per pass
    offs = jnp.asarray(
        [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        dtype,
    )
    node = base[:, None, :] + offs[None, :, :]          # [P, 8, 3]
    lat = node - p[:, None, :]
    near = (lat * lat).sum(-1) <= r2max                  # [P, 8]
    near = near & act[:, None]
    inside = (lat * normals[:, None, :]).sum(-1) < 0.0

    ni = jnp.mod(node, jnp.asarray([X, Y, Z], dtype)).astype(jnp.int32)
    xl = jnp.mod(ni[..., 0] - jnp.asarray(x_origin, jnp.int32), X)
    yl = jnp.mod(ni[..., 1] - jnp.asarray(y_origin, jnp.int32), Y)
    lin = (xl * ye + yl) * Z + ni[..., 2]  # [P, 8]
    dump = xe * ye * Z  # masked entries land on a pad cell
    near = near & (xl < xe) & (yl < ye)

    # pack (squared distance, inside-bit) into one int32 key: scatter-min
    # picks the nearest claiming vertex, its LSB carries the verdict
    d2 = (lat * lat).sum(-1)
    key = (
        jnp.floor(d2 * 1.0e6).astype(jnp.int32) * 2
        + inside.astype(jnp.int32)
    )
    big = jnp.iinfo(jnp.int32).max
    keys = jnp.where(near, key, big).reshape(-1)
    idx = jnp.where(near, lin, dump).reshape(-1)
    acc = jnp.full(xe * ye * Z + 1, big, jnp.int32).at[idx].min(keys)[:-1]
    touched = acc < big
    om_new = jnp.where(
        (acc % 2) == 1,
        jnp.asarray(omega_interior, dtype),
        jnp.asarray(omega_bg, dtype),
    )
    return jnp.where(touched, om_new, om.reshape(-1)).reshape(xe, ye, Z)


def interior_tau(viscosity_ratio: float, tau: float) -> float:
    """tau_int = ratio*(tau-0.5)+0.5 (reference: core/hemoCellField.cpp:100)."""
    return viscosity_ratio * (tau - 0.5) + 0.5
