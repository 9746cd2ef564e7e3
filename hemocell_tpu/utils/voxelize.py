"""STL voxelizer: triangle mesh -> uint8 flag matrix (fluid/wall).

Offline numpy replacement for the Palabos ``VoxelizedDomain3D`` pipeline used
by ``getFlagMatrixFromSTL`` (reference: helper/voxelizeDomain.cpp:75-151):

  * scale the STL so its extent along ``ref_dir`` spans ``ref_dir_n`` lattice
    nodes (DEFscaledMesh semantics), with a 1-node margin;
  * classify node centres by ray-casting parity (Möller–Trumbore along +x);
  * flags: FLUID inside (incl. inner border), WALL outside;
  * open the two ends along the flow axis by copying the neighbouring slice
    (CopyFromNeighbor, voxelizeDomain.cpp:140-151) so a tube becomes
    periodic-flow-ready.
"""

from __future__ import annotations

import numpy as np

from ..config.defaults import FLAG_FLUID, FLAG_WALL
from ..mesh.generate import _read_stl


def voxelize_stl(
    path: str,
    ref_dir_n: int,
    ref_dir: int = 1,
    margin: int = 1,
    open_ends_axis: int | None = 0,
    erode: int = 0,
):
    """Returns (flags uint8 [X,Y,Z], info dict)."""
    tris = _read_stl(path)  # [nt, 3, 3]
    lo = tris.reshape(-1, 3).min(axis=0)
    hi = tris.reshape(-1, 3).max(axis=0)
    extent = hi - lo
    # DEFscaledMesh: ref_dir extent spans ref_dir_n lattice spacings
    scale = float(ref_dir_n) / extent[ref_dir]
    tris = (tris - lo) * scale + margin  # shift into [margin, margin+extent*scale]
    # irrational sub-voxel shift: rays through exactly-shared triangle edges
    # would break crossing parity
    tris = tris + np.array([0.0, 2.347e-4 * 2 ** 0.5, 1.731e-4 * 3 ** 0.5])
    ext_lu = extent * scale
    shape = tuple(int(np.ceil(e)) + 2 * margin + 1 for e in ext_lu)

    from ..native import voxelize_parity

    inside = voxelize_parity(tris, shape)  # native C++ (helper/voxelizeDomain)
    if inside is None:
        inside = _inside_by_parity(tris, shape)  # numpy fallback
    flags = np.where(inside, FLAG_FLUID, FLAG_WALL).astype(np.uint8)

    if open_ends_axis is not None:
        a = open_ends_axis
        # copy the first/last interior slices outward so the tube ends open
        first = np.take(flags, margin + 1, axis=a)
        last = np.take(flags, shape[a] - margin - 2, axis=a)
        for i in range(0, margin + 1):
            _set_slice(flags, a, i, first)
            _set_slice(flags, a, shape[a] - 1 - i, last)

    if erode:
        # Palabos classifies `inside` then adds an innerBorder layer; our
        # parity test lands between the two.  ``erode=1`` reproduces the
        # reference's bare `inside` lumen (one face-connected voxel tighter)
        # — on the pipeflow tube it keeps 48 of 253 candidate cells vs 52
        # at erode=0 and the reference's 42 (measured, PARITY.md).
        fluid = _erode6(flags == FLAG_FLUID, erode, open_axis=open_ends_axis)
        flags = np.where(fluid, FLAG_FLUID, FLAG_WALL).astype(np.uint8)

    info = {
        "shape": shape,
        "scale": scale,
        "fluid_fraction": float((flags == FLAG_FLUID).mean()),
    }
    return flags, info


def _erode6(mask: np.ndarray, n: int, open_axis: int | None = 0) -> np.ndarray:
    """Binary-erode a boolean mask by ``n`` face-connected (6-neighbour)
    voxels.  Only the ``open_axis`` (flow-axis) boundary planes replicate
    outward (mode='edge') so the open-ends copy stays open-ended after
    erosion; all other axes pad with False (wall outside the domain), so a
    lumen touching a transverse border IS eroded from outside (ADVICE r03:
    'edge' on all axes silently under-eroded such geometries)."""
    pad_mode = [
        (1, 1) if ax == open_axis else (0, 0) for ax in range(mask.ndim)
    ]
    wall_pad = [
        (0, 0) if ax == open_axis else (1, 1) for ax in range(mask.ndim)
    ]
    for _ in range(n):
        p = np.pad(mask, pad_mode, mode="edge")
        p = np.pad(p, wall_pad, mode="constant", constant_values=False)
        mask = (
            mask
            & p[:-2, 1:-1, 1:-1] & p[2:, 1:-1, 1:-1]
            & p[1:-1, :-2, 1:-1] & p[1:-1, 2:, 1:-1]
            & p[1:-1, 1:-1, :-2] & p[1:-1, 1:-1, 2:]
        )
    return mask


def _set_slice(arr, axis, idx, value):
    sl = [slice(None)] * arr.ndim
    sl[axis] = idx
    arr[tuple(sl)] = value


def pad_flags_axis(
    flags: np.ndarray,
    axis: int = 0,
    multiple: int = 8,
    mode: str = "extend",
):
    """Pad a flag matrix along ``axis`` up to the next multiple of
    ``multiple`` so the domain is lane-fold- and shard-friendly (TPU lane
    tiles are 128 wide; the shard_map runner needs X % n_shards == 0).

    ``mode='extend'`` replicates the boundary plane — exact for flow-axis
    periodic domains whose geometry is uniform at the wrap (the voxelizer's
    open-ends copy guarantees the two end planes match; asserted here).
    ``mode='wall'`` appends solid planes — inert for non-periodic axes.

    The reference instead decomposes any domain into arbitrary blocks
    (core/hemoCell.cpp:438-571); dense sharded arrays want divisible
    extents, and solid/replicated padding planes are the cheap equivalent.

    Returns (padded_flags, n_added).
    """
    n = flags.shape[axis]
    target = -(-n // multiple) * multiple
    add = target - n
    if add == 0:
        return flags, 0
    if mode == "extend":
        first = np.take(flags, 0, axis=axis)
        last = np.take(flags, n - 1, axis=axis)
        if not np.array_equal(first, last):
            raise ValueError(
                "extend-padding requires matching boundary planes along "
                f"axis {axis} (periodic-uniform geometry); use mode='wall'"
            )
        reps = [1] * flags.ndim
        reps[axis] = add
        pad_block = np.tile(np.expand_dims(last, axis), reps)
    elif mode == "wall":
        pad_shape = list(flags.shape)
        pad_shape[axis] = add
        pad_block = np.full(pad_shape, FLAG_WALL, dtype=flags.dtype)
    else:
        raise ValueError(f"unknown pad mode {mode!r}")
    return np.concatenate([flags, pad_block], axis=axis), add


def pad_flags_tpu(flags: np.ndarray, x_mode: str = "extend"):
    """Pad a voxelized domain to TPU-friendly extents on all three axes:

    - X -> multiple of 8 (``x_mode``: 'extend' replicates the boundary
      plane — exact for flow-axis-periodic tubes; 'wall' appends solid)
    - Y -> multiple of 8 (f32 sublane tile) with wall planes
    - Z -> the smallest lane-fold-exact extent (a divisor of 128: 16, 32,
      64, 128) when the extra nodes cost <= 35%, else the next multiple
      of 8 — so fold_field can fill the whole 128-lane vector tile and
      the IBM spread output's 2Z lanes align

    Wall planes are inert (pure bounce-back, no flow reaches them); the
    reference instead decomposes arbitrary extents into blocks
    (core/hemoCell.cpp:438-571) — dense TPU arrays want aligned extents.

    Returns (padded_flags, (ax, ay, az)).
    """
    f1, ax = pad_flags_axis(flags, axis=0, multiple=8, mode=x_mode)
    f2, ay = pad_flags_axis(f1, axis=1, multiple=8, mode="wall")
    Z = f2.shape[2]
    z_target = -(-Z // 8) * 8
    for cand in (16, 32, 64, 128):
        if cand >= Z and cand <= Z * 1.35:
            z_target = cand
            break
    f3, az = pad_flags_axis(f2, axis=2, multiple=z_target, mode="wall")
    return f3, (ax, ay, az)


def _inside_by_parity(tris: np.ndarray, shape) -> np.ndarray:
    """Node-centre inside test by counting +x ray crossings (vectorised
    Möller–Trumbore; the same parity idea as the reference's octree raycast,
    helper/mollerTrumbore.h:30-76, applied to the whole domain)."""
    X, Y, Z = shape
    v0 = tris[:, 0]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0
    # ray direction +x: h = cross(d, e2) = (0, -e2z, e2y)
    hy = -e2[:, 2]
    hz = e2[:, 1]
    a = e1[:, 1] * hy + e1[:, 2] * hz  # dot(e1, h)
    ok = np.abs(a) > 1e-12
    inv_a = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)

    ys = np.arange(Y, dtype=np.float64)
    zs = np.arange(Z, dtype=np.float64)

    # iterate over triangles in chunks, accumulate crossing parity per column
    # crossing x-position array per (tri, y, z) would be huge; instead loop
    # triangles and accumulate a per-column sorted list lazily via counts per
    # x-cell boundary: we bucket the crossing x into integer cells and use
    # parity prefix sums.
    cross_count = np.zeros((X + 1, Y, Z), dtype=np.int32)
    CH = 512
    for s in range(0, tris.shape[0], CH):
        t = slice(s, min(s + CH, tris.shape[0]))
        v0c, e1c, e2c = v0[t], e1[t], e2[t]
        hyc, hzc, inva, okc = hy[t], hz[t], inv_a[t], ok[t]
        # s_vec = origin - v0 ; origin=(0, y, z)
        sy = ys[None, :, None] - v0c[:, 1][:, None, None]  # [T, Y, 1]
        sz = zs[None, None, :] - v0c[:, 2][:, None, None]  # [T, 1, Z]
        u = (sy * hyc[:, None, None] + sz * hzc[:, None, None]) * inva[:, None, None]
        # q = cross(s, e1); s = (-v0x, sy, sz) with ray origin x=0
        sx = -v0c[:, 0][:, None, None]
        qx = sy * e1c[:, 2][:, None, None] - sz * e1c[:, 1][:, None, None]
        qy = sz * e1c[:, 0][:, None, None] - sx * e1c[:, 2][:, None, None]
        qz = sx * e1c[:, 1][:, None, None] - sy * e1c[:, 0][:, None, None]
        # v = dot(d, q) where d = (1,0,0) -> qx
        vv = qx * inva[:, None, None]
        tt = (
            e2c[:, 0][:, None, None] * qx
            + e2c[:, 1][:, None, None] * qy
            + e2c[:, 2][:, None, None] * qz
        ) * inva[:, None, None]
        hit = (
            okc[:, None, None]
            & (u >= 0.0)
            & (vv >= 0.0)
            & (u + vv <= 1.0)
            & (tt > 0.0)
        )
        # crossing at x = tt; bucket into cell ceil(tt - 0.0) for node parity:
        # node at integer x is inside if an odd number of crossings lie at
        # larger x. Bucket crossings by floor(tt)+1 boundary index.
        xb = np.clip(np.floor(tt).astype(np.int64) + 1, 0, X)
        ti, yi, zi = np.nonzero(hit)
        np.add.at(cross_count, (xb[ti, yi, zi], yi, zi), 1)

    # parity of crossings with x > node_x: suffix sum
    suffix = np.cumsum(cross_count[::-1], axis=0)[::-1]
    # node x sees crossings in buckets > x: suffix at x+1
    inside = (suffix[1:] % 2) == 1
    return inside
