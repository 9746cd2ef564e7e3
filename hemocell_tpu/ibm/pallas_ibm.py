"""Pallas IBM kernels: force spreading and velocity interpolation over
x-slab-sorted vertices.

The TPU-native endgame for the IBM exchange: XLA's gather/scatter serialise
(~10 ms per 70k vertices at 64^3), so both directions are reformulated as
per-slab dense one-hot contractions executed on the MXU inside a Pallas
kernel:

  * vertices are sorted by their base x-slab once per call (bitonic sort +
    row permute in XLA) and stored component-major [3, P] so slab windows
    are lane-aligned DMA slices (Mosaic requires 128-aligned slice lanes);
  * the kernel grid runs over slabs; each program DMAs its slab's contiguous
    vertex columns (scalar-prefetched offsets, fixed capacity window into a
    tail-padded array — later programs overwrite earlier overhang; the grid
    is sequential on the single TensorCore);
  * one-hot interpolation matrices keep vertices in the LANE dimension
    (Sy [Y, C], Sz [Z, C]) so no in-kernel transposes are needed:
      spread:  out[y,z] = (Sy * a) @ Sz^T            (contract lanes)
      interp:  t = u @ Sz  ->  v = sum_y Sy * t      (row reduce)

Wall-free domains only (boundary-aware renormalisation falls back to the
jnp path); capacity overflow is returned for callers to assert on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slab_capacity(n_vertices: int, nx: int, safety: float = 4.0) -> int:
    """Static per-slab capacity: safety * mean occupancy rounded up to 512."""
    c = int(np.ceil(safety * max(1, n_vertices) / nx / 512.0) * 512)
    return max(512, min(c, int(np.ceil(n_vertices / 512.0) * 512)))


def _sort_by_slab(pos, X):
    ix = jnp.mod(jnp.floor(pos[:, 0]).astype(jnp.int32), X)
    order = jnp.argsort(ix)
    ix_s = ix[order]
    starts = jnp.searchsorted(
        ix_s, jnp.arange(X + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return order, starts


def _weights(pos3c, count, C, Y, Z):
    """One-hot interpolation rows from a [3, C] position block.

    Returns (Sy [Y, C], Sz [Z, C], wx0 [1, C], wx1 [1, C])."""
    px = pos3c[0:1, :]  # [1, C]
    py = pos3c[1:2, :]
    pz = pos3c[2:3, :]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) < count
    ).astype(pos3c.dtype)

    fx = px - jnp.floor(px)
    wx0 = (1.0 - fx) * valid
    wx1 = fx * valid

    iy = jnp.floor(py).astype(jnp.int32)  # [1, C]
    iz = jnp.floor(pz).astype(jnp.int32)
    fy = py - jnp.floor(py)
    fz = pz - jnp.floor(pz)

    ids_y = jax.lax.broadcasted_iota(jnp.int32, (Y, C), 0)
    ids_z = jax.lax.broadcasted_iota(jnp.int32, (Z, C), 0)
    Sy = (ids_y == jnp.mod(iy, Y)) * (1.0 - fy) + (
        ids_y == jnp.mod(iy + 1, Y)
    ) * fy  # [Y, C]
    Sz = (ids_z == jnp.mod(iz, Z)) * (1.0 - fz) + (
        ids_z == jnp.mod(iz + 1, Z)
    ) * fz  # [Z, C]
    return Sy, Sz, wx0, wx1


# ---------------------------------------------------------------------------
# spread


def _spread_kernel(C, Y, Z, starts_ref, pos_hbm, F_hbm, out_lo, out_hi,
                   pos_v, F_v, sem):
    g = pl.program_id(0)
    start = starts_ref[g]
    count = starts_ref[g + 1] - start

    cp_pos = pltpu.make_async_copy(
        pos_hbm.at[:, pl.ds(start, C)], pos_v, sem
    )
    cp_pos.start()
    cp_pos.wait()
    cp_f = pltpu.make_async_copy(F_hbm.at[:, pl.ds(start, C)], F_v, sem)
    cp_f.start()
    cp_f.wait()

    Sy, Sz, wx0, wx1 = _weights(pos_v[:], count, C, Y, Z)
    F = F_v[:]  # [3, C]

    for out_ref, wx in ((out_lo, wx0), (out_hi, wx1)):
        planes = []
        for c in range(3):
            M = Sy * (F[c : c + 1, :] * wx)  # [Y, C]
            planes.append(
                jax.lax.dot_general(
                    M, Sz,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=M.dtype,
                )  # [Y, Z]
            )
        out_ref[0] = jnp.stack(planes, axis=0)  # [3, Y, Z]


@functools.partial(jax.jit, static_argnames=("shape", "capacity", "interpret"))
def pallas_spread(pos, forces, shape, capacity=2048, interpret=None):
    """[P,3] forces -> [3,X,Y,Z] field (pure trilinear, periodic).

    Returns (field, overflow).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    P = pos.shape[0]
    C = capacity
    dtype = forces.dtype

    fshape = jnp.asarray((X, Y, Z), dtype=pos.dtype)
    p = jnp.mod(pos, fshape[None, :])
    order, starts = _sort_by_slab(p, X)
    counts = jnp.diff(starts)
    overflow = jnp.sum(jnp.maximum(counts - C, 0))

    # component-major, tail-padded so every [start, start+C) window fits;
    # dim0 padded 3->4 for sublane-aligned DMA slices
    pos_s = jnp.concatenate([p[order], jnp.zeros((C, 3), p.dtype)]).T
    pos_s = jnp.concatenate([pos_s, jnp.zeros((1, pos_s.shape[1]), p.dtype)])
    F_s = jnp.concatenate([forces[order], jnp.zeros((C, 3), dtype)]).T
    F_s = jnp.concatenate([F_s, jnp.zeros((1, F_s.shape[1]), dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, Y, Z), lambda g, s: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Y, Z), lambda g, s: ((g + 1) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, C), pos.dtype),
            pltpu.VMEM((4, C), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_spread_kernel, C, Y, Z)
    lo, hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((X, 3, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, 3, Y, Z), dtype),
        ),
        interpret=interpret,
    )(starts, pos_s, F_s)
    field = lo + hi
    return field.transpose(1, 0, 2, 3), overflow


# ---------------------------------------------------------------------------
# interpolation


def _interp_kernel(C, Y, Z, starts_ref, pos_hbm, u_lo, u_hi, out_hbm,
                   pos_v, v_v, sem):
    g = pl.program_id(0)
    start = starts_ref[g]
    count = starts_ref[g + 1] - start

    cp = pltpu.make_async_copy(pos_hbm.at[:, pl.ds(start, C)], pos_v, sem)
    cp.start()
    cp.wait()

    Sy, Sz, wx0, wx1 = _weights(pos_v[:], count, C, Y, Z)

    rows = []
    for c in range(3):
        acc = None
        for u_ref, wx in ((u_lo, wx0), (u_hi, wx1)):
            # t[y, p] = sum_z u[y, z] Sz[z, p]
            t = jax.lax.dot_general(
                u_ref[0, c], Sz,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=Sz.dtype,
            )  # [Y, C]
            v = jnp.sum(Sy * t, axis=0, keepdims=True) * wx  # [1, C]
            acc = v if acc is None else acc + v
        rows.append(acc)
    v_v[:] = jnp.concatenate(
        rows + [jnp.zeros_like(rows[0])], axis=0
    )  # [4, C], row 3 is sublane padding

    cp_out = pltpu.make_async_copy(v_v, out_hbm.at[:, pl.ds(start, C)], sem)
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("shape", "capacity", "interpret"))
def pallas_interp(pos, u, shape, capacity=2048, interpret=None):
    """Interpolate u [3,X,Y,Z] to vertices [P,3] (pure trilinear)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    P = pos.shape[0]
    C = capacity
    dtype = u.dtype

    fshape = jnp.asarray((X, Y, Z), dtype=pos.dtype)
    p = jnp.mod(pos, fshape[None, :])
    order, starts = _sort_by_slab(p, X)
    counts = jnp.diff(starts)
    overflow = jnp.sum(jnp.maximum(counts - C, 0))

    pos_s = jnp.concatenate([p[order], jnp.zeros((C, 3), p.dtype)]).T
    pos_s = jnp.concatenate([pos_s, jnp.zeros((1, pos_s.shape[1]), p.dtype)])
    u_x = u.transpose(1, 0, 2, 3)  # [X, 3, Y, Z]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 3, Y, Z), lambda g, s: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Y, Z), lambda g, s: ((g + 1) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, C), pos.dtype),
            pltpu.VMEM((4, C), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_interp_kernel, C, Y, Z)
    v_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, P + C), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, pos_s, u_x, u_x)
    # un-sort
    inv = jnp.zeros(P, jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    return v_s[:3].T[:P][inv], overflow
