"""Pallas IBM kernels: force spreading and velocity interpolation over
x-slab-sorted vertices.

The TPU-native endgame for the IBM exchange: XLA's gather/scatter serialise
(~10 ms per 70k vertices), so both directions are reformulated as per-slab
dense one-hot contractions executed on the MXU inside a Pallas kernel:

  * vertices are sorted by their base x-slab once per call (bitonic sort +
    row permute in XLA);
  * the kernel grid runs over slabs; each program DMAs its slab's contiguous
    vertex rows (scalar-prefetched offsets, fixed capacity window into a
    tail-padded array — later programs overwrite earlier overhang, the grid
    is sequential on a single TensorCore);
  * spread: per component, deposit = (Sy * wx*F_c)^T @ Sz onto the slab's
    [Y, Z] plane, with the x-weight split over two outputs (rows g and g+1);
  * interpolation: A = Sy @ u_row -> v_p = sum_z A * Sz, accumulated over
    the rows g and g+1 with their x-weights.

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


# ---------------------------------------------------------------------------
# spread


def _spread_kernel(C, Y, Z, starts_ref, pos_hbm, F_hbm, out_lo, out_hi,
                   pos_v, F_v, sem):
    g = pl.program_id(0)
    start = starts_ref[g]
    count = starts_ref[g + 1] - start

    cp_pos = pltpu.make_async_copy(
        pos_hbm.at[pl.ds(start, C)], pos_v, sem
    )
    cp_pos.start()
    cp_pos.wait()
    cp_f = pltpu.make_async_copy(F_hbm.at[pl.ds(start, C)], F_v, sem)
    cp_f.start()
    cp_f.wait()

    p = pos_v[:]  # [C, 3]
    F = F_v[:]  # [C, 3]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0) < count
    ).astype(p.dtype)  # [C, 1]

    fx = p[:, 0:1] - jnp.floor(p[:, 0:1])
    wx0 = (1.0 - fx) * valid
    wx1 = fx * valid

    iy = jnp.floor(p[:, 1:2]).astype(jnp.int32)
    iz = jnp.floor(p[:, 2:3]).astype(jnp.int32)
    fy = p[:, 1:2] - jnp.floor(p[:, 1:2])
    fz = p[:, 2:3] - jnp.floor(p[:, 2:3])

    ids_y = jax.lax.broadcasted_iota(jnp.int32, (C, Y), 1)
    ids_z = jax.lax.broadcasted_iota(jnp.int32, (C, Z), 1)
    iy0 = jnp.mod(iy, Y)
    iy1 = jnp.mod(iy + 1, Y)
    iz0 = jnp.mod(iz, Z)
    iz1 = jnp.mod(iz + 1, Z)
    Sy = (ids_y == iy0) * (1.0 - fy) + (ids_y == iy1) * fy  # [C, Y]
    Sz = (ids_z == iz0) * (1.0 - fz) + (ids_z == iz1) * fz  # [C, Z]

    for out_ref, wx in ((out_lo, wx0), (out_hi, wx1)):
        planes = []
        for c in range(3):
            SyA = Sy * (F[:, c : c + 1] * wx)  # [C, Y]
            planes.append(
                jax.lax.dot_general(
                    SyA, Sz,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=SyA.dtype,
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

    # tail-pad so every slab window [start, start+C) is in bounds
    pos_s = jnp.concatenate([p[order], jnp.zeros((C, 3), p.dtype)])
    F_s = jnp.concatenate([forces[order], jnp.zeros((C, 3), dtype)])

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
            pltpu.VMEM((C, 3), pos.dtype),
            pltpu.VMEM((C, 3), dtype),
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

    cp = pltpu.make_async_copy(pos_hbm.at[pl.ds(start, C)], pos_v, sem)
    cp.start()
    cp.wait()

    p = pos_v[:]
    fx = p[:, 0:1] - jnp.floor(p[:, 0:1])
    iy = jnp.floor(p[:, 1:2]).astype(jnp.int32)
    iz = jnp.floor(p[:, 2:3]).astype(jnp.int32)
    fy = p[:, 1:2] - jnp.floor(p[:, 1:2])
    fz = p[:, 2:3] - jnp.floor(p[:, 2:3])

    ids_y = jax.lax.broadcasted_iota(jnp.int32, (C, Y), 1)
    ids_z = jax.lax.broadcasted_iota(jnp.int32, (C, Z), 1)
    Sy = (ids_y == jnp.mod(iy, Y)) * (1.0 - fy) + (
        ids_y == jnp.mod(iy + 1, Y)
    ) * fy
    Sz = (ids_z == jnp.mod(iz, Z)) * (1.0 - fz) + (
        ids_z == jnp.mod(iz + 1, Z)
    ) * fz

    comps = []
    for c in range(3):
        acc = None
        for u_ref, wx in ((u_lo, (1.0 - fx)), (u_hi, fx)):
            A = jax.lax.dot_general(
                Sy, u_ref[0, c],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=Sy.dtype,
            )  # [C, Z]
            t = jnp.sum(A * Sz, axis=1, keepdims=True) * wx  # [C, 1]
            acc = t if acc is None else acc + t
        comps.append(acc)
    v_v[:] = jnp.concatenate(comps, axis=1)  # [C, 3]

    cp_out = pltpu.make_async_copy(v_v, out_hbm.at[pl.ds(start, C)], sem)
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

    pos_s = jnp.concatenate([p[order], jnp.zeros((C, 3), p.dtype)])
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
            pltpu.VMEM((C, 3), pos.dtype),
            pltpu.VMEM((C, 3), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_interp_kernel, C, Y, Z)
    v_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P + C, 3), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, pos_s, u_x, u_x)
    # un-sort
    inv = jnp.zeros(P, jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    return v_s[:P][inv], overflow
