"""MXU-friendly IBM force spreading: binned dense one-hot matmuls.

XLA's scatter-add serialises on TPU (~10 ms for 70k vertices at 64^3); this
module reformulates trilinear spreading as dense matrix products:

  * vertices are binned by their base x-slab via a sort + searchsorted gather
    into fixed-capacity padded groups (NO scatter anywhere);
  * within each slab, the deposit onto the [Y, Z] plane is
        out[c, y, z] = sum_p A[p, c] * Sy[p, y] * Sz[p, z]
    with Sy/Sz dense one-hot-interpolation matrices [C, Y]/[C, Z] — two MXU
    matmuls per slab, vmapped over slabs;
  * the x-direction trilinear weight splits each vertex between slab ix and
    ix+1: two deposits, the second rolled by one slab.

Cost ~ 2 * X * (C*Y*3 + 3*Y*Z*C) MACs with C the slab capacity — about 20x
faster than the scatter path, and deterministic.

Capacity: vertices beyond ``capacity`` in one slab would be dropped, so the
caller picks capacity generously (see ``slab_capacity``); ``binned_spread``
also returns the overflow count so callers/tests can assert it is zero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def slab_capacity(n_vertices: int, nx: int, safety: float = 4.0) -> int:
    """Static per-slab capacity: safety * mean occupancy, rounded up to 512
    (lane-friendly), capped at the total vertex count."""
    c = int(np.ceil(safety * max(1, n_vertices) / nx / 512.0) * 512)
    return max(512, min(c, int(np.ceil(n_vertices / 512.0) * 512)))


@partial(jax.jit, static_argnames=("shape", "capacity"))
def binned_spread(pos, forces, shape, capacity):
    """Deposit forces*weights trilinearly into a [3, X, Y, Z] field.

    pos:    [P, 3] positions, any real values (wrapped periodically)
    forces: [P, 3] per-vertex forces (already capped/renormalised/masked)
    Returns (field [3, X, Y, Z], overflow int32).
    """
    X, Y, Z = (int(s) for s in shape)
    P = pos.shape[0]
    C = capacity
    dtype = forces.dtype

    fshape = jnp.asarray((X, Y, Z), dtype=pos.dtype)
    p = jnp.mod(pos, fshape[None, :])
    base = jnp.floor(p).astype(jnp.int32)
    frac = (p - jnp.floor(p)).astype(dtype)

    ix = jnp.mod(base[:, 0], X)
    order = jnp.argsort(ix)
    ix_s = ix[order]
    # slab start offsets in the sorted order
    starts = jnp.searchsorted(ix_s, jnp.arange(X, dtype=ix_s.dtype))
    counts = jnp.diff(jnp.concatenate([starts, jnp.asarray([P])]))
    overflow = jnp.sum(jnp.maximum(counts - C, 0))

    # padded member table [X, C]: ranks past the slab count are masked
    ranks = starts[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
    valid = ranks < (starts + counts)[:, None]
    members = order[jnp.minimum(ranks, P - 1)]  # [X, C]

    # per-member data gathers (fast: contiguous-ish, aligned C)
    fy = frac[members, 1]
    fz = frac[members, 2]
    wx1 = frac[members, 0]
    wx0 = 1.0 - wx1
    iy = base[members, 1]
    iz = base[members, 2]
    F = forces[members]  # [X, C, 3]
    vmask = valid.astype(dtype)

    # dense separable one-hot interpolation rows
    def one_hot_interp(i0, fr, n):
        ids = jnp.arange(n, dtype=jnp.int32)
        a = jnp.mod(i0, n)[..., None]
        b = jnp.mod(i0 + 1, n)[..., None]
        return (ids == a) * (1.0 - fr[..., None]) + (ids == b) * fr[..., None]

    Sy = one_hot_interp(iy, fy, Y).astype(dtype)  # [X, C, Y]
    Sz = one_hot_interp(iz, fz, Z).astype(dtype)  # [X, C, Z]

    def deposit(wx):
        # per component: out[g, y, z] = (Sy * a)^T @ Sz  with a = F_c*wx*mask
        w = (wx * vmask)[..., None]  # [X, C, 1]
        outs = []
        for c in range(3):
            SyA = Sy * (F[..., c : c + 1] * w)  # [X, C, Y]
            outs.append(
                jnp.einsum(
                    "gpy,gpz->gyz", SyA, Sz,
                    preferred_element_type=SyA.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        return jnp.stack(outs, axis=1)  # [X, 3, Y, Z]

    lo = deposit(wx0)
    hi = deposit(wx1)
    field = lo + jnp.roll(hi, 1, axis=0)
    return field.transpose(1, 0, 2, 3).astype(dtype), overflow
