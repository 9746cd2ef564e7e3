"""Pallas inter-cell repulsion: slab-windowed all-pairs on the MXU.

TPU-native replacement for the reference's particle-grid pair loops
(core/hemoCellParticleField.cpp:677-743): the jnp candidate-gather version
(cells/repulsion.py) costs ~0.8 s at 70k vertices because TPU gathers
serialise.  Here, vertices are sorted by x-slab (as in ibm/pallas_ibm.py);
each kernel program computes the forces on its slab's vertices against an
extended window (slabs g-1..g+1) with matmul-form distance algebra:

    |pi - pj|^2 = |pi|^2 + |pj|^2 - 2 pi.pj     (cross term on the MXU)
    F_i = k * sum_j [d<cutoff][cell_i != cell_j] (cutoff/d^2) (pi - pj)
        = pi * rowsum(mag) - mag @ pj            (second term on the MXU)

The own-slab block is chunked so the [chunk, window] pair matrix fits VMEM.
Same force law as the reference (F = k*(cutoff/d)*(dv/d) per pair, both
sides accumulated — here each vertex computes its own sum, which visits
every pair twice like the reference's symmetric add).

Periodic wrap: x is handled by the slab window (a periodic image's partner
slab); y/z minimum-image is applied to the pair displacement implicitly by
the cutoff < 1 lu: only pairs within one node interact, so wrapping matters
only for vertices within cutoff of the y/z faces — those pairs are missed
by the plain difference; callers that need exact face-wrap pairs should keep
the jnp path.  (The reference's node grid has the same property: its pair
loops do not wrap the lattice either, hemoCellParticleField.cpp:707-741.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ibm.pallas_ibm import slab_capacity

_ALIGN = 128


def _repulsion_kernel(C, W, CH, X, k_rep, cutoff, starts_ref,
                      pos_hbm, gid_hbm, out_ref, pos_v, gid_v, sem):
    g = pl.program_id(0)
    # own window: aligned, covers slab g
    start = starts_ref[g]
    al = pl.multiple_of((start // _ALIGN) * _ALIGN, _ALIGN)
    # extended window: aligned, covers slabs g-1..g+1 (clamped at the ends;
    # the periodic x-face pairs are the same best-effort as the reference)
    gm1 = jnp.maximum(g - 1, 0)
    start_w = starts_ref[gm1]
    al_w = pl.multiple_of((start_w // _ALIGN) * _ALIGN, _ALIGN)

    cp = pltpu.make_async_copy(pos_hbm.at[:, pl.ds(al_w, W)], pos_v, sem)
    cp.start()
    cp.wait()
    cp2 = pltpu.make_async_copy(gid_hbm.at[:, pl.ds(al_w, W)], gid_v, sem)
    cp2.start()
    cp2.wait()

    pw = pos_v[:3, :]  # [3, W] window positions
    gw = gid_v[0:1, :]  # [1, W] window cell ids (float-encoded)

    # offset of the own window inside the extended one; both starts are
    # align_down'ed so the difference is a multiple of _ALIGN, but Mosaic
    # cannot prove that through the subtraction — re-assert the hint.
    own_off = pl.multiple_of(al - al_w, _ALIGN)

    n_chunks = C // CH
    for ci in range(n_chunks):
        sl = pl.ds(own_off + ci * CH, CH)
        pi = pos_v[:3, sl]  # [3, CH]
        gi = gid_v[0:1, sl]  # [1, CH]
        ix_i = jnp.floor(pi[0:1, :]).astype(jnp.int32)
        mine = (ix_i == g)  # [1, CH] vertices of slab g only

        # pair distances via the MXU cross term
        cross = jax.lax.dot_general(
            pi, pw, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=pi.dtype,
        )  # [CH, W]
        sq_i = jnp.sum(pi * pi, axis=0)[:, None]  # [CH, 1]
        sq_w = jnp.sum(pw * pw, axis=0)[None, :]  # [1, W]
        d2 = jnp.maximum(sq_i + sq_w - 2.0 * cross, 1e-12)
        d = jnp.sqrt(d2)

        same_cell = gi.T == gw  # [CH, W] (includes self)
        ok = (d < cutoff) & (~same_cell)
        mag = jnp.where(ok, k_rep * cutoff / d2, 0.0)  # [CH, W]

        # F_i = sum_j mag_ij (pi - pj) = pi * rowsum - mag @ pw^T
        rowsum = jnp.sum(mag, axis=1)[None, :]  # [1, CH]
        mp = jax.lax.dot_general(
            mag, pw, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=mag.dtype,
        )  # [CH, 3]
        F = pi * rowsum - mp.T  # [3, CH]
        F = F * mine
        Fout = jnp.concatenate([F, jnp.zeros_like(F[0:1])], axis=0)  # [4, CH]
        # output columns are relative to the OWN window (sorted index al + j)
        out_ref[0, :, pl.ds(ci * CH, CH)] = Fout


@functools.partial(
    jax.jit,
    static_argnames=("shape", "capacity", "chunk", "interpret", "k_rep",
                     "cutoff"),
)
def pallas_repulsion(pos, cell_gid, active, shape, k_rep, cutoff,
                     capacity=None, chunk=512, interpret=None):
    """[P,3] positions + [P] cell ids -> [P,3] repulsion forces."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    P = pos.shape[0]
    if capacity is None:
        capacity = slab_capacity(P, X)
    C = capacity
    W = 3 * C  # extended window (slabs g-1..g+1 plus alignment slack)
    dtype = pos.dtype

    fshape = jnp.asarray((X, Y, Z), dtype=dtype)
    p = jnp.mod(pos, fshape[None, :])
    # dead vertices sort into a parking slab PAST every program's window —
    # they must not consume real slabs' window capacity (dead cells and
    # per-shard owner tables park inactive rows at their last real
    # positions, which would otherwise crowd the contact zone's windows)
    ix = jnp.where(
        active > 0,
        jnp.mod(jnp.floor(p[:, 0]).astype(jnp.int32), X),
        X,
    )
    order = jnp.argsort(ix)
    ix_s = ix[order]
    starts = jnp.searchsorted(
        ix_s, jnp.arange(X + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = jnp.diff(starts)
    overflow = jnp.sum(jnp.maximum(jnp.mod(starts[:-1], _ALIGN) + counts - C, 0))

    p_sorted = p[order]
    # parked vertices: x=-1 with an impossible cell id so no pair forms
    # even when a clamped end window reads the parking region
    act_s = active[order] > 0
    p_sorted = jnp.where(act_s[:, None], p_sorted, -1.0)
    gid_f = jnp.where(act_s, cell_gid[order], -7).astype(dtype)

    pos_cm = jnp.zeros((4, P + W), dtype).at[:3, :P].set(p_sorted.T)
    pos_cm = pos_cm.at[0, P:].set(-1.0)
    gid_cm = jnp.zeros((4, P + W), dtype).at[0, :P].set(gid_f)
    gid_cm = gid_cm.at[0, P:].set(-9.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 4, C), lambda g, s: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, W), dtype),
            pltpu.VMEM((4, W), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _repulsion_kernel, C, W, chunk, X, float(k_rep), float(cutoff)
    )
    blocks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X, 4, C), dtype),
        interpret=interpret,
    )(starts, pos_cm, gid_cm)

    # un-sort: sorted vertex i sits at column (i - align_down(start_{g(i)}))
    al = (starts[:-1] // _ALIGN) * _ALIGN
    col = jnp.arange(P, dtype=jnp.int32) - al[ix_s]
    flat = (ix_s * 4) * C + col
    bf = blocks.reshape(-1)
    F_sorted = jnp.stack([bf[flat + c * C] for c in range(3)], axis=1)
    inv = jnp.zeros(P, jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    # parked (inactive) vertices read undefined output columns — zero them
    return F_sorted[inv] * (active > 0)[:, None], overflow
