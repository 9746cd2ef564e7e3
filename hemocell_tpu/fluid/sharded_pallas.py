"""Sharded fused stream-collide: shard_map + explicit ICI halo exchange.

Multi-chip version of the fused Pallas kernel (fluid/pallas_lbm.py): the
lattice is sharded along X over a 1-D device mesh; each step exchanges one
halo row per side with `ppermute` (the ICI analog of the reference's MPI
envelope exchange, core/hemoCellFields.cpp:363-372) and runs the single-chip
kernel on the halo-extended local block.  The kernel's periodic x-wrap on
the extended block only affects the two halo output rows, which are
discarded — interior rows see exactly their true neighbours.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .pallas_lbm import stream_collide_pallas
from . import lbm


def _halo_exchange(arr, axis_name):
    """arr [..., Xl, Y, Z] -> (left_halo, right_halo) rows from neighbours."""
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # row arriving at my left edge = right edge of my left neighbour
    left = jax.lax.ppermute(arr[..., -1:, :, :], axis_name, perm=fwd)
    right = jax.lax.ppermute(arr[..., :1, :, :], axis_name, perm=bwd)
    return left, right


def make_sharded_stream_collide(mesh: Mesh, flags, bc_velocity=None,
                                axis: str = "x", use_pallas=None):
    """Build a jitted sharded stream-collide over ``mesh``.

    flags/bc_velocity are global arrays; they are sharded here and their halo
    extensions precomputed per shard (static geometry).
    Returns f_new with the same sharding as f.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    fspec = P(None, axis, None, None)
    gspec = P(axis, None, None)

    def local_step(f_l, force_l, omega, flags_l, bc_l):
        fl_left, fl_right = _halo_exchange(f_l, axis)
        fo_left, fo_right = _halo_exchange(force_l, axis)
        flg_left, flg_right = _halo_exchange(flags_l[None], axis)
        bc_halo = None
        if bc_l is not None:
            bc_halo = _halo_exchange(bc_l, axis)
        if use_pallas:
            # halo rows ride as 1-row kernel operands: no [Q, Xl+2, ..]
            # concatenate copy of f through HBM, and tx is free to tile
            # the local block (the old extend pattern pinned tx=1)
            halos = {
                "f": (fl_left, fl_right),
                "force": (fo_left, fo_right),
                "flags": (flg_left[0], flg_right[0]),
            }
            if bc_halo is not None:
                halos["bc"] = bc_halo
            return stream_collide_pallas(
                f_l, force_l, omega, flags_l, bc_l, halos=halos
            )
        f_ext = jnp.concatenate([fl_left, f_l, fl_right], axis=1)
        force_ext = jnp.concatenate([fo_left, force_l, fo_right], axis=1)
        flags_ext = jnp.concatenate(
            [flg_left[0], flags_l, flg_right[0]], axis=0
        )
        bc_ext = None
        if bc_halo is not None:
            bc_ext = jnp.concatenate([bc_halo[0], bc_l, bc_halo[1]], axis=1)
        out_ext = lbm.stream_collide(
            f_ext, force_ext, omega, flags_ext, bc_ext
        )
        return out_ext[:, 1:-1]

    in_specs = (fspec, fspec, P(), gspec, fspec if bc_velocity is not None else P())
    shmapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=fspec,
        check_vma=False,
    )

    flags_sh = jax.device_put(flags, NamedSharding(mesh, gspec))
    bc_sh = (
        jax.device_put(bc_velocity, NamedSharding(mesh, fspec))
        if bc_velocity is not None
        else None
    )

    @jax.jit
    def step(f, force, omega):
        om = jnp.asarray(omega, f.dtype)
        return shmapped(f, force, om, flags_sh, bc_sh)

    return step
