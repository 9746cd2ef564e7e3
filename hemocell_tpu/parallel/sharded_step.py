"""Fully sharded coupled IB-LBM step: shard_map + per-shard Pallas kernels.

The TPU-native analog of the reference's MPI spatial decomposition with
particle envelopes (core/hemoCell.cpp:438-571, core/hemoCellFields.cpp:
363-499), built from explicit SPMD pieces instead of GSPMD auto-partition:

  * lattice ``f[19, X, Y, Z]`` sharded along X over a 1-D mesh — or over
    (X, Y) on a 2-D ("x", "y") mesh (v5p-style non-flat topologies; the
    reference decomposes arbitrarily, core/hemoCell.cpp:438-571).  One halo
    layer per side per sharded axis is exchanged with ``ppermute`` (ICI).
    On a 1-D mesh the x halo rows ride directly as Pallas kernel operands;
    on a 2-D mesh the local block is first extended with y ghost columns
    (pull streaming touches at most one neighbour, so interior columns of
    the y-extended block are exact regardless of the kernel's periodic
    wrap at the ghost edges), and the x halo-row operands are taken from
    the y-EXTENDED block — the received rows then already carry the
    diagonal (corner) neighbours' data.
  * vertices are replicated; each shard runs the Pallas IBM kernels
    (ibm/pallas_ibm.py) on ONLY the vertices whose base (x-slab [, y-range])
    it owns.  Spreading runs on an (Xl+1[, Yl+1])-extended local slab whose
    final row/column collect the forward-neighbour deposits; the halo is
    shipped x-row first, then y-column — the corner deposit rides both
    hops and lands on the diagonal neighbour, replacing the reference's
    two-phase particle envelope protocol.
  * interpolation reads a halo-extended velocity block (corner via the
    same two-hop composition); each vertex is interpolated on exactly one
    shard and a ``psum`` over the mesh axes rebuilds the replicated
    per-vertex velocities.
  * mechanics / repulsion / advance run replicated (identical inputs give
    identical outputs on every shard — they are vertex-sized, tiny next
    to the lattice).

Supported feature subset: body force (vector), walls + moving bounce-back
velocity BC, pressure outlets (node-local density Dirichlet), CEPAC
(second lattice, same halo pattern), interior viscosity and solidify
(tile-local updates; 1-D and 2-D meshes), Lees-Edwards (x-all_gather'd
corrected wrap planes + plane halo rows; 1-D meshes, all-fluid box),
inter-cell + boundary repulsion, timescale separation, force cap,
boundary-contact deletion, restime.  LE combos and preInlet dynamic
overrides fall back to the GSPMD runner (parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cells.repulsion import boundary_repulsion_forces
from ..dynamics import SimState, StepConfig, _every, scoped_vmem_limit_kib
from ..fluid import lbm
from ..fluid.pallas_lbm import stream_collide_pallas
from ..ibm import coupling
from ..ibm.pallas_ibm import (
    build_ibm_plan,
    pallas_interp,
    pallas_spread,
    slab_capacity,
)
from ..config.defaults import FLAG_FLUID


def shardmap_supported(cfg: StepConfig, mesh=None) -> bool:
    """True when the explicit shard_map step covers this configuration.

    r04/r05 widened the fast path: pressure outlets (node-local density
    Dirichlet), CEPAC (second lattice, same two-hop halo pattern),
    interior viscosity and solidify (tile-local updates, 1-D AND 2-D
    meshes) all ride shard_map; the GSPMD runner keeps only
    Lees-Edwards's rejected combinations (walled boxes, 2-D meshes,
    interior/CEPAC/solidify combos) and the scatter fallback (reference:
    every feature under any decomposition, core/hemoCell.cpp:438-571)."""
    if cfg.spread_mode == "scatter":
        # the facade's overflow guard falls back to the exact XLA scatter
        # IBM; this path is Pallas-slab only, so route to the GSPMD runner
        return False
    if cfg.lees_edwards_velocity is not None:
        # LE rides shard_map on 1-D (x) meshes: the displaced z-wrap
        # sample spans the full domain width, so the two boundary planes
        # are all_gather'd along x (tiny: [38, X, Y]), corrected locally
        # and fed to the kernel as plane operands + halo rows.  The
        # kernel's LE mode needs a scalar omega and a plain periodic box,
        # so interior-viscosity / CEPAC combos are rejected; 2-D meshes
        # would need a second gather axis.
        if cfg.interior_every or cfg.cepac_tau is not None:
            return False
        if np.asarray(cfg.flags).any():
            return False  # LE shear box is all-fluid by construction
        if mesh is not None and len(mesh.axis_names) > 1:
            return False
    if cfg.solidify_every and cfg.lees_edwards_velocity is not None:
        # solidify rides 1-D AND 2-D meshes (r05): the mutable flags +
        # binding mask are carried as tile-sharded state, phase A's
        # interior hardening is a tile-local scatter (x/y restriction,
        # like interior viscosity) and phase B's 27-neighbour
        # binding/Tresca test reads 1-row ppermute ghosts per sharded
        # axis (y-then-x two-hop carries the corners) + a cell-hit psum.
        # CEPAC and interior-viscosity combos ride along; only the LE
        # combo stays on the GSPMD runner.
        return False
    if cfg.body_force is not None and jnp.asarray(cfg.body_force).ndim != 1:
        return False
    return True


def _fwd(axis):
    n = jax.lax.axis_size(axis)
    return [(i, (i + 1) % n) for i in range(n)]


def _bwd(axis):
    n = jax.lax.axis_size(axis)
    return [(i, (i - 1) % n) for i in range(n)]


def _first_slice(arr, dim):
    sl = [slice(None)] * arr.ndim
    sl[dim] = slice(0, 1)
    return arr[tuple(sl)]


def _last_slice(arr, dim):
    n = arr.shape[dim]
    sl = [slice(None)] * arr.ndim
    sl[dim] = slice(n - 1, n)
    return arr[tuple(sl)]


def _from_next(arr, axis_name, dim):
    """First slice along ``dim`` of the forward (periodic) neighbour."""
    return jax.lax.ppermute(_first_slice(arr, dim), axis_name,
                            perm=_bwd(axis_name))


def _from_prev(arr, axis_name, dim):
    """Last slice along ``dim`` of the backward (periodic) neighbour."""
    return jax.lax.ppermute(_last_slice(arr, dim), axis_name,
                            perm=_fwd(axis_name))


def _to_next(arr_slice, axis_name):
    """Ship my computed halo slice to the forward neighbour."""
    return jax.lax.ppermute(arr_slice, axis_name, perm=_fwd(axis_name))


def _yext(arr, axis_name, dim):
    """Extend with one ghost layer on each side along ``dim`` (periodic
    neighbour exchange): [.., n, ..] -> [.., n+2, ..]."""
    lo = _from_prev(arr, axis_name, dim)
    hi = _from_next(arr, axis_name, dim)
    return jnp.concatenate([lo, arr, hi], axis=dim)


def build_shardmap_step(cfg: StepConfig, mesh: Mesh, axis: str = "x",
                        use_pallas=None, interpret=None):
    """shard_map'd single coupled iteration (same contract as
    dynamics.build_step, reference core/hemoCell.cpp:299-376).

    ``mesh`` may be 1-D (x) or 2-D (x, y); ``axis`` names the x mesh axis.
    """
    assert shardmap_supported(cfg, mesh), \
        "unsupported features for shard_map step"
    shape = tuple(int(s) for s in cfg.shape)
    X, Y, Z = shape
    axes = tuple(mesh.axis_names)
    ay = axes[1] if len(axes) > 1 else None
    nx = int(mesh.shape[axis])
    ny = int(mesh.shape[ay]) if ay is not None else 1
    if ny == 1:
        ay = None
    assert X % nx == 0, f"X={X} not divisible by {nx} shards"
    assert Y % ny == 0, f"Y={Y} not divisible by {ny} shards"
    Xl, Yl = X // nx, Y // ny
    psum_axes = (axis, ay) if ay else axis
    dtype = cfg.dtype
    fshape = jnp.asarray(shape, dtype=dtype)
    # solidify mutates flags at runtime, so the walled machinery (masks,
    # bounce-back, contact deletion) must be live even on initially
    # all-fluid domains
    has_boundaries = bool(np.asarray(cfg.flags).any()) or bool(
        cfg.solidify_every
    )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def local_step(state: SimState, flags_l, bc_l, cep_mask_l=None,
                   cep_val_l=None) -> SimState:
        it = state.it
        cells = list(state.cells)
        if state.flags_state is not None:
            # solidify: the carried (mutated) flags shard replaces the
            # static operand for every consumer below (masks, fluid
            # kernel + halo rows, contact deletion)
            flags_l = state.flags_state
        x0 = (jax.lax.axis_index(axis) * Xl).astype(dtype)
        y0 = (jax.lax.axis_index(ay) * Yl).astype(dtype) if ay else None

        # ---- flatten vertices (replicated) ----------------------------
        pos_parts, act_parts, gid_parts = [], [], []
        offset = 0
        for cs in cells:
            nc, nv = cs.pos.shape[0], cs.pos.shape[1]
            pos_parts.append(cs.pos.reshape(-1, 3))
            act_parts.append(jnp.repeat(cs.alive.astype(dtype), nv))
            gid_parts.append(
                jnp.repeat(jnp.arange(nc, dtype=jnp.int32) + offset, nv)
            )
            offset += nc
        pos_flat = jnp.concatenate(pos_parts) if pos_parts else None
        active = jnp.concatenate(act_parts) if act_parts else None
        cell_gid = jnp.concatenate(gid_parts) if gid_parts else None
        if pos_flat is not None and pos_flat.shape[0] == 0:
            pos_flat = active = cell_gid = None

        # ---- 1: repulsion (replicated) ---------------------------------
        # Off-step fallback is the CARRIED force_repulsion, not zeros: the
        # reference recomputes at the repulsion timescale but spreads the
        # persisted value every iteration (core/hemoCell.cpp:307-314).
        carried_rep = None
        if pos_flat is not None and (
            cfg.repulsion_constant > 0.0
            or (
                cfg.boundary_repulsion_constant > 0.0
                and cfg.boundary_mask is not None
            )
        ):
            carried_rep = jnp.concatenate(
                [cs.force_repulsion.reshape(-1, 3) for cs in cells]
            )
        frep = carried_rep
        rep_overflow = None
        if pos_flat is not None and cfg.repulsion_constant > 0.0:
            # same Pallas slab-window kernel as the single-device and
            # owner paths (shardmap_supported rejects scatter mode, so
            # this step is Pallas-only by construction); replicated
            # inputs give identical replicated outputs on every shard.
            # NOTE the kernel's documented face behavior: pairs straddling
            # the domain faces are best-effort (clamped x windows, no y/z
            # wrap) — matching the REFERENCE's node-grid pair loops, which
            # do not wrap the lattice either
            # (hemoCellParticleField.cpp:707-741); the jnp scatter path
            # (GSPMD runner) keeps exact min-image wrapping
            def _rep(p):
                from ..cells.pallas_repulsion import pallas_repulsion

                f, ovr = pallas_repulsion(
                    p, cell_gid, active, shape,
                    float(cfg.repulsion_constant),
                    float(cfg.repulsion_cutoff),
                    interpret=interpret,
                )
                return f, ovr.astype(jnp.int32)
            frep, rep_overflow = _every(
                it, cfg.repulsion_every, _rep, pos_flat,
                (carried_rep, jnp.zeros((), jnp.int32)),
            )
        if (
            pos_flat is not None
            and cfg.boundary_repulsion_constant > 0.0
            and cfg.boundary_mask is not None
        ):
            def _brep(p):
                return boundary_repulsion_forces(
                    p, active, cfg.boundary_mask, shape,
                    cfg.boundary_repulsion_constant,
                    cfg.boundary_repulsion_cutoff,
                )
            if cfg.repulsion_constant > 0.0:
                fb = _every(it, cfg.boundary_repulsion_every, _brep,
                            pos_flat, jnp.zeros_like(pos_flat))
                frep = frep + fb
            else:
                # Boundary-only: replace at the boundary timescale (see
                # dynamics.py — the reference accumulates unboundedly
                # here; deliberate deviation).
                frep = _every(it, cfg.boundary_repulsion_every, _brep,
                              pos_flat, carried_rep)
        if frep is not None:
            offset = 0
            for k, cs in enumerate(cells):
                nc, nv = cs.pos.shape[0], cs.pos.shape[1]
                cnt = nc * nv
                cells[k] = cs._replace(
                    force_repulsion=frep[offset: offset + cnt].reshape(
                        nc, nv, 3)
                )
                offset += cnt

        # ---- 2: spread (shard-local Pallas + halo exchange) -------------
        # lazy force: a uniform body force stays a [3] SMEM operand of the
        # fluid kernel (no field traffic, no force halo ppermute) until a
        # spread contribution materialises a field (see dynamics.py)
        force_field = None
        bf_uniform = None
        if cfg.body_force is not None:
            bf_uniform = jnp.asarray(cfg.body_force, dtype=dtype)

        def _mat_force(fld):
            if fld is not None:
                return fld
            fld = jnp.zeros((3, Xl, Yl, Z), dtype=dtype)
            if bf_uniform is not None:
                fld = fld + bf_uniform[:, None, None, None]
            return fld

        # local IBM grid extents: +1 collector row/column per sharded axis
        Xe, Ye = Xl + 1, (Yl + 1 if ay else Yl)
        fluid_mask_l = (flags_l == FLAG_FLUID).astype(dtype)

        def _ibm_ext(m):
            """Extend a [C?, Xl, Yl, Z] field to the IBM grid (Xe, Ye):
            forward-neighbour first row/column; corner via the x-row of
            the y-EXTENDED field (two-hop: the x-neighbour's y extension
            is exactly the diagonal neighbour's data)."""
            d = m.ndim - 3  # leading channel dims
            if ay:
                my = jnp.concatenate([m, _from_next(m, ay, d + 1)],
                                     axis=d + 1)
            else:
                my = m
            return jnp.concatenate([my, _from_next(my, axis, d)], axis=d)

        mask_ext = _ibm_ext(fluid_mask_l[None])

        pos_local = act_pad = inside = None
        ibm_capacity = None
        step_overflow = None
        if pos_flat is not None:
            P0 = pos_flat.shape[0]
            P_pad = -(-P0 // 512) * 512
            pad = P_pad - P0
            pos_pad = jnp.pad(pos_flat, ((0, pad), (0, 0)),
                              constant_values=0.5)
            act_pad = jnp.pad(active, (0, pad))
            if cfg.lees_edwards_velocity is not None:
                # Lees-Edwards image mapping (dynamics.py): a vertex in
                # z-image w sees the fluid displaced by w*d(t) in x and
                # moving at w*U
                le_w = jnp.floor(pos_pad[:, 2] / fshape[2])
                x_eff = pos_pad[:, 0] - le_w * state.le_displacement
                pos_w = jnp.stack(
                    [jnp.mod(x_eff, fshape[0]),
                     jnp.mod(pos_pad[:, 1], fshape[1]),
                     jnp.mod(pos_pad[:, 2], fshape[2])], axis=1)
            else:
                le_w = None
                pos_w = jnp.mod(pos_pad, fshape[None, :])
            xl = pos_w[:, 0] - x0
            inside = (xl >= 0) & (xl < Xl)
            yl = pos_w[:, 1]
            if ay:
                yl = pos_w[:, 1] - y0
                inside = inside & (yl >= 0) & (yl < Yl)
            # vertices of other shards park in the (Xl)-th bucket of the
            # extended local slab: never a real slab program's window, and
            # excluded from the overflow count below
            pos_local = jnp.stack(
                [jnp.where(inside, xl, Xl + 0.5),
                 jnp.where(inside, yl, 0.5) if ay else yl,
                 pos_w[:, 2]],
                axis=1,
            )
            ibm_capacity = slab_capacity(P_pad, X)
            in_f = inside.astype(dtype)

            ftot = jnp.concatenate(
                [
                    coupling.cap_force(cs.force.reshape(-1, 3), cfg.f_limit)
                    + cs.force_repulsion.reshape(-1, 3)
                    for cs in cells
                ]
            )
            ftot = jnp.pad(ftot, ((0, pad), (0, 0)))
            # boundary renormalisation fused into the spread kernel: the
            # owner shard sees every support row (local + halo), so no psum
            fdep = ftot * (act_pad * in_f)[:, None]
            # overflow_slabs=Xl: owned vertices live in slabs [0, Xl);
            # parked vertices (zero payload) sit in slab Xl — their
            # capacity "drops" are harmless and must not trip the guard
            ibm_plan = build_ibm_plan(
                pos_local, (Xe, Ye, Z), ibm_capacity, payload=fdep,
                overflow_slabs=Xl,
            )
            # the slab windows are per-SHARD static capacities — the exact
            # silent-drop hazard the facade's overflow guard watches
            # (hemocell.py _check_overflow); sum across shards so any one
            # over-packed slab trips the carried counter
            step_overflow = jax.lax.psum(
                ibm_plan.overflow.astype(jnp.int32), psum_axes
            )
            field_ext, _ = pallas_spread(
                pos_local, fdep, (Xe, Ye, Z),
                capacity=ibm_capacity, interpret=interpret,
                mask=mask_ext[0] if has_boundaries else None,
                plan=ibm_plan,
            )
            # two-hop halo reduction: x-row first (carries the corner),
            # then y-column — the corner deposit lands diagonally
            halo_x = _to_next(field_ext[:, Xl:], axis)
            field_l = field_ext[:, :Xl].at[:, 0].add(halo_x[:, 0])
            if ay:
                halo_y = _to_next(field_l[:, :, Yl:], ay)
                field_l = field_l[:, :, :Yl].at[:, :, 0].add(halo_y[:, :, 0])
            # destination masking is fused in the renorm spread kernel,
            # including the halo-received deposits (masked by the sending
            # shard against the same global nodes) — r05
            force_field = _mat_force(force_field) + field_l

        # ---- 2b: interior viscosity omega field (slab-local updates) -----
        # reference two-timescale scheme (core/hemoCellParticleField.cpp:
        # 746-807): rare full raycast + cheap membrane-normal sweep.  Cells
        # are replicated, so each shard recomputes the update restricted to
        # its own x-slab (out-of-slab scatter indices drop under jit).
        omega_field_new = state.omega_field
        if cfg.interior_every and state.omega_field is not None:
            from ..cells.interior import interior_mask, membrane_omega_update

            x0i = jax.lax.axis_index(axis) * Xl
            y0i = (
                jax.lax.axis_index(ay) * Yl if ay
                else jnp.asarray(0, jnp.int32)
            )

            def _om_recompute(_):
                om_l = jnp.full((Xl, Yl, Z), cfg.omega, dtype=dtype)
                for tc, cs in zip(cfg.types, cells):
                    if tc.omega_interior is None:
                        continue
                    m = interior_mask(
                        cs.pos, tc.topo["tri"], cs.alive, shape,
                        tc.interior_box, x_origin=x0i, x_extent=Xl,
                        y_origin=y0i, y_extent=Yl,
                    )
                    om_l = jnp.where(m, tc.omega_interior, om_l)
                return om_l

            entire = cfg.interior_entire_every or cfg.interior_every
            omega_field_new = _every(
                it, entire, _om_recompute, None, state.omega_field
            )
            if cfg.interior_entire_every and entire != cfg.interior_every:

                def _om_membrane(om_l):
                    for tc, cs in zip(cfg.types, cells):
                        if tc.omega_interior is None:
                            continue
                        om_l = membrane_omega_update(
                            om_l, cs.pos, tc.topo["tri"], cs.alive,
                            tc.omega_interior, cfg.omega,
                            tc.topo["edge_mean_eq"], shape,
                            x_origin=x0i, x_extent=Xl,
                            y_origin=y0i, y_extent=Yl,
                        )
                    return om_l

                omega_field_new = _every(
                    it, cfg.interior_every, _om_membrane,
                    omega_field_new, omega_field_new,
                )

        # ---- 3: fluid stream-collide with ppermute'd halo layers ---------
        # 2-D mesh: extend every operand with y ghost columns first; the
        # x halo-row operands are taken from the y-extended blocks, so the
        # received rows already include the diagonal neighbours' corners.
        def _fluid_op(arr, d):
            """y-extend (2-D mesh) an operand with leading dim count d."""
            return _yext(arr, ay, d + 1) if ay else arr

        f_op = _fluid_op(state.f, 1)
        fl, fr = (
            jax.lax.ppermute(_last_slice(f_op, 1), axis, perm=_fwd(axis)),
            jax.lax.ppermute(_first_slice(f_op, 1), axis, perm=_bwd(axis)),
        )
        force_op = None
        fo_halo = None
        if force_field is not None:
            force_op = _fluid_op(force_field, 1)
            fo_halo = (
                jax.lax.ppermute(_last_slice(force_op, 1), axis,
                                 perm=_fwd(axis)),
                jax.lax.ppermute(_first_slice(force_op, 1), axis,
                                 perm=_bwd(axis)),
            )
        all_fluid = not has_boundaries and bc_l is None
        flags_op = None
        flg_halo = None
        if not all_fluid:
            flags_op = _fluid_op(flags_l, 0)
            flg_halo = (
                jax.lax.ppermute(flags_op[None, -1:], axis,
                                 perm=_fwd(axis))[0],
                jax.lax.ppermute(flags_op[None, :1], axis,
                                 perm=_bwd(axis))[0],
            )
        bc_op = None
        bc_halo = None
        if bc_l is not None:
            bc_op = _fluid_op(bc_l, 1)
            bc_halo = (
                jax.lax.ppermute(_last_slice(bc_op, 1), axis,
                                 perm=_fwd(axis)),
                jax.lax.ppermute(_first_slice(bc_op, 1), axis,
                                 perm=_bwd(axis)),
            )
        om = jnp.asarray(cfg.omega, dtype)
        om_halo = None
        if omega_field_new is not None:
            # [Xl, Yl, Z] per-node relaxation; on 2-D meshes the operand
            # gets 1-row y ghosts like every other fluid operand, and the
            # x halo rows are taken from the y-extended field (corners)
            om = _fluid_op(omega_field_new, 0)
            om_halo = (
                jax.lax.ppermute(om[None, -1:], axis, perm=_fwd(axis))[0],
                jax.lax.ppermute(om[None, :1], axis, perm=_bwd(axis))[0],
            )
        le_planes_l = le_lo_row = le_hi_row = None
        le_disp_new = state.le_displacement
        if cfg.lees_edwards_velocity is not None:
            # Lees-Edwards corrected wrap planes: the displaced x-sample
            # spans the FULL domain width, so collide the local z-boundary
            # plane pair (node-local, ~2/Z of a collide), all_gather it
            # along x ([19, X, Y, 2] — tiny), correct globally, then slice
            # this shard's rows + its two halo rows (helper/leesEdwardsBC.h
            # is single-core; this is its distributed analog)
            from ..fluid.lees_edwards import corrected_planes_from_pair

            f_pair = jnp.stack(
                [f_op[:, :, :, Z - 1], f_op[:, :, :, 0]], axis=-1
            )
            if force_field is not None:
                fo_pair = jnp.stack(
                    [force_field[:, :, :, Z - 1], force_field[:, :, :, 0]],
                    axis=-1,
                )
            else:
                bf = (bf_uniform if bf_uniform is not None
                      else jnp.zeros(3, dtype))
                fo_pair = jnp.broadcast_to(
                    bf[:, None, None, None], (3, Xl, Y, 2)
                )
            post2 = lbm.collide(
                f_pair, fo_pair, om, jnp.zeros((Xl, Y, 2), jnp.uint8)
            )
            pair_full = jax.lax.all_gather(
                post2, axis, axis=1, tiled=True
            )  # [19, X, Y, 2]
            planes_full = corrected_planes_from_pair(
                pair_full[:, :, :, 0], pair_full[:, :, :, 1],
                state.le_displacement, cfg.lees_edwards_velocity,
            )  # [38, X, Y]
            xi = jax.lax.axis_index(axis) * Xl
            le_planes_l = jax.lax.dynamic_slice(
                planes_full,
                (jnp.zeros((), xi.dtype), xi, jnp.zeros((), xi.dtype)),
                (38, Xl, Y),
            )
            le_lo_row = jnp.take(
                planes_full, jnp.mod(xi - 1, X)[None], axis=1
            )
            le_hi_row = jnp.take(
                planes_full, jnp.mod(xi + Xl, X)[None], axis=1
            )
            le_disp_new = jnp.mod(
                state.le_displacement + cfg.lees_edwards_velocity, fshape[0]
            )
        if use_pallas:
            # halo rows ride as 1-row kernel operands (no [Q, Xl+2, ..]
            # concatenate copy of f, and _pick_tx tiles the local block
            # instead of being pinned to the odd Xl+2 row count)
            halos = {"f": (fl, fr)}
            if fo_halo is not None:
                halos["force"] = fo_halo
            if flg_halo is not None:
                halos["flags"] = flg_halo
            if om_halo is not None:
                halos["omega"] = om_halo
            if le_planes_l is not None:
                halos["le"] = (le_lo_row, le_hi_row)
            if bc_halo is not None:
                halos["bc"] = bc_halo
            f_new = stream_collide_pallas(
                f_op,
                force_op if force_op is not None else bf_uniform,
                om,
                flags_op if not all_fluid else None,
                bc_op,
                bc_density=cfg.bc_density,
                le_planes=le_planes_l,
                halos=halos,
            )
            if ay:
                f_new = f_new[:, :, 1:-1]
        else:
            f_ext = jnp.concatenate([fl, f_op, fr], axis=1)
            Ye2 = Yl + 2 if ay else Y
            if force_op is not None:
                force_j = jnp.concatenate(
                    [fo_halo[0], force_op, fo_halo[1]], axis=1
                )
            else:
                force_j = jnp.broadcast_to(
                    (bf_uniform if bf_uniform is not None
                     else jnp.zeros(3, dtype))[:, None, None, None],
                    (3, Xl + 2, Ye2, Z),
                )
            flags_j = (
                jnp.concatenate([flg_halo[0], flags_op, flg_halo[1]], axis=0)
                if flg_halo is not None
                else jnp.zeros((Xl + 2, Ye2, Z), jnp.uint8)
            )
            bc_ext = None
            if bc_halo is not None:
                bc_ext = jnp.concatenate([bc_halo[0], bc_op, bc_halo[1]],
                                         axis=1)
            om_j = om
            if om_halo is not None:
                om_j = jnp.concatenate([om_halo[0], om, om_halo[1]], axis=0)
            if le_planes_l is not None:
                from ..fluid.lees_edwards import stream_with_planes

                planes_ext = jnp.concatenate(
                    [le_lo_row, le_planes_l, le_hi_row], axis=1
                )
                post_ext = lbm.collide(f_ext, force_j, om_j, flags_j)
                f_out_ext = stream_with_planes(post_ext, planes_ext)
            else:
                f_out_ext = lbm.stream_collide(
                    f_ext, force_j, om_j, flags_j, bc_ext,
                    bc_density=cfg.bc_density,
                )
            f_new = f_out_ext[:, 1:-1]
            if ay:
                f_new = f_new[:, :, 1:-1]

        # ---- 3b: CEPAC advection-diffusion (one-way velocity coupling) ----
        # second lattice, same halo pattern as f: two-hop y-then-x ghost
        # extension covers the D3Q19 diagonal movers' corners
        cepac_new = state.cepac
        if cfg.cepac_tau is not None and state.cepac is not None:
            from ..fluid.advection_diffusion import ad_stream_collide

            def _x_ext(arr, d):
                return jnp.concatenate(
                    [_from_prev(arr, axis, d), arr,
                     _from_next(arr, axis, d)], axis=d,
                )

            def _full_ext(arr, d):
                m = _yext(arr, ay, d + 1) if ay else arr
                return _x_ext(m, d)

            f_ext2 = _full_ext(f_new, 1)
            if force_field is not None:
                force_ext2 = _full_ext(force_field, 1)
            elif bf_uniform is not None:
                force_ext2 = bf_uniform[:, None, None, None]
            else:
                force_ext2 = jnp.zeros(3, dtype)[:, None, None, None]
            _, u_ext2 = lbm.macroscopic(f_ext2, force_ext2)
            g_ext = _full_ext(state.cepac, 1)
            m_ext = v_ext = None
            if cep_mask_l is not None:
                m_ext = _full_ext(cep_mask_l[None], 1)[0]
                v_ext = _full_ext(cep_val_l[None], 1)[0]
            g_out = ad_stream_collide(
                g_ext, u_ext2, cfg.cepac_tau, m_ext, v_ext
            )[:, 1:-1]
            if ay:
                g_out = g_out[:, :, 1:-1]
            cepac_new = g_out

        # ---- 4: interpolate (owner shard + psum) -------------------------
        if pos_flat is not None:
            force_bc = force_field
            if force_bc is None and bf_uniform is not None:
                # broadcast view keeps the +F/2 Guo shift in u
                force_bc = bf_uniform[:, None, None, None]

            def _interp(_unused):
                # inside _every: the full-field moment pass only runs on
                # interp steps (same placement as dynamics.py _interp)
                _, u_l = lbm.macroscopic(f_new, force_bc)
                if has_boundaries:
                    um = u_l * fluid_mask_l[None]
                else:
                    um = u_l
                u_ext = _ibm_ext(um)
                if has_boundaries:
                    fields4 = jnp.concatenate([u_ext, mask_ext])
                    v4, _ = pallas_interp(
                        pos_local, fields4, (Xe, Ye, Z),
                        capacity=ibm_capacity, interpret=interpret,
                        plan=ibm_plan,
                    )
                    v4 = jax.lax.psum(v4 * in_f[:, None], psum_axes)
                    v = v4[:, :3] / jnp.maximum(v4[:, 3:4], 1e-30)
                else:
                    v, _ = pallas_interp(
                        pos_local, u_ext, (Xe, Ye, Z),
                        capacity=ibm_capacity, interpret=interpret,
                        plan=ibm_plan,
                    )
                    v = jax.lax.psum(v[:, :3] * in_f[:, None], psum_axes)
                if cfg.lees_edwards_velocity is not None:
                    # galilean frame shift of the wrapped image — inside
                    # the interp step only (see dynamics.py _interp)
                    v = v.at[:, 0].add(le_w * cfg.lees_edwards_velocity)
                return v * act_pad[:, None]

            vel_fallback = jnp.pad(
                jnp.concatenate([cs.vel.reshape(-1, 3) for cs in cells]),
                ((0, pad), (0, 0)),
            )
            vel_flat = _every(
                it, cfg.particle_every, _interp, None, vel_fallback
            )
            offset = 0
            for k, cs in enumerate(cells):
                nc, nv = cs.pos.shape[0], cs.pos.shape[1]
                cnt = nc * nv
                cells[k] = cs._replace(
                    vel=vel_flat[offset: offset + cnt].reshape(nc, nv, 3)
                )
                offset += cnt

        # ---- 4b: solidify mechanics (dynamics.py phase 4b) ---------------
        # Phase A hardens marked cells' interiors tile-locally (the same
        # x/y restriction as interior viscosity); phase B's 27-neighbour
        # binding/Tresca test reads one ppermute ghost row per side per
        # sharded axis (y ghosts two-hop via the x-extended field) and
        # psums the per-cell hit across shards (cells replicated).
        flags_new = state.flags_state
        binding_new = state.binding_mask
        if cfg.solidify_every and state.flags_state is not None:
            from ..cells.interior import interior_mask
            from ..fluid.tresca import tresca_field

            x0i = jax.lax.axis_index(axis) * Xl
            y0s = (
                jax.lax.axis_index(ay) * Yl if ay
                else jnp.asarray(0, jnp.int32)
            )

            def _solidify(args):
                flags_s, binding, cell_list = args
                cell_list = list(cell_list)
                # phase A (solidifyMechanics, pltSimpleModel.cpp:211-248)
                for k2, (tc, cs) in enumerate(zip(cfg.types, cell_list)):
                    if not tc.solidify:
                        continue
                    marked = cs.solidify & cs.alive
                    interior = interior_mask(
                        cs.pos, tc.topo["tri"], marked, shape,
                        tc.interior_box, x_origin=x0i, x_extent=Xl,
                        y_origin=y0s, y_extent=Yl,
                    )
                    interior = interior & (flags_s == 0)
                    flags_s = jnp.where(interior, jnp.uint8(1), flags_s)
                    binding = binding | interior
                    cell_list[k2] = cs._replace(
                        alive=cs.alive & ~marked,
                        solidify=cs.solidify & ~marked,
                    )
                # phase B (solidifyCells, hemoCellParticleField.cpp:
                # 1018-1070): Tresca is node-local (strain from f_new);
                # binding/tresca ghost rows cover the +-1 x-neighbourhood
                force_b = force_field
                if force_b is None:
                    force_b = (
                        bf_uniform if bf_uniform is not None
                        else jnp.zeros(3, dtype)
                    )[:, None, None, None]
                # per-node omega when interior viscosity is active —
                # the single-device path feeds the omega FIELD into the
                # strain computation (dynamics.py phase 4b); a scalar here
                # would skew Tresca exactly at the hardened interior
                # nodes where omega differs (r05 review fix)
                om_tr = (
                    omega_field_new if omega_field_new is not None
                    else jnp.asarray(cfg.omega, dtype)
                )
                tresca = jnp.abs(
                    tresca_field(f_new, force_b, om_tr) / 1e-7
                )
                def _bt_ext(arr):
                    # 1-row ghosts on each sharded axis; y first so the x
                    # extension carries the diagonal corners (two-hop)
                    if ay:
                        arr = _yext(arr, ay, 2)
                    return _yext(arr, axis, 1)

                b_ext = _bt_ext(binding[None].astype(jnp.int32))[0]
                t_ext = _bt_ext(tresca[None])[0]
                nbr = jnp.asarray(
                    np.array(
                        [
                            [i, j, k2_]
                            for i in (-1, 0, 1)
                            for j in (-1, 0, 1)
                            for k2_ in (-1, 0, 1)
                        ],
                        dtype=np.int32,
                    )
                )
                for k2, (tc, cs) in enumerate(zip(cfg.types, cell_list)):
                    if not tc.solidify:
                        continue
                    nc, nv = cs.pos.shape[0], cs.pos.shape[1]
                    p = jnp.mod(cs.pos.reshape(-1, 3), fshape[None, :])
                    node = jnp.floor(p + 0.5).astype(jnp.int32)
                    lx = jnp.mod(node[:, 0], X) - x0i
                    ins_v = (lx >= 0) & (lx < Xl)
                    lx_c = jnp.clip(lx, 0, Xl - 1)
                    if ay:
                        ly = jnp.mod(node[:, 1], Y) - y0s
                        ins_v = ins_v & (ly >= 0) & (ly < Yl)
                        ly_c = jnp.clip(ly, 0, Yl - 1)
                        ny_loc = ly_c[:, None] + nbr[None, :, 1] + 1
                        ny_glob = (
                            y0s + ly_c[:, None] + nbr[None, :, 1]
                        ).astype(dtype)
                    else:
                        ny_ = jnp.mod(node[:, 1], Y)
                        ny_loc = jnp.mod(ny_[:, None] + nbr[None, :, 1], Y)
                        ny_glob = ny_loc.astype(dtype)
                    nz_ = jnp.mod(node[:, 2], Z)
                    nn_x = lx_c[:, None] + nbr[None, :, 0] + 1  # [0, Xl+1]
                    nn_z = jnp.mod(nz_[:, None] + nbr[None, :, 2], Z)
                    b = b_ext[nn_x, ny_loc, nn_z] > 0
                    t = t_ext[nn_x, ny_loc, nn_z]
                    # global neighbour coords (pre-mod is fine: the
                    # min-image below folds any X/Y/Z offset)
                    nn_g = jnp.stack(
                        [
                            (x0i + lx_c[:, None] + nbr[None, :, 0])
                            .astype(dtype),
                            ny_glob,
                            nn_z.astype(dtype),
                        ],
                        axis=-1,
                    )
                    dv = p[:, None, :] - nn_g
                    dv = dv - jnp.round(dv / fshape) * fshape
                    dist = jnp.linalg.norm(dv, axis=-1)
                    hit = (
                        b
                        & (dist <= tc.distance_threshold)
                        & (t > tc.shear_threshold)
                        & ins_v[:, None]
                    )
                    vert_hit = jnp.any(hit, axis=1).reshape(nc, nv)
                    cell_hit_l = jnp.any(vert_hit, axis=1)
                    cell_hit = (
                        jax.lax.psum(
                            cell_hit_l.astype(jnp.int32), psum_axes
                        )
                        > 0
                    ) & cs.alive
                    cell_list[k2] = cs._replace(
                        solidify=cs.solidify | cell_hit
                    )
                return flags_s, binding, tuple(cell_list)

            flags_new, binding_new, new_cells = _every(
                it, cfg.solidify_every, _solidify,
                (state.flags_state, state.binding_mask, tuple(cells)),
                (state.flags_state, state.binding_mask, tuple(cells)),
            )
            cells = list(new_cells)
            flags_l = flags_new

        # ---- 5: advance + boundary-contact deletion ----------------------
        if has_boundaries:
            flags_e = _ibm_ext(flags_l[None])[0]
        for k, cs in enumerate(cells):
            new_pos = cs.pos + cs.vel
            if has_boundaries:
                nc, nv = new_pos.shape[0], new_pos.shape[1]
                p = jnp.mod(new_pos.reshape(-1, 3), fshape[None, :])
                xr = p[:, 0] - x0
                ins = (xr >= 0) & (xr < Xl)
                node_x = jnp.floor(
                    jnp.clip(xr, 0.0, Xl - 1e-6) + 0.5
                ).astype(jnp.int32)
                if ay:
                    yr = p[:, 1] - y0
                    ins = ins & (yr >= 0) & (yr < Yl)
                    node_y = jnp.floor(
                        jnp.clip(yr, 0.0, Yl - 1e-6) + 0.5
                    ).astype(jnp.int32)
                else:
                    node_y = jnp.mod(
                        jnp.floor(p[:, 1] + 0.5).astype(jnp.int32), Y
                    )
                node_z = jnp.mod(
                    jnp.floor(p[:, 2] + 0.5).astype(jnp.int32), Z
                )
                hit_l = (
                    (flags_e[node_x, node_y, node_z] != FLAG_FLUID) & ins
                )
                hit = jax.lax.psum(hit_l.astype(jnp.int32), psum_axes) > 0
                hit = hit.reshape(nc, nv)
                alive = cs.alive & ~jnp.any(hit, axis=1)
            else:
                alive = cs.alive
            restime = cs.restime
            if restime is not None:
                restime = restime + alive.astype(jnp.int32)
            cells[k] = cs._replace(pos=new_pos, alive=alive,
                                   restime=restime)

        # ---- 6: constitutive model (sharded by cell ownership) -----------
        # The reference stores particles per block and each rank runs the
        # model only on its own cells (core/hemoCellFields.cpp:70-111);
        # replicating this per-vertex work would cap weak scaling (every
        # chip paying total-suspension mechanics).  Each shard computes a
        # contiguous block of cells; a psum at the material cadence
        # rebuilds the replicated force exactly (zeros elsewhere, so f32
        # addition is exact and shard-count invariant).
        n_shards = nx * ny
        rank = jax.lax.axis_index(axis) * ny + (
            jax.lax.axis_index(ay) if ay else 0
        )
        for k, (tc, cs) in enumerate(zip(cfg.types, cells)):
            NC = cs.pos.shape[0]
            blk = -(-NC // n_shards)

            def _mech(args, tc=tc, cs=cs, NC=NC, blk=blk):
                p, v = args
                if n_shards == 1 or NC < n_shards:
                    ft = jax.vmap(
                        lambda pp, vv: tc.model_fn(
                            pp, vv, tc.topo, tc.material
                        ).total
                    )(p, v)
                    if tc.ext_force is not None:
                        ft = ft + tc.ext_force
                    return jnp.where(cs.alive[:, None, None], ft, 0.0)
                NCp = blk * n_shards
                padc = NCp - NC
                pp_ = jnp.pad(p, ((0, padc), (0, 0), (0, 0)))
                vv_ = jnp.pad(v, ((0, padc), (0, 0), (0, 0)))
                al_ = jnp.pad(cs.alive, (0, padc))
                start = rank * blk
                pb = jax.lax.dynamic_slice_in_dim(pp_, start, blk)
                vb = jax.lax.dynamic_slice_in_dim(vv_, start, blk)
                ab = jax.lax.dynamic_slice_in_dim(al_, start, blk)
                ftb = jax.vmap(
                    lambda q, w: tc.model_fn(
                        q, w, tc.topo, tc.material
                    ).total
                )(pb, vb)
                if tc.ext_force is not None:
                    eb = jax.lax.dynamic_slice_in_dim(
                        jnp.pad(tc.ext_force, ((0, padc), (0, 0), (0, 0)))
                        if tc.ext_force.shape[0] == NC else tc.ext_force,
                        start, blk,
                    ) if tc.ext_force.ndim == 3 and \
                        tc.ext_force.shape[0] in (NC, NCp) else tc.ext_force
                    ftb = ftb + eb
                # dead/padded slots may hold degenerate geometry (NaN);
                # where (not multiply) so NaN*0 can't leak
                ftb = jnp.where(ab[:, None, None], ftb, 0.0)
                full = jnp.zeros((NCp,) + ftb.shape[1:], ftb.dtype)
                full = jax.lax.dynamic_update_slice_in_dim(
                    full, ftb, start, 0
                )
                return jax.lax.psum(full, psum_axes)[:NC]

            force = _every(
                it, tc.material_every, _mech, (cs.pos, cs.vel), cs.force
            )
            cells[k] = cs._replace(force=force)

        # running-max window overflow, same carry contract as
        # dynamics.build_step (facade guard: hemocell.py _check_overflow)
        ov_new = state.ibm_overflow
        if ov_new is not None and step_overflow is not None:
            ov_new = jnp.maximum(ov_new, step_overflow)
        if ov_new is not None and rep_overflow is not None:
            # replicated repulsion: same value on every shard, no psum
            ov_new = jnp.maximum(ov_new, rep_overflow)
        return SimState(
            f=f_new, it=it + 1, cells=tuple(cells),
            cepac=cepac_new, omega_field=omega_field_new,
            flags_state=flags_new, binding_mask=binding_new,
            bc_state=None, body_force_state=None,
            le_displacement=le_disp_new,
            ibm_overflow=ov_new,
        )

    return local_step


def build_shardmap_runner(cfg: StepConfig, mesh: Mesh, axis: str = "x",
                          use_pallas=None, interpret=None):
    """jitted (state, n) -> state: the shard_map coupled step iterated with
    fori_loop, lattice sharded along ``axis`` (plus the second mesh axis
    over Y on a 2-D mesh), cells replicated."""
    X = int(cfg.shape[0])
    Y = int(cfg.shape[1])
    axes = tuple(mesh.axis_names)
    ay = axes[1] if len(axes) > 1 and int(mesh.shape[axes[1]]) > 1 else None
    nx = int(mesh.shape[axis])
    Xl = X // nx
    Yl = Y // int(mesh.shape[ay]) if ay else Y
    local = build_shardmap_step(cfg, mesh, axis, use_pallas, interpret)

    f_spec = P(None, axis, ay, None)
    g_spec = P(axis, ay, None)

    flags_sh = jax.device_put(
        jnp.asarray(cfg.flags), NamedSharding(mesh, g_spec)
    )
    bc_sh = (
        jax.device_put(jnp.asarray(cfg.bc_velocity),
                       NamedSharding(mesh, f_spec))
        if cfg.bc_velocity is not None
        else None
    )

    def state_specs(state: SimState):
        specs = jax.tree.map(lambda _: P(), state)
        specs = specs._replace(f=f_spec)
        if state.cepac is not None:
            specs = specs._replace(cepac=f_spec)
        if state.omega_field is not None:
            specs = specs._replace(omega_field=g_spec)
        if state.flags_state is not None:
            specs = specs._replace(flags_state=g_spec,
                                   binding_mask=g_spec)
        return specs

    cep_mask_sh = cep_val_sh = None
    if cfg.cepac_tau is not None and cfg.cepac_dirichlet_mask is not None:
        cep_mask_sh = jax.device_put(
            jnp.asarray(cfg.cepac_dirichlet_mask), NamedSharding(mesh, g_spec)
        )
        cep_val_sh = jax.device_put(
            jnp.asarray(cfg.cepac_dirichlet_value), NamedSharding(mesh, g_spec)
        )

    opts = None
    if jax.default_backend() == "tpu":
        lcfg = dataclasses.replace(
            cfg, shape=(Xl + 1, Yl + 2 if ay else Yl) + tuple(cfg.shape[2:])
        )
        opts = {"xla_tpu_scoped_vmem_limit_kib": scoped_vmem_limit_kib(lcfg)}

    def run(state: SimState, n_iter: int) -> SimState:
        specs = state_specs(state)
        shstep = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                specs, g_spec,
                f_spec if bc_sh is not None else P(),
                g_spec if cep_mask_sh is not None else P(),
                g_spec if cep_val_sh is not None else P(),
            ),
            out_specs=specs,
            check_vma=False,
        )

        @partial(jax.jit, compiler_options=opts)
        def _run(s):
            return jax.lax.fori_loop(
                0, n_iter,
                lambda _, ss: shstep(ss, flags_sh, bc_sh, cep_mask_sh,
                                     cep_val_sh),
                s,
            )

        return _run(state)

    return run
