"""PreInlet: a periodic driver section generating developed inflow with
cells for a main domain.

TPU-native equivalent of the reference ``PreInlet``
(helper/preInlet.{h,cpp}): instead of splitting MPI ranks into preinlet and
domain groups with raw point-to-point transfers
(core/hemoCell.cpp:475-571, preInlet.cpp:254-452), both regions are separate
jitted simulations coupled once per step inside ONE compiled function:

  * velocity coupling: the preinlet's outlet velocity plane is imposed on
    the main domain's inlet as a dynamic velocity-BC state
    (applyPreInletVelocityBoundary, preInlet.cpp:353-398);
  * particle re-injection: preinlet positions are unwrapped, so every time a
    cell's centre crosses a multiple of the preinlet length it represents a
    fresh periodic image entering the main domain — that image is copied
    into a free (dead) slot of the main domain's cell arrays
    (applyPreInletParticleBoundary, preInlet.cpp:254-352);
  * driving: the preinlet body force is rescaled towards a target mean
    velocity (setDrivingForce, preInlet.cpp:742-938).

The main-domain cell arrays must be allocated with spare dead slots
(``spare_slots`` of make_cell_state positions placed far outside, alive
False) to receive injections.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics import SimState, StepConfig, build_step
from ..fluid import lbm


class PreInletState(NamedTuple):
    pre: SimState
    main: SimState
    body_force: jnp.ndarray  # scalar, adaptive drive of the preinlet
    crossings: tuple  # per type: int32 [NC] images already injected


def load_pulse_profile(csv_path: str):
    """Normalized pulsatile velocity profile from a CSV (one value per line,
    mean ~1), the format the reference's setDrivingForceTimeDependent reads
    (helper/preInlet.cpp:802-911)."""
    import numpy as _np

    vals = _np.loadtxt(csv_path, delimiter=",").reshape(-1)
    return jnp.asarray(vals, jnp.float32)


def _advance_and_couple(st, pre_step, pre_cfg, Lp, dtype,
                        target_mean_velocity, drive_gain,
                        pulse_profile, pulse_period_steps):
    """Shared coupling core: adaptive drive, one preinlet step, outlet
    velocity plane, particle re-injection into the main cell arrays.

    Pure function of replicated values — inside a shard_map it computes
    identically on every shard, so the distributed runner needs NO
    collectives for the coupling itself (the reference ships the plane and
    particle structs over MPI instead, preInlet.cpp:254-452)."""
    # adaptive body force toward the (possibly pulsatile) target velocity
    zero_force = jnp.zeros((3,) + tuple(pre_cfg.shape), dtype)
    _, u_pre = lbm.macroscopic(st.pre.f, zero_force)
    u_mean = u_pre[0].mean()
    bf = st.body_force
    if target_mean_velocity > 0.0:
        target = target_mean_velocity
        if pulse_profile is not None and pulse_period_steps > 0:
            T = pulse_profile.shape[0]
            phase = (st.pre.it * T) // pulse_period_steps
            target = target * pulse_profile[jnp.mod(phase, T)]
        bf = bf * (1.0 + drive_gain * jnp.sign(target - u_mean))

    # the adaptive drive flows through the dynamic body-force override
    pre_state = st.pre._replace(
        body_force_state=jnp.asarray([bf, 0.0, 0.0], dtype)
    )
    # drop the override on the way out: the drive is recomputed from
    # st.body_force each step, and a structurally-stable state is required
    # by the distributed runner's fori_loop / shard_map out_specs
    pre2 = pre_step(pre_state)._replace(body_force_state=None)

    # velocity plane coupling: outlet plane of the preinlet -> main inlet
    _, u_out = lbm.macroscopic(pre2.f, zero_force)
    plane = u_out[:, Lp - 1, :, :].astype(dtype)  # [3, Y, Z]

    # particle re-injection by periodic-image crossing count: EVERY
    # crossed cell is shipped this step (the reference transfers the
    # full crossing set each iteration, preInlet.cpp:254-352) — the
    # i-th crossed cell (in index order) lands in the i-th free slot.
    new_crossings = []
    main_cells = list(st.main.cells)
    for k, (pcs, mcs) in enumerate(zip(pre2.cells, st.main.cells)):
        if pcs.pos.shape[0] == 0 or mcs.pos.shape[0] == 0:
            # type with no cells in the preinlet (or no receiving slots):
            # nothing can ever cross
            new_crossings.append(st.crossings[k])
            continue
        cx = pcs.pos[:, :, 0].mean(axis=1)  # unwrapped centres
        images = jnp.floor(cx / Lp).astype(jnp.int32)
        crossed = (images > st.crossings[k]) & pcs.alive
        n_free = jnp.sum(~mcs.alive)
        rank = jnp.cumsum(crossed) - 1  # rank among crossed cells
        injected = crossed & (rank < n_free)
        # watermark advances ONLY for injected crossings, so a cell
        # denied by a full receiver retries next step instead of being
        # silently dropped
        new_crossings.append(
            jnp.where(injected, images, st.crossings[k])
        )

        # map preinlet coordinates into the main domain: subtract the
        # periodic image offset so the fresh image enters at the inlet
        shift = jnp.floor(cx / Lp).astype(dtype) * Lp
        mapped_pos = pcs.pos - shift[:, None, None] * jnp.asarray(
            [1.0, 0.0, 0.0], dtype
        )

        # pair crossed cells with free slots by rank (both argsorts are
        # stable, so ranks align with index order)
        NCp = crossed.shape[0]
        NCm = mcs.alive.shape[0]
        R = min(NCp, NCm)  # static bound on injections per step
        src = jnp.argsort(~crossed, stable=True)[:R]  # crossed first
        tgt = jnp.argsort(mcs.alive, stable=True)[:R]  # dead first
        count = jnp.minimum(jnp.sum(crossed), n_free)
        m = jnp.arange(R) < count

        def sel(new, old):
            mm = m.reshape((R,) + (1,) * (new.ndim - 1))
            return jnp.where(mm, new, old)

        main_cells[k] = mcs._replace(
            pos=mcs.pos.at[tgt].set(sel(mapped_pos[src], mcs.pos[tgt])),
            vel=mcs.vel.at[tgt].set(sel(pcs.vel[src], mcs.vel[tgt])),
            force=mcs.force.at[tgt].set(
                sel(jnp.zeros_like(mcs.force[tgt]), mcs.force[tgt])
            ),
            force_repulsion=mcs.force_repulsion.at[tgt].set(
                sel(
                    jnp.zeros_like(mcs.force_repulsion[tgt]),
                    mcs.force_repulsion[tgt],
                )
            ),
            alive=mcs.alive.at[tgt].set(m | mcs.alive[tgt]),
        )
    return pre2, bf, plane, main_cells, tuple(new_crossings)


def make_coupled_stepper(
    pre_cfg: StepConfig,
    main_cfg: StepConfig,
    flow_axis: int = 0,
    target_mean_velocity: float = 0.0,
    drive_gain: float = 1e-3,
    pulse_profile=None,
    pulse_period_steps: int = 0,
):
    """Build a jitted (PreInletState) -> PreInletState coupled step.

    pre_cfg must be periodic along flow_axis; main_cfg must have
    FLAG_VELOCITY nodes on its inlet plane (index 0 along flow_axis).
    pulse_profile: optional [T] normalized waveform scaling the target mean
    velocity over pulse_period_steps (pulsatile driving,
    helper/preInlet.cpp:802-911).
    """
    assert flow_axis == 0, "flow along x for now"
    pre_step = build_step(pre_cfg)
    main_step = build_step(main_cfg)
    Lp = pre_cfg.shape[0]
    dtype = main_cfg.dtype

    def step(st: PreInletState) -> PreInletState:
        pre2, bf, plane, main_cells, new_crossings = _advance_and_couple(
            st, pre_step, pre_cfg, Lp, dtype, target_mean_velocity,
            drive_gain, pulse_profile, pulse_period_steps,
        )
        bc = st.main.bc_state
        bc = bc.at[:, 0, :, :].set(plane)
        main2 = main_step(
            st.main._replace(bc_state=bc, cells=tuple(main_cells))
        )
        return PreInletState(
            pre=pre2, main=main2, body_force=bf,
            crossings=new_crossings,
        )

    return jax.jit(step)


def initial_crossings(pre_state: SimState, pre_length: int):
    out = []
    for cs in pre_state.cells:
        cx = cs.pos[:, :, 0].mean(axis=1)
        out.append(jnp.floor(cx / pre_length).astype(jnp.int32))
    return tuple(out)


def preinlet_from_slice(main_flags, x_index: int, length: int):
    """Construct a periodic preinlet driver domain from one cross-section
    of the main domain (reference ``PreInlet::preInletFromSlice``,
    helper/preInlet.cpp:591-640): the wall pattern of the slice is
    replicated ``length`` times along the flow axis.

    Returns (pre_flags [length,Y,Z] uint8, inlet_mask [Y,Z] bool) where
    inlet_mask marks the fluid nodes of the slice (the coupling plane).
    """
    from ..config.defaults import FLAG_FLUID

    flags = np.asarray(main_flags)
    plane = flags[x_index]
    pre_flags = np.broadcast_to(
        plane[None], (int(length),) + plane.shape
    ).astype(np.uint8).copy()
    inlet_mask = plane == FLAG_FLUID
    return pre_flags, inlet_mask


def auto_preinlet_from_boundary(main_flags, length: int, face: str = "low"):
    """Create a preinlet from the main domain's boundary face — the
    reference's ``autoPreinletFromBoundary`` (helper/preInlet.cpp:641-671)
    walks inward from the face until it finds a plane with fluid nodes and
    slices the preinlet there.

    Returns (pre_flags, inlet_mask, main_flags_marked, x_face) where
    main_flags_marked has the face's fluid nodes re-tagged FLAG_VELOCITY
    (the plane the coupled stepper drives), and x_face is the slice index
    used.
    """
    from ..config.defaults import FLAG_FLUID, FLAG_VELOCITY

    flags = np.asarray(main_flags)
    X = flags.shape[0]
    sweep = range(X) if face == "low" else range(X - 1, -1, -1)
    for x in sweep:
        if (flags[x] == FLAG_FLUID).any():
            break
    else:
        raise ValueError("no fluid plane found along the flow axis")
    pre_flags, inlet_mask = preinlet_from_slice(flags, x, length)
    marked = flags.copy()
    plane = marked[x]
    plane[inlet_mask] = FLAG_VELOCITY
    marked[x] = plane
    return pre_flags, inlet_mask, marked, x


def build_coupled_shardmap_runner(
    pre_cfg: StepConfig,
    main_cfg: StepConfig,
    mesh,
    axis: str = "x",
    flow_axis: int = 0,
    target_mean_velocity: float = 0.0,
    drive_gain: float = 1e-3,
    pulse_profile=None,
    pulse_period_steps: int = 0,
    use_pallas=None,
    interpret=None,
):
    """Distributed coupled pre+main stepper: jitted (PreInletState, n) ->
    PreInletState with the MAIN domain sharded over ``mesh`` and the
    preinlet REPLICATED on every shard.

    The reference splits MPI ranks into preinlet/domain groups and ships
    the velocity plane + crossing particles point-to-point
    (core/hemoCell.cpp:475-571, helper/preInlet.cpp:254-452).  Here the
    preinlet is a small driver section advanced identically on every shard
    (deterministic SPMD — replicated compute beats a broadcast on ICI),
    so the whole coupling needs ZERO collectives: the velocity plane is
    locally available (the shard owning global row 0 writes it into its
    bc block), and the injection updates the replicated main cell arrays
    in place.  The main domain runs the shard_map fast path
    (parallel/sharded_step.py) with its halo ppermutes.

    st.main must be sharded (shard_state) and carry a full bc_state field;
    st.pre stays replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharded_step import (
        build_shardmap_step,
        shardmap_supported,
    )

    assert flow_axis == 0, "flow along x for now"
    assert shardmap_supported(main_cfg, mesh), (
        "main cfg not supported by the shard_map step"
    )
    pre_step = build_step(pre_cfg)
    local_main = build_shardmap_step(main_cfg, mesh, axis, use_pallas,
                                     interpret)
    Lp = pre_cfg.shape[0]
    dtype = main_cfg.dtype
    nx = int(mesh.shape[axis])
    axes = tuple(mesh.axis_names)
    ay = axes[1] if len(axes) > 1 and int(mesh.shape[axes[1]]) > 1 else None
    f_spec = P(None, axis, ay, None)
    g_spec = P(axis, ay, None)

    flags_sh = jax.device_put(
        jnp.asarray(main_cfg.flags), NamedSharding(mesh, g_spec)
    )

    def local_coupled(st: PreInletState, flags_l) -> PreInletState:
        pre2, bf, plane, main_cells, new_crossings = _advance_and_couple(
            st, pre_step, pre_cfg, Lp, dtype, target_mean_velocity,
            drive_gain, pulse_profile, pulse_period_steps,
        )
        # dynamic inlet BC: the shard owning global row 0 substitutes the
        # (locally available, replicated) preinlet outlet plane
        bc_l = st.main.bc_state  # [3, Xl, Yl?, Z] local block
        rank = jax.lax.axis_index(axis)
        row0 = jnp.where(
            rank == 0, plane_local(plane, bc_l), bc_l[:, 0]
        )
        bc_new = bc_l.at[:, 0].set(row0)
        main_in = st.main._replace(cells=tuple(main_cells), bc_state=None)
        main2 = local_main(main_in, flags_l, bc_new)
        main2 = main2._replace(bc_state=bc_new)
        return PreInletState(pre=pre2, main=main2, body_force=bf,
                             crossings=new_crossings)

    def plane_local(plane, bc_l):
        # slice the (full-Y) plane down to this shard's y-range on 2-D
        # meshes; 1-D meshes take it whole
        if ay is None:
            return plane
        Yl = bc_l.shape[2]
        y0 = jax.lax.axis_index(ay) * Yl
        return jax.lax.dynamic_slice_in_dim(plane, y0, Yl, axis=1)

    def run(st: PreInletState, n_iter: int) -> PreInletState:
        assert st.main.bc_state is not None, (
            "distributed preinlet needs st.main.bc_state (full BC field)"
        )
        specs = jax.tree.map(lambda _: P(), st)
        main_specs = specs.main._replace(f=f_spec, bc_state=f_spec)
        specs = specs._replace(main=main_specs)
        sh = jax.shard_map(
            local_coupled,
            mesh=mesh,
            in_specs=(specs, g_spec),
            out_specs=specs,
            check_vma=False,
        )

        @partial(jax.jit, static_argnums=(1,))
        def _run(s, n):
            return jax.lax.fori_loop(
                0, n, lambda _, ss: sh(ss, flags_sh), s
            )

        return _run(st, n_iter)

    return run


def shard_preinlet_state(st: PreInletState, mesh) -> PreInletState:
    """Place a PreInletState for the distributed runner: main sharded
    (lattice + bc field), preinlet + crossings replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import lattice_spec, shard_state

    main = shard_state(st.main, mesh)
    if st.main.bc_state is not None:
        main = main._replace(bc_state=jax.device_put(
            st.main.bc_state, NamedSharding(mesh, lattice_spec(mesh))
        ))
    rep = NamedSharding(mesh, P())
    return PreInletState(
        pre=jax.tree.map(lambda x: jax.device_put(x, rep), st.pre),
        main=main,
        body_force=jax.device_put(st.body_force, rep),
        crossings=jax.tree.map(lambda x: jax.device_put(x, rep),
                               st.crossings),
    )
