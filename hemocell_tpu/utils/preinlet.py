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
        pre2 = pre_step(pre_state)

        # velocity plane coupling: outlet plane of the preinlet -> main inlet
        _, u_out = lbm.macroscopic(pre2.f, zero_force)
        plane = u_out[:, Lp - 1, :, :]  # [3, Y, Z]
        bc = st.main.bc_state
        bc = bc.at[:, 0, :, :].set(plane.astype(dtype))

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

        main2 = main_step(
            st.main._replace(bc_state=bc, cells=tuple(main_cells))
        )
        return PreInletState(
            pre=pre2, main=main2, body_force=bf,
            crossings=tuple(new_crossings),
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
