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

        # particle re-injection by periodic-image crossing count
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
            new_crossings.append(jnp.maximum(st.crossings[k], images))

            # inject the first crossed cell (at most one per type per step;
            # crossings are rare relative to the step rate)
            src = jnp.argmax(crossed)
            any_crossed = jnp.any(crossed)
            free = jnp.argmin(mcs.alive)  # first dead slot
            has_free = ~jnp.all(mcs.alive)
            do = any_crossed & has_free

            # map preinlet coordinates into the main domain: wrapped position
            # near the outlet becomes position near the main inlet
            src_pos = pcs.pos[src]
            src_pos = src_pos - jnp.floor(
                src_pos[:, 0].mean() / Lp
            ) * Lp * jnp.asarray([1.0, 0.0, 0.0], dtype)

            def inject(cs):
                return cs._replace(
                    pos=cs.pos.at[free].set(src_pos),
                    vel=cs.vel.at[free].set(pcs.vel[src]),
                    force=cs.force.at[free].set(0.0),
                    force_repulsion=cs.force_repulsion.at[free].set(0.0),
                    alive=cs.alive.at[free].set(True),
                )

            main_cells[k] = jax.lax.cond(do, inject, lambda cs: cs, mcs)

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
