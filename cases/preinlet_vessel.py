"""Generic STL-vessel + preinlet runner: AR2 / injured_vessel / stl_preinlet.

One runner for the reference's family of "real vessel geometry fed by a
periodic preinlet" cases, which differ only in STL, material stiffness and
driving (cases/AR2/AR2.cpp, cases/AR2_stiff, cases/AR2_pulsatile — pulsatile
waveform from pulse_vel_normalized.txt via setDrivingForceTimeDependent
(helper/preInlet.cpp:802-911), cases/injured_vessel/injured_vessel.cpp —
preInletFromSlice(Xpos) + pressure outlet, cases/stl_preinlet):

  python cases/preinlet_vessel.py /root/reference/cases/AR2/config.xml
  python cases/preinlet_vessel.py /root/reference/cases/AR2_pulsatile/config.xml  # auto-pulsatile
  python cases/preinlet_vessel.py /root/reference/cases/injured_vessel/config.xml
  python cases/preinlet_vessel.py /root/reference/cases/stl_preinlet/config.xml

The preinlet is a periodic copy of the inlet geometry (the reference's
preInletFromSlice extrudes the inlet plane, helper/preInlet.cpp:453-590);
cells develop there under an adaptive body force and are re-injected into
the main domain at the interface.  A ``<pulseFileName>`` in the config's
``<preInlet>`` section enables pulsatile driving automatically.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.cells.state import make_cell_state
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_VELOCITY
from hemocell_tpu.dynamics import StepConfig, initial_sim_state
from hemocell_tpu.utils.preinlet import (
    PreInletState,
    initial_crossings,
    load_pulse_profile,
    make_coupled_stepper,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
from pipeflow import build_pipeflow  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="reference-format vessel config.xml")
    ap.add_argument("--tmax", type=int, default=2000)
    ap.add_argument("--spare-slots", type=int, default=64)
    ap.add_argument("--pulse-period", type=int, default=None,
                    help="pulse period in steps (default: 1/pFrequency / dt)")
    ap.add_argument("--distribute", type=int, default=0,
                    help="run main domain sharded over N devices (the "
                    "reference runs these cases multi-rank, "
                    "helper/preInlet.cpp:254-452)")
    ap.add_argument("--tcheckpoint", type=int, default=0,
                    help="checkpoint every N iterations")
    ap.add_argument("--checkpoint-dir", default="checkpoint")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    hc = build_pipeflow(args.config)
    hc._build()
    main_cfg = hc._step_cfg
    cfg = hc.cfg

    # pulsatile waveform (AR2_pulsatile): <preInlet><pulseFileName>
    pulse = None
    period = 0
    if "preInlet" in cfg and "pulseFileName" in cfg["preInlet"]:
        pulse_path = os.path.join(
            cfg.directory, cfg["preInlet"]["pulseFileName"].read(str)
        )
        pulse = load_pulse_profile(pulse_path)
        freq = cfg["preInlet"].get("pFrequency", float, 1.0)
        period = args.pulse_period or int(round(1.0 / freq / hc.params.dt))
        print(f"(preinlet-vessel) pulsatile drive: {pulse.shape[0]} samples, "
              f"period {period} steps")

    flags = np.asarray(hc.flags)
    # the preinlet is the INLET PLANE EXTRUDED into a periodic driver tube
    # (the reference's preInletFromSlice semantics, helper/preInlet.cpp:
    # 453-590) — vessel trees like AR2 are not x-uniform, so the raw
    # vessel flags would put a discontinuity at the periodic wrap
    pre_flags = np.broadcast_to(flags[0][None], flags.shape).copy()
    pre_cfg = StepConfig(
        shape=hc.shape,
        flags=jnp.asarray(pre_flags),
        omega=hc.omega,
        types=main_cfg.types,
        body_force=jnp.asarray([1.0, 0.0, 0.0], hc.dtype),
        particle_every=hc.particle_every,
        f_limit=hc.params.f_limit,
        dtype=hc.dtype,
    )

    mflags = flags.copy()
    inlet_fluid = flags[0] == FLAG_FLUID
    mflags[0][inlet_fluid] = FLAG_VELOCITY
    main_cfg = dataclasses.replace(
        main_cfg, flags=jnp.asarray(mflags), body_force=None
    )

    pre_cells = list(hc.cell_states)
    main_cells = []
    for ct in hc.cell_types:
        far = ct.mesh.vertices[None] + np.array([-1000.0, 10.0, 10.0])
        far = np.repeat(far, args.spare_slots, axis=0)
        cs = make_cell_state(far, dtype=hc.dtype)
        main_cells.append(cs._replace(alive=jnp.zeros(args.spare_slots, bool)))

    pre_state = initial_sim_state(pre_cfg, pre_cells)
    main_state = initial_sim_state(main_cfg, main_cells)
    main_state = main_state._replace(
        bc_state=jnp.zeros((3,) + hc.shape, hc.dtype)
    )

    r = hc.params.pipe_radius
    poiseuille = 8 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / r / r
    runner = dmesh = None
    if args.distribute:
        # distributed flagship: main domain sharded over the mesh,
        # preinlet replicated, one shard_map program (the reference's
        # preinlet/domain rank split, core/hemoCell.cpp:475-571)
        from hemocell_tpu.parallel import make_mesh
        from hemocell_tpu.utils.preinlet import (
            build_coupled_shardmap_runner,
            shard_preinlet_state,
        )

        if hc.shape[0] % args.distribute:
            sys.exit(f"X={hc.shape[0]} not divisible by {args.distribute}")
        dmesh = make_mesh(args.distribute, axes=("x",))
        runner = build_coupled_shardmap_runner(
            pre_cfg, main_cfg, dmesh,
            target_mean_velocity=hc.params.u_lbm_max * 0.4,
            pulse_profile=pulse, pulse_period_steps=period,
        )
    stepper = make_coupled_stepper(
        pre_cfg, main_cfg,
        target_mean_velocity=hc.params.u_lbm_max * 0.4,
        pulse_profile=pulse, pulse_period_steps=period,
    )
    if args.resume:
        from hemocell_tpu.io import load_preinlet_checkpoint

        st, meta = load_preinlet_checkpoint(args.checkpoint_dir,
                                            dtype=hc.dtype)
        print(f"(preinlet-vessel) resumed at iter {int(st.pre.it)}"
              f" from {args.checkpoint_dir}")
    else:
        st = PreInletState(
            pre=pre_state,
            main=main_state,
            body_force=jnp.asarray(poiseuille, hc.dtype),
            crossings=initial_crossings(pre_state, hc.shape[0]),
        )

    report = max(1, args.tmax // 10)
    start = int(st.pre.it)
    if runner is not None:
        st = shard_preinlet_state(st, dmesh)
    for it in range(start, args.tmax):
        st = runner(st, 1) if runner is not None else stepper(st)
        if (it + 1) % report == 0:
            jax.block_until_ready(st)
            n_main = sum(int(cs.alive.sum()) for cs in st.main.cells)
            n_pre = sum(int(cs.alive.sum()) for cs in st.pre.cells)
            print(
                f"iter {it + 1}: preinlet cells {n_pre}, main cells {n_main},"
                f" drive {float(st.body_force):.3e}"
            )
        if args.tcheckpoint and (it + 1) % args.tcheckpoint == 0:
            from hemocell_tpu.io import save_preinlet_checkpoint

            save_preinlet_checkpoint(args.checkpoint_dir, st)
            print(f"(preinlet-vessel) checkpoint @ {it + 1}")
    print("(preinlet-vessel) done")


if __name__ == "__main__":
    main()
