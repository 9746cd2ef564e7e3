"""pipeflow_with_preinlet: tube flow fed by a periodic driver section.

Port of examples/pipeflow_with_preinlet (reference:
examples/pipeflow_with_preinlet/*.cpp + helper/preInlet.cpp): a periodic
preinlet tube develops flow with cells under an adaptive body force; its
outlet velocity profile drives the main tube's inlet, and cells crossing the
interface are re-injected into the main domain.

Usage: python examples/pipeflow_with_preinlet.py <config.xml> [--tmax N]
(config: a reference-format pipeflow config, e.g.
 /root/reference/examples/pipeflow/config.xml)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_VELOCITY
from hemocell_tpu.cells.state import make_cell_state
from hemocell_tpu.dynamics import StepConfig, initial_sim_state
from hemocell_tpu.utils.preinlet import (
    PreInletState,
    initial_crossings,
    make_coupled_stepper,
)
from pipeflow import build_pipeflow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--tmax", type=int, default=2000)
    ap.add_argument("--spare-slots", type=int, default=64)
    ap.add_argument("--tcheckpoint", type=int, default=0,
                    help="checkpoint both domains every N steps "
                         "(reference PRE_* variants)")
    ap.add_argument("--checkpoint-dir", default="checkpoint_preinlet")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint-dir")
    ap.add_argument("--distribute", type=int, default=0,
                    help="shard the MAIN domain over N devices (preinlet "
                         "replicated) — the reference's rank split "
                         "(core/hemoCell.cpp:475-571) as one SPMD program")
    ap.add_argument("--no-pallas", action="store_true",
                    help="jnp fluid path in the distributed runner (fast "
                         "on CPU virtual meshes; TPU wants the default)")
    args = ap.parse_args()

    # main domain from the standard pipeflow builder, preinlet = a copy of
    # its geometry (the reference's preInletFromSlice extrudes the inlet)
    hc = build_pipeflow(args.config)
    hc._build()
    main_cfg = hc._step_cfg

    flags = np.asarray(hc.flags)
    pre_flags = flags.copy()
    pre_cfg = StepConfig(
        shape=hc.shape,
        flags=jnp.asarray(pre_flags),
        omega=hc.omega,
        types=main_cfg.types,
        body_force=jnp.asarray([1.0, 0.0, 0.0], hc.dtype),  # scaled by state
        particle_every=hc.particle_every,
        f_limit=hc.params.f_limit,
        dtype=hc.dtype,
    )

    # main domain: velocity-BC inlet plane instead of body force
    mflags = flags.copy()
    inlet_fluid = flags[0] == FLAG_FLUID
    mflags[0][inlet_fluid] = FLAG_VELOCITY
    import dataclasses

    main_cfg = dataclasses.replace(
        main_cfg, flags=jnp.asarray(mflags), body_force=None
    )
    if args.no_pallas:
        pre_cfg = dataclasses.replace(pre_cfg, use_pallas=False)
        main_cfg = dataclasses.replace(main_cfg, use_pallas=False)

    # preinlet takes the loaded cells; the main domain starts empty with
    # spare dead slots per type to receive injections
    pre_cells = list(hc.cell_states)
    main_cells = []
    for k, ct in enumerate(hc.cell_types):
        nv = ct.num_vertices
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
    runner = None
    if args.distribute:
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
            use_pallas=False if args.no_pallas else None,
        )
    stepper = make_coupled_stepper(
        pre_cfg, main_cfg, target_mean_velocity=hc.params.u_lbm_max * 0.4
    )
    if args.resume:
        from hemocell_tpu.io import load_preinlet_checkpoint

        st, meta = load_preinlet_checkpoint(args.checkpoint_dir,
                                            dtype=hc.dtype)
        print(f"(preinlet pipeflow) resumed at iter {int(st.pre.it)}"
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
        if runner is not None:
            st = runner(st, 1)
        else:
            st = stepper(st)
        if (it + 1) % report == 0:
            jax.block_until_ready(st)
            n_main = sum(int(cs.alive.sum()) for cs in st.main.cells)
            n_pre = sum(int(cs.alive.sum()) for cs in st.pre.cells)
            print(
                f"iter {it+1}: preinlet cells {n_pre}, main cells {n_main}, "
                f"drive {float(st.body_force):.3e}"
            )
        if args.tcheckpoint and (it + 1) % args.tcheckpoint == 0:
            from hemocell_tpu.io import save_preinlet_checkpoint

            jax.block_until_ready(st)
            save_preinlet_checkpoint(args.checkpoint_dir, st,
                                     meta={"iteration": it + 1})
    print("(preinlet pipeflow) done")


if __name__ == "__main__":
    main()
