"""curvedflow_with_preinlet: cells through a curved vessel fed by a preinlet.

Port of examples/curvedflow_with_preinlet (reference:
examples/curvedflow_with_preinlet/curvedflow_with_preinlet.cpp:28-243):
voxelize curved.stl, attach a periodic preinlet at the inlet plane that
develops flow with RBC_HO + PLT cells under an adaptive body force, and
drive the curved main domain's inlet with the preinlet's outlet profile,
re-injecting cells that cross the interface.

The reference places the inlet at the max-x plane (slice.x0 = slice.x1,
curvedflow_with_preinlet.cpp:77); our preinlet machinery injects in +x, so
the voxelized geometry is mirrored along x — physically identical flow.
The preinlet itself is a straight x-extrusion of the inlet cross-section
(the analog of preInletFromSlice).

Usage: python examples/curvedflow_with_preinlet.py [config.xml] [--tmax N]
Defaults to the reference case config.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.cells.state import make_cell_state
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_VELOCITY
from hemocell_tpu.dynamics import StepConfig, initial_sim_state
from hemocell_tpu.utils.preinlet import (
    PreInletState,
    initial_crossings,
    make_coupled_stepper,
)
from hemocell_tpu.utils.voxelize import voxelize_stl

REF_CONFIG = "/root/reference/examples/curvedflow_with_preinlet/config.xml"


def build_curved(config_path: str) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg

    stl = os.path.join(cfg.directory, cfg["domain"]["geometry"].read(str))
    flags, _ = voxelize_stl(
        stl,
        cfg["domain"]["refDirN"].read(int),
        cfg["domain"]["refDir"].read(int),
    )
    flags = np.ascontiguousarray(flags[::-1])  # inlet at max-x -> x=0

    # pipe parameters from the inlet cross-section, Re from the preinlet
    # section (the reference preinlet computes its own drive from this Re)
    re = cfg["preInlet"]["parameters"]["Re"].read(float)
    area = float((flags[0] == FLAG_FLUID).sum())
    hc.params.re = re
    hc.params.pipe_radius = math.sqrt(area / math.pi)
    hc.params.u_lbm_max = re * hc.params.nu_lbm / (2 * hc.params.pipe_radius)

    hc.initialize_lattice(flags=flags)
    if os.path.exists(os.path.join(cfg.directory, "RBC_HO.xml")):
        hc.add_cell_type("RBC_HO", "RbcHighOrderModel")
    if os.path.exists(os.path.join(cfg.directory, "PLT.xml")):
        hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=2000)
    ap.add_argument("--spare-slots", type=int, default=64)
    args = ap.parse_args()

    hc = build_curved(args.config)
    hc._build()
    main_cfg = hc._step_cfg

    flags = np.asarray(hc.flags)
    # preinlet: straight extrusion of the inlet slice, periodic in x
    pre_flags = np.broadcast_to(flags[0:1], flags.shape).copy()
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
    main_cfg = dataclasses.replace(
        main_cfg, flags=jnp.asarray(mflags), body_force=None
    )

    # the preinlet takes the loaded cells; main starts with dead spare slots
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
    stepper = make_coupled_stepper(
        pre_cfg, main_cfg, target_mean_velocity=hc.params.u_lbm_max * 0.4
    )
    st = PreInletState(
        pre=pre_state,
        main=main_state,
        body_force=jnp.asarray(poiseuille, hc.dtype),
        crossings=initial_crossings(pre_state, hc.shape[0]),
    )

    report = max(1, args.tmax // 10)
    for it in range(args.tmax):
        st = stepper(st)
        if (it + 1) % report == 0:
            jax.block_until_ready(st)
            n_main = sum(int(cs.alive.sum()) for cs in st.main.cells)
            n_pre = sum(int(cs.alive.sum()) for cs in st.pre.cells)
            print(
                f"iter {it+1}: preinlet cells {n_pre}, main cells {n_main}, "
                f"drive {float(st.body_force):.3e}"
            )
    print("(curvedflow_with_preinlet) done")


if __name__ == "__main__":
    main()
