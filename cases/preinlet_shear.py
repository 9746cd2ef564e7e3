"""preinlet_shear: sheared flow chamber fed by a periodic preinlet.

Port of cases/preinlet_shear (reference:
cases/preinlet_shear/preinlet_shear.cpp): an 2N x N x N channel, top (z=0)
wall moving at 0.75 * u_max in x (1800 1/s target shear, :54-60,139-142),
bottom (z=-1) wall bounce-back, pressure outlet over the last x planes
(:77-82 ``addPressureBoundary0P``), preinlet slice near x=0 feeding
developed RBC+PLT flow (:95-101), y periodic (:124).

Usage: python cases/preinlet_shear.py [config.xml] [--tmax 2000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.cells.state import make_cell_state
from hemocell_tpu.config.defaults import (
    FLAG_PRESSURE,
    FLAG_VELOCITY,
    FLAG_WALL,
)
from hemocell_tpu.dynamics import StepConfig, initial_sim_state
from hemocell_tpu.utils.preinlet import (
    PreInletState,
    initial_crossings,
    make_coupled_stepper,
)

REF_CONFIG = "/root/reference/cases/preinlet_shear/config.xml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=2000)
    ap.add_argument("--spare-slots", type=int, default=64)
    args = ap.parse_args()

    hc = HemoCell(args.config)
    n = hc.cfg["domain"]["refDirN"].read(int)
    nx, ny, nz = 2 * n, n, n

    # 1800 1/s shear across the channel height (preinlet_shear.cpp:54-60)
    shear_rate = 1800.0
    velocity_max = (shear_rate * (nz / 1e6)) / 4
    u_max_lbm = velocity_max * hc.params.dt / hc.params.dx

    # main domain: moving top wall, bounce-back bottom, velocity inlet
    # plane (preinlet feed), pressure outlet planes at far x
    flags = np.zeros((nx, ny, nz), np.uint8)
    flags[:, :, 0] = FLAG_VELOCITY   # topChannel (z0): shear drive
    flags[:, :, -1] = FLAG_WALL      # bottomChannel
    flags[0, :, 1:-1] = FLAG_VELOCITY  # preinlet interface
    flags[-1, :, 1:-1] = FLAG_PRESSURE  # outlet (bb.x1-2..x1 collapses to 1)
    hc.initialize_lattice(flags=flags)
    hc.set_outlet_density(1.0)

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc._build()
    main_cfg = hc._step_cfg

    bc = np.zeros((3, nx, ny, nz))
    bc[0, :, :, 0] = 0.75 * u_max_lbm  # setBoundaryVelocity(topChannel)
    main_cells = []
    for ct in hc.cell_types:
        far = ct.mesh.vertices[None] + np.array([-1000.0, 10.0, 10.0])
        far = np.repeat(far, args.spare_slots, axis=0)
        cs = make_cell_state(far, dtype=hc.dtype)
        main_cells.append(
            cs._replace(alive=jnp.zeros(args.spare_slots, bool))
        )
    main_state = initial_sim_state(main_cfg, main_cells)
    main_state = main_state._replace(bc_state=jnp.asarray(bc, hc.dtype))

    # preinlet: periodic copy of the channel section with the same walls,
    # cells loaded from the case .pos files, adaptive body-force drive
    pre_flags = np.zeros((nx, ny, nz), np.uint8)
    pre_flags[:, :, 0] = FLAG_WALL
    pre_flags[:, :, -1] = FLAG_WALL
    pre_hc = HemoCell(args.config)
    pre_hc.initialize_lattice(flags=pre_flags)
    pre_hc.add_cell_type("RBC", "RbcHighOrderModel")
    pre_hc.add_cell_type("PLT", "PltSimpleModel")
    pre_hc.load_particles()
    pre_hc._build()
    pre_cfg = pre_hc._step_cfg
    pre_state = pre_hc.state

    stepper = make_coupled_stepper(
        pre_cfg, main_cfg, target_mean_velocity=0.5 * u_max_lbm
    )
    r = nz / 2
    poiseuille = 8 * hc.params.nu_lbm * (u_max_lbm * 0.5) / r / r
    st = PreInletState(
        pre=pre_state,
        main=main_state,
        body_force=jnp.asarray(poiseuille, hc.dtype),
        crossings=initial_crossings(pre_state, nx),
    )

    report = max(1, args.tmax // 10)
    for it in range(args.tmax):
        st = stepper(st)
        if (it + 1) % report == 0:
            jax.block_until_ready(st)
            n_main = sum(int(cs.alive.sum()) for cs in st.main.cells)
            n_pre = sum(int(cs.alive.sum()) for cs in st.pre.cells)
            zero = jnp.zeros((3, nx, ny, nz), hc.dtype)
            from hemocell_tpu.fluid import lbm

            _, u = lbm.macroscopic(st.main.f, zero)
            print(
                f"iter {it + 1}: preinlet cells {n_pre}, main cells "
                f"{n_main}, drive {float(st.body_force):.3e}, "
                f"u_max {float(jnp.abs(u[0]).max()):.4f} lu"
            )
    print("(preinlet-shear) done")


if __name__ == "__main__":
    main()
