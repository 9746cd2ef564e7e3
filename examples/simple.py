"""simple: the minimal square-duct flow case.

Port of examples/simple (reference: examples/simple/simple.cpp:15-97): a
50x50x50 box with bounce-back walls on all four y/z faces, periodic in x,
driven by a Poiseuille body force computed from pipe parameters with a
predefined radius (lbm_pipe_parameters(cfg, 50)).  Like the reference, no
particles are loaded by default (simple.cpp:80 is commented out) — pass
--cells to add the RBC_HO type from the case directory.

The full reference fluid-output list (simple.cpp:71-74) is written:
Velocity, Density, Force, ShearRate, StrainRate, ShearStress, Boundary,
Omega, CellDensity.

Usage: python examples/simple.py [config.xml] [--tmax N] [--cells]
Defaults to the reference case config.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL

REF_CONFIG = "/root/reference/examples/simple/config.xml"

FLUID_OUTPUTS = (
    "Velocity",
    "Density",
    "Force",
    "ShearRate",
    "StrainRate",
    "ShearStress",
    "Boundary",
    "Omega",
    "CellDensity",
)


def build_simple(config_path: str, with_cells: bool = False) -> HemoCell:
    hc = HemoCell(config_path)
    # predefined pipe radius of 50 LU (simple.cpp:24)
    hc.params.pipe_flow_radius(hc.cfg, 50)

    shape = (50, 50, 50)
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL   # frontChannel  (simple.cpp:38)
    flags[:, -1, :] = FLAG_WALL  # backChannel   (simple.cpp:37)
    flags[:, :, 0] = FLAG_WALL   # bottomChannel (simple.cpp:36)
    flags[:, :, -1] = FLAG_WALL  # topChannel    (simple.cpp:35)
    hc.initialize_lattice(flags=flags)

    if with_cells and os.path.exists(
        os.path.join(hc.cfg.directory, "RBC_HO.xml")
    ):
        hc.add_cell_type("RBC_HO", "RbcHighOrderModel")
        hc.setMaterialTimeScaleSeparation("RBC_HO", 20)
        hc.setParticleVelocityUpdateTimeScaleSeparation(5)
        hc.load_particles()

    r = hc.params.pipe_radius
    force = 8 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / r / r
    hc.set_body_force((force, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=None)
    ap.add_argument("--cells", action="store_true")
    ap.add_argument("--out", default="output_simple")
    args = ap.parse_args()

    hc = build_simple(args.config, args.cells)
    cfg = hc.cfg
    tmax = args.tmax or cfg["sim"]["tmax"].read(int)
    tmeas = cfg["sim"].get("tmeas", int, 500)
    hc.set_output_dir(args.out)

    to_mps = hc.params.dx / hc.params.dt
    while hc.iter < tmax:
        hc.iterate(min(tmeas, tmax - hc.iter))
        hc.block()
        u = np.asarray(hc.fluid_velocity())
        fluid = np.asarray(hc.flags) == FLAG_FLUID
        print(
            f"iter {hc.iter}: u max {np.abs(u[0]).max() * to_mps:.4g} m/s "
            f"mean {np.abs(u[0])[fluid].mean() * to_mps:.4g} m/s"
        )
        hc.write_output(fluid_fields=FLUID_OUTPUTS)
    print("(simple) done")


if __name__ == "__main__":
    main()
