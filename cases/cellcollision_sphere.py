"""cellCollision_sphere: two rigid-cored ellipsoids colliding in shear.

Port of cases/cellCollision_sphere (reference: cases/cellCollision_sphere/
cellCollision_sphere.cpp): a 50x50x30 lu Couette box at 1000 1/s shear with
two ``WbcHighOrderModel`` ellipsoids ("ELL"/"ELL2" material XMLs with
rigid inner-edge cores) placed across the shear plane — the sphere-like
stiff-particle variant of the deformable cellCollision case.

Usage: python cases/cellcollision_sphere.py [config.xml] [--tmax 4000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_VELOCITY

REF_CONFIG = "/root/reference/cases/cellCollision_sphere/config.xml"


def build(config_path: str) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    # nx = 25 µm / dx, nz = 0.6 nx (cellCollision_sphere.cpp:47-49)
    nx = int(round(25.0 * (1e-6 / hc.params.dx)))
    ny, nz = nx, int(nx * 0.6)
    hc.params.shear_flow(cfg, ny)

    # square-Couette: z walls move in +-x (iniLatticeSquareCouette,
    # helper/hemocellInit.hh:57-92)
    flags = np.zeros((nx, ny, nz), np.uint8)
    flags[:, :, 0] = FLAG_VELOCITY
    flags[:, :, -1] = FLAG_VELOCITY
    hc.initialize_lattice(flags=flags)
    v_half = (nz - 1) * hc.params.shearrate_lbm * 0.5
    bc = np.zeros((3, nx, ny, nz), np.float32)
    bc[0, :, :, -1] = v_half
    bc[0, :, :, 0] = -v_half
    hc.bc_velocity = bc

    hc.add_cell_type("ELL", "WbcHighOrderModel")
    hc.add_cell_type("ELL2", "WbcHighOrderModel")
    hc.load_particles()
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=4000)
    args = ap.parse_args()

    hc = build(args.config)
    to_um = hc.params.dx * 1e6
    print(f"(collision-sphere) domain {hc.shape}, "
          f"ELL {hc.alive_count(0)} ELL2 {hc.alive_count(1)}")
    tmeas = min(500, args.tmax)
    while hc.iter < args.tmax:
        hc.iterate(min(tmeas, args.tmax - hc.iter))
        hc.block()
        c0 = np.asarray(hc.state.cells[0].pos.mean(axis=1))
        c1 = np.asarray(hc.state.cells[1].pos.mean(axis=1))
        print(
            f"iter {hc.iter}: ELL ({c0[0, 0] * to_um:.1f},"
            f"{c0[0, 2] * to_um:.1f}) ELL2 ({c1[0, 0] * to_um:.1f},"
            f"{c1[0, 2] * to_um:.1f}) um"
        )
    print("(collision-sphere) done")


if __name__ == "__main__":
    main()
