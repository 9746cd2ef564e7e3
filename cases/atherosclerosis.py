"""atherosclerosis: channel flow past a plaque-like half-cylinder bulge.

Port of cases/atherosclerosis (reference: cases/atherosclerosis/
atherosclerosis.cpp): a flat channel (periodic x, bounce-back y/z walls)
with a cylindrical "plaque" of diameter 0.8 * channel width protruding from
the back wall (atherosclerosis.cpp:38-54 predicate, :87-97 dimensions),
driven by the pressure gradient of a 0.5 µl/h volumetric flow
(atherosclerosis.cpp:102-103, :145-155).

Reference dimensions (refDirN=100): 1200 x 200 x 34 lu.

Usage: python cases/atherosclerosis.py [config.xml] [--scale 0.5] [--tmax 500]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL

REF_CONFIG = "/root/reference/cases/atherosclerosis/config.xml"


def plaque_flags(ref_dir_n: int, scale: float = 1.0) -> np.ndarray:
    """Flag matrix: plaque cylinder along z at the back wall
    (atherosclerosis.cpp:45-47, :87-97) + channel walls (:130-139)."""
    length = int(2 * ref_dir_n * scale)   # lengthChannel
    height = int(2 * 17 * scale)          # heightChannel (52 µm at dx=0.5)
    nx, ny, nz = 6 * length, length, height

    cx = 3 * length            # sphere_x
    cy = length                # sphere_y (on the back wall)
    radius = 0.8 * length      # sphere_diameter / 2 = 0.8*2*length/2

    x, y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    solid2d = (x - cx) ** 2 + (y - cy) ** 2 <= radius**2
    solid = np.broadcast_to(solid2d[:, :, None], (nx, ny, nz))
    flags = np.where(solid, FLAG_WALL, FLAG_FLUID).astype(np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    return flags


def build(config_path: str, scale: float) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    ref_n = cfg["domain"]["refDirN"].read(int)
    hc.initialize_lattice(flags=plaque_flags(ref_n, scale))

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()

    # 0.5 µl/h flow through a 34 µm x 100 µm channel (atherosclerosis.cpp:
    # 102-103, 145-146)
    flow_q = 0.5e-6 / 3600
    dpdz = (flow_q * 12 * 3.0e-3) / (17e-6 * 17e-6 * 17e-6 * 300e-6)
    p = hc.params
    dpdz_lbm = dpdz * (p.dx * p.dx * p.dt * p.dt / p.dm)
    # keep u_steady ~ F h^2 invariant under --scale (exact force at 1.0)
    hc.set_body_force((dpdz_lbm / scale**2, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--tmax", type=int, default=500)
    args = ap.parse_args()

    hc = build(args.config, args.scale)
    names = [ct.name for ct in hc.cell_types]
    print(f"(atherosclerosis) domain {hc.shape}, cells "
          f"{ {nm: hc.alive_count(i) for i, nm in enumerate(names)} }")
    fluid = np.asarray(hc.flags) == FLAG_FLUID
    tmeas = min(250, args.tmax)
    while hc.iter < args.tmax:
        hc.iterate(min(tmeas, args.tmax - hc.iter))
        hc.block()
        u = np.asarray(hc.fluid_velocity())
        to_ms = hc.params.dx / hc.params.dt
        print(
            f"iter {hc.iter}: "
            + " ".join(f"{nm} {hc.alive_count(i)}" for i, nm in enumerate(names))
            + f" | u max {np.abs(u[0]).max() * to_ms:.4g}"
            + f" mean {np.abs(u[0])[fluid].mean() * to_ms:.4g} m/s"
        )
    print("(atherosclerosis) done")


if __name__ == "__main__":
    main()
