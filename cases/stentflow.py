"""stentflow: channel flow past two crossing stent struts.

Port of cases/stentflow (reference: cases/stentflow/stentflow.cpp): a
2n x n x n channel with two radius-20 cylindrical struts at the centre —
one along z (axis through (n/2, n/2) in x-y) and one along y (through
(n/2, n/2) in x-z) — as bounce-back obstacles (predicate :52-55,
dimensions :90-100), with channel walls and the standard Poiseuille body
force after warmup (:168-172).

Usage: python cases/stentflow.py [config.xml] [--scale 0.5] [--tmax 500]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL

REF_CONFIG = "/root/reference/cases/stentflow/config.xml"


def stent_flags(ref_dir_n: int, scale: float = 1.0) -> np.ndarray:
    n = int(ref_dir_n * scale)
    nx, ny, nz = 2 * n, n, n
    r = 20.0 * scale  # strut radius (stentflow.cpp:93)
    cx = cy = cz = n / 2.0

    x, y, z = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    vertical = (x - cx) ** 2 + (y - cy) ** 2 <= r**2    # strut along z
    horizontal = (x - cx) ** 2 + (z - cz) ** 2 <= r**2  # strut along y
    flags = np.where(vertical | horizontal, FLAG_WALL, FLAG_FLUID).astype(
        np.uint8
    )
    # channel walls on y and z faces, periodic x
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    return flags


def build(config_path: str, scale: float) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    ref_n = cfg["domain"]["refDirN"].read(int)
    hc.params.pipe_flow_radius(cfg, ref_n / 2.0)
    hc.initialize_lattice(flags=stent_flags(ref_n, scale))

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.cell_types[-1].minimum_distance_from_solid_um = 0.1  # stentflow.cpp:143
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()

    r = ref_n * scale / 2.0
    force = 8 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / r / r
    hc.set_body_force((force, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--tmax", type=int, default=500)
    args = ap.parse_args()

    hc = build(args.config, args.scale)
    names = [ct.name for ct in hc.cell_types]
    print(f"(stentflow) domain {hc.shape}, cells "
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
    print("(stentflow) done")


if __name__ == "__main__":
    main()
