"""microvessel_bended: pipe flow through a sinusoidally bent microvessel.

Port of cases/microvessel_bended (reference: cases/microvessel_bended/
microvessel_bended.cpp): a circular pipe whose centreline undulates in y
following ``amplitude * cos(2*pi*x / L_constr)`` (predicate :53-60,
dimensions :95-107), fully periodic, driven by the Poiseuille body force of
the straight radius.

Reference dimensions (refDirN=100): 600 x 204 x 102 lu, amplitude 50 lu,
wavelength 300 lu.

Usage: python cases/microvessel_bended.py [config.xml] [--scale 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL

REF_CONFIG = "/root/reference/cases/microvessel_bended/config.xml"


def bent_vessel_flags(ref_dir_n: int, scale: float = 1.0) -> np.ndarray:
    """Flag matrix for the bent cylinder (microvessel_bended.cpp:53-60:
    wall where (z-cz)^2 + (y - (A cos(2 pi x / L) + A + r))^2 >= r^2)."""
    cfac = 2
    n = int(ref_dir_n * scale)
    amplitude = n // 2
    nx = 6 * n
    nz = n + cfac
    ny = 2 * amplitude + nz + cfac

    radius = (nz - cfac) / 2.0
    cz = nz / 2.0
    l_constr = 3 * n

    x, y, z = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    yc = amplitude * np.cos(2 * np.pi * x / l_constr) + amplitude + radius
    solid = (z - cz) ** 2 + (y - yc) ** 2 >= radius**2
    return np.where(solid, FLAG_WALL, FLAG_FLUID).astype(np.uint8)


def build(config_path: str, scale: float) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    ref_n = cfg["domain"]["refDirN"].read(int)
    hc.params.pipe_flow_radius(cfg, ref_n / 2.0)
    hc.initialize_lattice(flags=bent_vessel_flags(ref_n, scale))

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.cell_types[-1].minimum_distance_from_solid_um = 0.1
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()

    radius = (hc.shape[2] - 2) / 2.0
    force = 8 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / radius**2
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
    print(f"(microvessel) domain {hc.shape}, cells "
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
    print("(microvessel) done")


if __name__ == "__main__":
    main()
