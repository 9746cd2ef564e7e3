"""stenosis: channel flow past a stenotic (narrowed) section.

Port of cases/stenosis (reference: cases/stenosis/stenosis.cpp): a
rectangular channel (periodic x, bounce-back y/z walls) with the
``StenosisShapeDomain3D`` obstruction (stenosis.cpp:38-74) — a quarter
cylinder capping a rectangular block plus an inclined plane — driven by the
pressure gradient derived from a 1800 1/s wall shear rate
(stenosis.cpp:140-190).

Reference dimensions (refDirN=100): 600 x 348 x 160 lu; ``--scale`` shrinks
every geometric quantity proportionally for smoke runs.  The reference ships
RBC/PLT packings at 20/30/37/40% hematocrit in ``initial_states/`` —
select one with ``--ht`` (cell-free by default, like the case's top-level
.pos files).

Usage: python cases/stenosis.py [config.xml] [--scale 0.25] [--ht 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL

REF_CONFIG = "/root/reference/cases/stenosis/config.xml"


def stenosis_flags(ref_dir_n: int, scale: float = 1.0) -> np.ndarray:
    """Flag matrix with the stenosis obstruction (stenosis.cpp:111-135
    geometry constants, :52-58 predicate, :165-179 walls)."""
    s = scale
    length = int(2 * ref_dir_n * s)
    nx, ny, nz = 3 * length, int(2 * 174 * s), int(2 * 80 * s)

    radius = 2 * 7.5 * s
    width = 2 * 110.0 * s
    ytop = 2 * 158.0 * s
    xbl = 2 * 50.0 * s           # xbottomL
    xbr = xbl + width            # xbottomR (unused by the live predicate)
    xtl = xbl                    # xtopL
    xtr = xtl + 2 * radius       # xtopR
    xcirc = xtl + radius
    ycirc = ytop - radius

    x, y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    solid2d = (
        ((x - xcirc) ** 2 + (y - ycirc) ** 2 <= radius**2)
        | ((x <= xtr) & (x >= xbl) & (y <= ycirc))
        # inclined plane, hard-coded line constants (stenosis.cpp:57)
        | ((x <= (y - 514.16683048 * s) / -1.60677134525)
           & (x >= 127.73502714 * s) & (y <= 308.92584909 * s))
    )
    solid = np.broadcast_to(solid2d[:, :, None], (nx, ny, nz))
    flags = np.where(solid, FLAG_WALL, FLAG_FLUID).astype(np.uint8)
    # bounce-back channel walls on y and z faces (stenosis.cpp:171-179);
    # x stays periodic (:183)
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    return flags


def build(config_path: str, scale: float, ht: int | None) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    ref_n = cfg["domain"]["refDirN"].read(int)
    flags = stenosis_flags(ref_n, scale)
    # lbm_base_parameters (stenosis.cpp:102): Re-independent, dt from config
    hc.initialize_lattice(flags=flags)

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.cell_types[-1].minimum_distance_from_solid_um = 1.0  # stenosis.cpp:209
    hc.add_cell_type("PLT", "PltSimpleModel")
    pos_dir = cfg.directory
    if ht is not None:
        pos_dir = os.path.join(cfg.directory, "initial_states", f"Ht{ht}")
    hc.load_particles(pos_dir)

    # driving: dp/dx from an 1800 1/s target wall shear rate
    # (stenosis.cpp:140-145, :188-190)
    shear_rate = 1800.0
    flow_q = (shear_rate * 130e-6 * 80e-6 * 80e-6) / 6
    dpdz = (flow_q * 12 * 3.0e-3) / (80e-6 * 80e-6 * 80e-6 * 130e-6)
    p = hc.params
    dpdz_lbm = dpdz * (p.dx * p.dx * p.dt * p.dt / p.dm)
    # u_steady ~ F h^2 / nu: at reduced --scale keep the same physical
    # velocity by scaling F with 1/scale^2 (exact reference force at 1.0)
    hc.set_body_force((dpdz_lbm / scale**2, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--scale", type=float, default=0.25,
                    help="geometry scale factor (1.0 = reference 600x348x160)")
    ap.add_argument("--ht", type=int, default=None, choices=(20, 30, 37, 40),
                    help="load the packed initial state at this hematocrit")
    ap.add_argument("--tmax", type=int, default=500)
    args = ap.parse_args()

    hc = build(args.config, args.scale, args.ht)
    names = [ct.name for ct in hc.cell_types]
    print(f"(stenosis) domain {hc.shape}, cells "
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
    print("(stenosis) done")


if __name__ == "__main__":
    main()
