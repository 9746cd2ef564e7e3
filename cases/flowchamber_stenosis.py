"""flowchamber_stenosis: rectangular flow chamber with a rounded wedge
stenosis, RBC + WBC + PLT suspension.

Port of cases/flowchamber_stenosis (reference:
cases/flowchamber_stenosis/flowchamber_stenosis.cpp): a channel periodic in
x/z with bounce-back front/back (y) walls and the ``StenosisShapeDomain3D``
obstruction (:43-75) — two rounding cylinders capping a rectangular block
plus inclined planes at ``angleStenosis`` on both sides — driven by a fixed
4.5e-6 lu body force (:215).  Geometry parameters (widthStenosis,
angleStenosis, percentageStenosis, widthChannel, heightChannel) come from
the case config's ``<parameters>`` block (:112-128).

Usage: python cases/flowchamber_stenosis.py [config.xml] [--scale 0.25]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL

REF_CONFIG = "/root/reference/cases/flowchamber_stenosis/config.xml"


def flowchamber_flags(cfg, scale: float = 1.0):
    """Flag matrix with the wedge stenosis (flowchamber_stenosis.cpp:112-145
    geometry, :43-75 predicate, :190-199 walls)."""
    s = scale
    par = cfg["parameters"]
    width_st = int(2 * par["widthStenosis"].read(int) * s)
    radius_cyl = max(int(2 * 5 * s), 1)
    c_angle_deg = par["angleStenosis"].read(int)
    pct = par["percentageStenosis"].read(float)
    angle = math.radians(90 - c_angle_deg)
    a = math.tan(math.radians(c_angle_deg))
    h = math.sin(angle) * radius_cyl
    w = math.cos(angle) * radius_cyl
    width_channel = int(2 * par["widthChannel"].read(int) * s)
    height_channel = int(2 * par["heightChannel"].read(int) * s)
    width_const = int((height_channel * pct) / a)
    ref_n = int(cfg["domain"]["refDirN"].read(int) * s)
    nx = 4 * ref_n + width_st + 2 * width_const
    ny, nz = height_channel, width_channel

    ytop = int(height_channel * pct)
    xtopL = nx // 2 - width_st // 2
    xtopR = nx // 2 + width_st // 2
    xcircL = xtopL + radius_cyl
    xcircR = xtopR - radius_cyl
    ycirc = ytop - radius_cyl

    xL, xR = xcircL - w, xcircR + w
    y = ycirc + h
    bL = y - a * xL
    bR = y + a * xR

    x, yy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    solid2d = (
        ((x - xcircL) ** 2 + (yy - ycirc) ** 2 <= radius_cyl**2)
        | ((x - xcircR) ** 2 + (yy - ycirc) ** 2 <= radius_cyl**2)
        | ((x <= xcircR) & (x >= xcircL) & (yy <= ytop))
        | ((x >= (yy - bL) / a) & (x <= xcircL) & (yy <= y))
        | ((x <= (yy - bR) / -a) & (x >= xcircR) & (yy <= y))
    )
    solid = np.broadcast_to(solid2d[:, :, None], (nx, ny, nz))
    flags = np.where(solid, FLAG_WALL, FLAG_FLUID).astype(np.uint8)
    # bounce-back front/back channel walls on y faces; x and z periodic
    # (flowchamber_stenosis.cpp:190-204)
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    return flags


def build(config_path: str, scale: float) -> HemoCell:
    hc = HemoCell(config_path)
    flags = flowchamber_flags(hc.cfg, scale)
    hc.initialize_lattice(flags=flags)

    # RBC + WBC_HO + PLT (flowchamber_stenosis.cpp:226-236)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.cell_types[-1].minimum_distance_from_solid_um = 1.0
    hc.add_cell_type("WBC_HO", "WbcHighOrderModel")
    hc.cell_types[-1].minimum_distance_from_solid_um = 1.0
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()

    # fixed driving force (flowchamber_stenosis.cpp:214-218)
    hc.set_body_force((4.5e-6, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--scale", type=float, default=0.25,
                    help="geometry scale (1.0 = reference ~860x280x100)")
    ap.add_argument("--tmax", type=int, default=500)
    args = ap.parse_args()

    hc = build(args.config, args.scale)
    names = [ct.name for ct in hc.cell_types]
    print(f"(flowchamber) domain {hc.shape}, cells "
          f"{ {nm: hc.alive_count(i) for i, nm in enumerate(names)} }")
    # cell-free warmup (flowchamber_stenosis.cpp:268-273)
    warmup = hc.cfg["parameters"]["warmup"].read(int)
    hc.iterate(warmup)
    fluid = np.asarray(hc.flags) == FLAG_FLUID
    tmeas = min(250, args.tmax)
    while hc.iter < warmup + args.tmax:
        hc.iterate(min(tmeas, warmup + args.tmax - hc.iter))
        hc.block()
        u = np.asarray(hc.fluid_velocity())
        to_ms = hc.params.dx / hc.params.dt
        print(
            f"iter {hc.iter}: "
            + " ".join(f"{nm} {hc.alive_count(i)}" for i, nm in enumerate(names))
            + f" | u max {np.abs(u[0]).max() * to_ms:.4g}"
            + f" mean {np.abs(u[0])[fluid].mean() * to_ms:.4g} m/s"
        )
    print("(flowchamber) done")


if __name__ == "__main__":
    main()
