"""vasoconstriction_pipe: pipe flow through a cosine-profile constriction.

Port of cases/vasoconstriction_pipe (reference: cases/vasoconstriction_pipe/
vasoconstriction_pipe.cpp): a periodic circular pipe whose radius narrows
over a central segment following a cosine profile down to
``(1 - perc_constr)`` of the full radius (predicate :38-75, dimensions
:95-115), driven by the standard Poiseuille body force of the full radius
(:148-152).

Reference dimensions (refDirN=100): 600 x 102 x 102 lu; constriction 56%
over 400 lu.  Packed initial states at 30/37% Ht ship in
``initial_states/`` (D50L100 for half-size runs).

Usage: python cases/vasoconstriction_pipe.py [config.xml] [--scale 0.5]
       [--pos-dir .../initial_states/D50L100_Ht30]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL

REF_CONFIG = "/root/reference/cases/vasoconstriction_pipe/config.xml"


def constricted_pipe_flags(ref_dir_n: int, scale: float = 1.0,
                           perc_constr: float = 0.56,
                           l_constr_lu: float = 400.0) -> np.ndarray:
    """Flag matrix for the cosine-constricted cylinder
    (vasoconstriction_pipe.cpp:53-59 predicate, :95-115 dimensions)."""
    cfac = 2
    n = int(ref_dir_n * scale)
    nx = 6 * n
    ny = n + cfac
    nz = ny + cfac

    r_large = (ny - cfac) / 2.0
    cy = ny / 2.0
    cz = ny / 2.0  # Lxcirc = ny/2 tests iZ (vasoconstriction_pipe.cpp:54)
    l_constr = l_constr_lu * scale
    xbegin = (nx - l_constr) / 2.0
    xend = xbegin + l_constr
    r_small = r_large * (1.0 - perc_constr)

    x, y, z = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    rr = (z - cz) ** 2 + (y - cy) ** 2
    # straight sections: wall outside the full radius
    straight = (rr >= r_large**2) & ((x < xbegin) | (x >= xend))
    # constricted section: cosine radius profile (phase as in the reference,
    # which evaluates cos(2*pi*x/L - L*xbegin); the offset only shifts the
    # ripple's phase)
    amp = (r_large - r_small) / 2.0
    r_x = amp * np.cos((2 * np.pi / l_constr) * x - l_constr * xbegin) \
        + amp + r_small
    constricted = (rr >= r_x**2) & (x >= xbegin) & (x < xend)
    return np.where(straight | constricted, FLAG_WALL, FLAG_FLUID).astype(
        np.uint8
    )


def build(config_path: str, scale: float, pos_dir: str | None) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    ref_n = cfg["domain"]["refDirN"].read(int)
    hc.params.pipe_flow_radius(cfg, ref_n / 2.0)
    hc.initialize_lattice(flags=constricted_pipe_flags(ref_n, scale))

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.cell_types[-1].minimum_distance_from_solid_um = 0.1  # :165
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles(pos_dir)

    r_large = (hc.shape[1] - 2) / 2.0
    force = 8 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / r_large**2
    hc.set_body_force((force, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--pos-dir", default=None,
                    help="e.g. <case>/initial_states/D50L100_Ht30")
    ap.add_argument("--tmax", type=int, default=500)
    args = ap.parse_args()

    hc = build(args.config, args.scale, args.pos_dir)
    names = [ct.name for ct in hc.cell_types]
    print(f"(vasoconstriction) domain {hc.shape}, cells "
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
    print("(vasoconstriction) done")


if __name__ == "__main__":
    main()
