"""stretchMalaria: optical-tweezers stretching of a stage-V gametocyte.

Port of cases/stretchMalaria (reference: cases/stretchMalaria/
stretchMalaria.cpp): a 50^3 closed box with one RBC_MALARIA cell — the
stage-V gametocyte mesh loaded from vRBC_uniform.stl with the stiff
``RbcMalariaModel`` (inner-link skeleton) — stretched by +-F on the
19 outermost vertices per side (n_forced_lsps = 1+6+6+6, :110) with the
configured ``stretchForce`` (110 pN), logging the largest diameter like the
reference's stretch.log (:138-168).

Usage: python cases/stretch_malaria.py [config.xml] [--force-pn 110]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.utils.stretch import stretch_force_array

REF_CONFIG = "/root/reference/cases/stretchMalaria/config.xml"


def build(config_path: str, force_pn: float | None) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    if force_pn is None:
        force_pn = cfg["parameters"]["stretchForce"].read(float)

    # 50^3 closed box (stretchMalaria.cpp:33-35, zero-velocity walls)
    n = 50
    flags = np.zeros((n, n, n), np.uint8)
    for ax in range(3):
        sl = [slice(None)] * 3
        sl[ax] = 0
        flags[tuple(sl)] = FLAG_WALL
        sl[ax] = -1
        flags[tuple(sl)] = FLAG_WALL
    hc.initialize_lattice(flags=flags)

    hc.add_cell_type("RBC_MALARIA", "RbcMalariaModel")  # MESH_FROM_STL
    hc.load_particles()

    placed = np.asarray(hc.cell_states[0].pos[0])
    n_forced = 1 + 6 + 6 + 6  # stretchMalaria.cpp:110
    hc.set_external_force(
        0, stretch_force_array(placed, n_forced, hc.params.pn_to_lu(force_pn))
    )
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--force-pn", type=float, default=None,
                    help="default: <stretchForce> from the config (110 pN)")
    ap.add_argument("--iterations", type=int, default=10000)
    args = ap.parse_args()

    hc = build(args.config, args.force_pn)
    to_um = hc.params.dx * 1e6
    v0 = float(hc.cell_volumes(0)[0])
    chunk = min(1000, args.iterations)
    while hc.iter < args.iterations:
        hc.iterate(min(chunk, args.iterations - hc.iter))
        bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
        largest = (bbox[1] - bbox[0]) * to_um
        v = float(hc.cell_volumes(0)[0])
        print(
            f"iter {hc.iter}: largest diameter {largest:.3f} um, "
            f"volume ratio {v / v0:.4f}"
        )
    print("(stretchMalaria) done")


if __name__ == "__main__":
    main()
