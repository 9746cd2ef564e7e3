"""solidify_example: platelet binding and solidification in a shear chamber.

Port of cases/solidify_example (reference: cases/solidify_example/
solidify_example.cpp): a refDirN^3 chamber, bottom bounce-back wall seeded
with binding sites (populateBindingSites, :120-122), top moving-velocity
wall from the configured shear rate (:101-109), periodic x/y, three
platelets with solidify mechanics (enableSolidifyMechanics, :85) — a
platelet that touches a binding site under sufficient shear is tagged,
its interior lattice nodes harden to bounce-back, and the cell is removed
(pltSimpleModel.cpp:211-248).

Usage: python cases/solidify_example.py [config.xml] [--tmax 2000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_VELOCITY, FLAG_WALL

REF_CONFIG = "/root/reference/cases/solidify_example/config.xml"


def build(config_path: str) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    n = cfg["domain"]["refDirN"].read(int)

    # geometry (solidify_example.cpp:101-113): top z = moving wall,
    # bottom z = bounce-back, x/y periodic
    flags = np.zeros((n, n, n), np.uint8)
    flags[:, :, -1] = FLAG_VELOCITY
    flags[:, :, 0] = FLAG_WALL
    hc.initialize_lattice(flags=flags)

    shear_rate = cfg["parameters"]["shearRate"].read(float)
    v_lbm = shear_rate * (n * hc.params.dx) * (hc.params.dt / hc.params.dx)
    bc = np.zeros((3,) + hc.shape, np.float32)
    bc[0, :, :, -1] = v_lbm
    hc.bc_velocity = bc

    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()
    hc.enable_solidify(0, every=10)

    # binding sites only on the bottom wall (populateBindingSites with the
    # bottomChannel box, solidify_example.cpp:120-122)
    binding = np.zeros(hc.shape, bool)
    binding[:, :, :2] = True
    hc.populate_binding_sites(binding)
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=None)
    args = ap.parse_args()

    hc = build(args.config)
    tmax = args.tmax or hc.cfg["sim"]["tmax"].read(int)
    tmeas = hc.cfg["sim"].get("tmeas", int, 200)
    print(f"(solidify) domain {hc.shape}, PLT {hc.alive_count(0)}")
    while hc.iter < tmax:
        hc.iterate(min(tmeas, tmax - hc.iter))
        hc.block()
        solidified = int(np.asarray(
            hc.state.flags_state != np.asarray(hc.flags)
        ).sum()) if hc.state.flags_state is not None else 0
        print(
            f"iter {hc.iter}: PLT alive {hc.alive_count(0)} | "
            f"solidified nodes {solidified}"
        )
    print("(solidify) done")


if __name__ == "__main__":
    main()
