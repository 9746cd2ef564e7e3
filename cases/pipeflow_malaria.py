"""pipeflowMalaria: mixed healthy/malaria-infected blood in a tube.

Port of cases/pipeflowMalaria (reference: cases/pipeflowMalaria/
pipeflowMalaria.cpp:39-200): the pipeflow pipeline with three cell types —
healthy RBCs (RbcHighOrderModel), stage-V gametocytes loaded from
vRBC_uniform.stl with the stiffer RbcMalariaModel (linear volume + inner
link skeleton, mechanics/rbcMalariaModel.cpp), and platelets.

Usage: python cases/pipeflow_malaria.py [config.xml] [--tmax N]
Defaults to the reference case config.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_FLUID
from hemocell_tpu.utils.voxelize import voxelize_stl

REF_CONFIG = "/root/reference/cases/pipeflowMalaria/config.xml"


def build_malaria(config_path: str) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg

    stl = os.path.join(cfg.directory, cfg["domain"]["geometry"].read(str))
    flags, _ = voxelize_stl(
        stl,
        cfg["domain"]["refDirN"].read(int),
        cfg["domain"]["refDir"].read(int),
    )
    hc.params.pipe_flow(cfg, float((flags[0] == FLAG_FLUID).sum()))
    hc.initialize_lattice(flags=flags)

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    ct = hc.add_cell_type("RBC_MALARIA", "RbcMalariaModel")  # MESH_FROM_STL
    ct.minimum_distance_from_solid_um = 0.5  # pipeflowMalaria.cpp:92
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()

    r = hc.params.pipe_radius
    force = 8 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / r / r
    hc.set_body_force((force, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=2000)
    ap.add_argument("--out", default="output_malaria")
    args = ap.parse_args()

    hc = build_malaria(args.config)
    hc.set_output_dir(args.out)
    tmeas = hc.cfg["sim"].get("tmeas", int, 500)
    names = [ct.name for ct in hc.cell_types]
    counts = {nm: hc.alive_count(i) for i, nm in enumerate(names)}
    print(f"(malaria) cells loaded: {counts}")
    while hc.iter < args.tmax:
        hc.iterate(min(tmeas, args.tmax - hc.iter))
        hc.block()
        u = np.asarray(hc.fluid_velocity())
        fluid = np.asarray(hc.flags) == FLAG_FLUID
        print(
            f"iter {hc.iter}: "
            + " ".join(
                f"{nm} {hc.alive_count(i)}" for i, nm in enumerate(names)
            )
            + f" | u mean {np.abs(u[0])[fluid].mean() * hc.params.dx / hc.params.dt:.4g} m/s"
            + f" | malaria force {hc.mean_force_pn(1):.3f} pN"
        )
        hc.write_output()
    print("(malaria) done")


if __name__ == "__main__":
    main()
