"""cellCollision: two RBCs colliding in shear flow.

Port of examples/cellCollision_interior_viscosity (reference:
examples/cellCollision_interior_viscosity/*.cpp): two RBCs offset across the
shear plane of a Couette box approach, collide, and slide past each other;
optionally with interior viscosity raising the cytoplasmic viscosity ratio.

Usage: python examples/cellcollision.py [--shearrate 200] [--interior-viscosity]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_VELOCITY
from hemocell_tpu.cells.interior import interior_tau

RBC_XML = """<?xml version="1.0" ?>
<hemocell><MaterialModel>
  <name>RBC</name>
  <eta_m> 0.0 </eta_m>
  <kBend> 80.0 </kBend> <kVolume> 20.0 </kVolume>
  <kArea> 5.0 </kArea> <kLink> 15.0 </kLink>
  <minNumTriangles> 600 </minNumTriangles>
  <radius> 3.91e-6 </radius> <Volume> 90 </Volume>
  <viscosityRatio>5.0</viscosityRatio>
</MaterialModel></hemocell>
"""

CONFIG_XML = """<?xml version="1.0" ?>
<hemocell>
  <ibm><stepMaterialEvery>1</stepMaterialEvery><stepParticleEvery>1</stepParticleEvery></ibm>
  <domain>
    <shearrate> {shearrate} </shearrate>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
    <kRep> 2e-22 </kRep><RepCutoff> 0.7 </RepCutoff>
  </domain>
  <sim><tmax>4000</tmax></sim>
</hemocell>
"""


def build(workdir: str, shearrate: float, interior_viscosity: bool) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML.format(shearrate=shearrate))
    with open(os.path.join(workdir, "RBC.xml"), "w") as f:
        f.write(RBC_XML)
    with open(os.path.join(workdir, "RBC.pos"), "w") as f:
        # two cells, offset along x and across z (the shear gradient axis)
        f.write("2\n10.0 10.0 7.5 90 0 0\n22.0 10.0 12.5 90 0 0\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    nz = 40
    nx, ny = 64, 40
    hc.params.shear_flow(hc.cfg, ny)
    flags = np.zeros((nx, ny, nz), np.uint8)
    flags[:, :, 0] = FLAG_VELOCITY
    flags[:, :, -1] = FLAG_VELOCITY
    v_half = (nz - 1) * hc.params.shearrate_lbm * 0.5
    bc = np.zeros((3, nx, ny, nz), np.float32)
    bc[0, :, :, -1] = v_half
    bc[0, :, :, 0] = -v_half
    hc.initialize_lattice(flags=flags)
    hc.bc_velocity = np.asarray(bc)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.enable_repulsion()
    if interior_viscosity:
        ct = hc.cell_types[0]
        ct_cfg = None  # wired through TypeConfig below
        tau_int = interior_tau(5.0, hc.params.tau)
        # flow through the facade's builder
        hc.cell_types[0].omega_interior = 1.0 / tau_int
        hc.interior_every = 10
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shearrate", type=float, default=200.0)
    ap.add_argument("--iterations", type=int, default=4000)
    ap.add_argument("--interior-viscosity", action="store_true")
    ap.add_argument("--workdir", default="output_collision")
    args = ap.parse_args()

    hc = build(args.workdir, args.shearrate, args.interior_viscosity)
    to_um = hc.params.dx * 1e6
    for _ in range(max(1, args.iterations // 500)):
        hc.iterate(500)
        c = np.asarray(hc.state.cells[0].pos.mean(axis=1))
        print(
            f"iter {hc.iter}: cell centres "
            f"({c[0,0]*to_um:.1f},{c[0,2]*to_um:.1f}) "
            f"({c[1,0]*to_um:.1f},{c[1,2]*to_um:.1f}) um | "
            f"alive {hc.alive_count(0)}"
        )


if __name__ == "__main__":
    main()
