"""microcontraction: RBCs squeezing through a micro-scale contraction.

Port of examples/microcontraction (reference: examples/microcontraction): a
channel with a narrow slot in a transverse wall, body-force driven — cells
deform strongly passing the contraction.

Usage: python examples/microcontraction.py [--gap-um 4] [--iterations 4000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.utils import geometry as geom

RBC_XML = """<?xml version="1.0" ?>
<hemocell><MaterialModel>
  <name>RBC</name><eta_m>0.0</eta_m>
  <kBend>80.0</kBend><kVolume>20.0</kVolume><kArea>5.0</kArea><kLink>15.0</kLink>
  <minNumTriangles>600</minNumTriangles><radius>3.91e-6</radius><Volume>90</Volume>
</MaterialModel></hemocell>
"""

CONFIG_XML = """<?xml version="1.0" ?>
<hemocell>
  <ibm><stepMaterialEvery>1</stepMaterialEvery><stepParticleEvery>1</stepParticleEvery></ibm>
  <domain>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
  </domain>
  <sim><tmax>4000</tmax></sim>
</hemocell>
"""


def contraction_flags(shape, wall_x, wall_thickness, gap_lu):
    """Channel walls on y/z faces plus a transverse wall with a centred
    rectangular slot of height gap_lu."""
    X, Y, Z = shape
    fluid = np.ones(shape, bool)
    fluid[:, 0, :] = False
    fluid[:, -1, :] = False
    fluid[:, :, 0] = False
    fluid[:, :, -1] = False
    barrier = geom.box(shape, (wall_x, 0, 0), (wall_x + wall_thickness, Y, Z))
    zc = Z // 2
    slot = geom.box(
        shape,
        (wall_x, 1, zc - gap_lu // 2),
        (wall_x + wall_thickness, Y - 2, zc + gap_lu // 2),
    )
    fluid = fluid & ~(barrier & ~slot)
    return geom.flags_from_fluid_mask(fluid)


def build(workdir: str, gap_um: float) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML)
    with open(os.path.join(workdir, "RBC.xml"), "w") as f:
        f.write(RBC_XML)
    with open(os.path.join(workdir, "RBC.pos"), "w") as f:
        f.write("2\n7 8 8 90 0 0\n12 8 8.5 30 30 0\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    gap_lu = int(round(gap_um * 1e-6 / hc.params.dx))
    shape = (96, 32, 32)
    flags = contraction_flags(shape, 48, 4, gap_lu)
    hc.initialize_lattice(flags=flags)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.set_body_force((1.2e-6, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gap-um", type=float, default=4.0)
    ap.add_argument("--iterations", type=int, default=4000)
    ap.add_argument("--workdir", default="output_contraction")
    args = ap.parse_args()
    hc = build(args.workdir, args.gap_um)
    to_um = hc.params.dx * 1e6
    for _ in range(max(1, args.iterations // 500)):
        hc.iterate(500)
        c = np.asarray(hc.state.cells[0].pos.mean(axis=1))
        print(
            f"iter {hc.iter}: alive {hc.alive_count(0)} | cell x: "
            + " ".join(f"{v*to_um:.1f}um" for v in c[:, 0])
        )


if __name__ == "__main__":
    main()
