"""parallelplanes: RBC suspension in a plane-Poiseuille channel.

Port of examples/parallelplanes (reference: examples/parallelplanes): flow
between two bounce-back plates (z faces), periodic x/y, body-force driven,
a few RBCs in the bulk — the wall-migration / Fahraeus-Lindqvist setup.

Usage: python examples/parallelplanes.py [--iterations 3000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_WALL

RBC_XML = """<?xml version="1.0" ?>
<hemocell><MaterialModel>
  <name>RBC</name><eta_m>0.0</eta_m>
  <kBend>80.0</kBend><kVolume>20.0</kVolume><kArea>5.0</kArea><kLink>15.0</kLink>
  <minNumTriangles>600</minNumTriangles><radius>3.91e-6</radius><Volume>90</Volume>
</MaterialModel></hemocell>
"""

CONFIG_XML = """<?xml version="1.0" ?>
<hemocell>
  <ibm><stepMaterialEvery>20</stepMaterialEvery><stepParticleEvery>5</stepParticleEvery></ibm>
  <domain>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
  </domain>
  <sim><tmax>3000</tmax></sim>
</hemocell>
"""


def build(workdir: str) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML)
    with open(os.path.join(workdir, "RBC.xml"), "w") as f:
        f.write(RBC_XML)
    with open(os.path.join(workdir, "RBC.pos"), "w") as f:
        f.write("3\n8 8 8 30 0 0\n16 8 9.5 0 60 0\n24 8 7 90 0 0\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    shape = (64, 32, 32)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    hc.initialize_lattice(flags=flags)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.set_body_force((6e-7, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=3000)
    ap.add_argument("--workdir", default="output_planes")
    args = ap.parse_args()
    hc = build(args.workdir)
    to_um = hc.params.dx * 1e6
    for _ in range(max(1, args.iterations // 500)):
        hc.iterate(500)
        c = np.asarray(hc.state.cells[0].pos.mean(axis=1))
        print(
            f"iter {hc.iter}: alive {hc.alive_count(0)} | cell z positions "
            + " ".join(f"{v*to_um:.2f}um" for v in c[:, 2])
        )


if __name__ == "__main__":
    main()
