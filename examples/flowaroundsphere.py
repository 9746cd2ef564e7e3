"""flowaroundsphere: RBC suspension flowing past a spherical obstacle.

Port of examples/flowaroundsphere (reference:
examples/flowaroundsphere/flowaroundsphere.cpp): a periodic channel with a
bounce-back sphere in the centre, body-force driven, loaded with RBCs+PLTs.

Usage: python examples/flowaroundsphere.py [--iterations 2000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.utils.geometry import ellipsoid, flags_from_fluid_mask

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
  <sim><tmax>2000</tmax></sim>
</hemocell>
"""


def build(workdir: str) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML)
    with open(os.path.join(workdir, "RBC.xml"), "w") as f:
        f.write(RBC_XML)
    with open(os.path.join(workdir, "RBC.pos"), "w") as f:
        # cells upstream of the sphere
        f.write("3\n6 8 8 20 0 0\n6 16 8 0 45 0\n6 8 16 0 0 70\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    shape = (64, 48, 48)
    sphere = ellipsoid(shape, center=(32, 24, 24), radii=(8, 8, 8))
    flags = flags_from_fluid_mask(~sphere)
    hc.initialize_lattice(flags=flags)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.set_body_force((4e-7, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--workdir", default="output_sphere")
    args = ap.parse_args()
    hc = build(args.workdir)
    for _ in range(max(1, args.iterations // 500)):
        hc.iterate(500)
        import numpy as np

        c = np.asarray(hc.state.cells[0].pos.mean(axis=1))
        print(
            f"iter {hc.iter}: alive {hc.alive_count(0)} | centres x = "
            + " ".join(f"{v:.1f}" for v in c[:, 0])
        )


if __name__ == "__main__":
    main()
