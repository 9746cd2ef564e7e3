"""stretchCell: optical-tweezers stretching of a single RBC.

Port of examples/stretchCell (reference: examples/stretchCell/stretchCell.cpp
and the validation test tests/validation/stretch_cell/test_stretch_cell.cpp):
a 26x13x13 um closed box, one RBC, +-F/7 on the 7 outermost vertices per
side, reporting axial/transverse diameters against the validated
force-displacement curve (doi:10.3389/fphys.2017.00563 Fig. 4).

Usage: python examples/stretchcell.py [--force-pn 125] [--iterations 10000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config import Parameters
from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.utils.stretch import stretch_force_array

RBC_XML = """<?xml version="1.0" ?>
<hemocell><MaterialModel>
  <name>RBC</name>
  <eta_m> 0.0 </eta_m>
  <kBend> 80.0 </kBend> <kVolume> 20.0 </kVolume>
  <kArea> 5.0 </kArea> <kLink> 15.0 </kLink>
  <minNumTriangles> 600 </minNumTriangles>
  <radius> 3.91e-6 </radius> <Volume> 90 </Volume>
</MaterialModel></hemocell>
"""

CONFIG_XML = """<?xml version="1.0" ?>
<hemocell>
  <ibm><stepMaterialEvery>1</stepMaterialEvery><stepParticleEvery>1</stepParticleEvery></ibm>
  <domain>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
  </domain>
  <sim><tmax>10000</tmax></sim>
</hemocell>
"""


def build(workdir: str, force_pn: float) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML)
    with open(os.path.join(workdir, "RBC.xml"), "w") as f:
        f.write(RBC_XML)
    with open(os.path.join(workdir, "RBC.pos"), "w") as f:
        f.write("1\n12.0 6 6 90 0 0\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    nz = int(13 * (1e-6 / hc.params.dx))
    nx, ny = 2 * nz, nz
    flags = np.zeros((nx, ny, nz), np.uint8)
    for sl in [(0,), (-1,)]:
        flags[sl[0], :, :] = FLAG_WALL
        flags[:, sl[0], :] = FLAG_WALL
        flags[:, :, sl[0]] = FLAG_WALL
    hc.initialize_lattice(flags=flags)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    placed = np.asarray(hc.cell_states[0].pos[0])
    hc.set_external_force(
        0, stretch_force_array(placed, 7, hc.params.pn_to_lu(force_pn))
    )
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-pn", type=float, default=125.0)
    ap.add_argument("--iterations", type=int, default=10000)
    ap.add_argument("--workdir", default="output_stretch")
    args = ap.parse_args()

    hc = build(args.workdir, args.force_pn)
    to_um = hc.params.dx * 1e6
    v0 = float(hc.cell_volumes(0)[0])
    for chunk in range(args.iterations // 1000 or 1):
        hc.iterate(min(1000, args.iterations))
        bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
        axial = (bbox[1] - bbox[0]) * to_um
        transverse = (bbox[3] - bbox[2]) * to_um
        v = float(hc.cell_volumes(0)[0])
        print(
            f"iter {hc.iter}: axial {axial:.3f} um, transverse "
            f"{transverse:.3f} um, volume ratio {v / v0:.4f}"
        )
    print("expected at 125 pN: axial 12.25-12.75 um, transverse 6.5-7.0 um")


if __name__ == "__main__":
    main()
