"""oneCellShear: a single RBC tumbling/tank-treading in Couette shear.

Port of examples/oneCellShear (reference: examples/oneCellShear/
oneCellShear.cpp:50-111 + helper/hemocellInit.hh:57-92): a 40x40x20 lu box,
periodic in x/y, counter-moving velocity plates at z=0 and z=nz-1, shear rate
from config, one RBC at the centre.

Usage: python examples/onecellshear.py [--shearrate 111] [--iterations 2000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_VELOCITY

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
    <shearrate> {shearrate} </shearrate>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
  </domain>
  <sim><tmax>2000</tmax></sim>
</hemocell>
"""


def build(workdir: str, shearrate: float) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML.format(shearrate=shearrate))
    with open(os.path.join(workdir, "RBC.xml"), "w") as f:
        f.write(RBC_XML)
    with open(os.path.join(workdir, "RBC.pos"), "w") as f:
        f.write("1\n9.5 9.5 4.5 90 0 0\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    nz = int(10 * (1e-6 / hc.params.dx))  # 20
    nx = ny = 2 * nz
    hc.params.shear_flow(hc.cfg, ny)

    flags = np.zeros((nx, ny, nz), np.uint8)
    flags[:, :, 0] = FLAG_VELOCITY
    flags[:, :, -1] = FLAG_VELOCITY
    v_half = (nz - 1) * hc.params.shearrate_lbm * 0.5
    bc = np.zeros((3, nx, ny, nz), np.float32)
    bc[0, :, :, -1] = -v_half  # top plate (hemocellInit.hh:75-77)
    bc[0, :, :, 0] = +v_half
    hc.initialize_lattice(flags=flags)
    hc.bc_velocity = np.asarray(bc)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shearrate", type=float, default=111.0)
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--workdir", default="output_shear")
    args = ap.parse_args()

    hc = build(args.workdir, args.shearrate)
    to_um = hc.params.dx * 1e6
    v0 = float(hc.cell_volumes(0)[0])
    a0 = float(hc.cell_areas(0)[0])
    for _ in range(max(1, args.iterations // 500)):
        hc.iterate(500)
        bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
        v = float(hc.cell_volumes(0)[0])
        a = float(hc.cell_areas(0)[0])
        print(
            f"iter {hc.iter}: extent x {(bbox[1]-bbox[0])*to_um:.2f} um, "
            f"z {(bbox[5]-bbox[4])*to_um:.2f} um | volume {v/v0:.4f} "
            f"area {a/a0:.4f}"
        )


if __name__ == "__main__":
    main()
