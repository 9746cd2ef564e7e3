"""template: minimal starting point for a new case.

Analog of examples/template (reference: examples/template/ — an empty
CMake skeleton users copy to start a new case).  This is the smallest
complete hemocell_tpu case: build a domain, add a cell type, load cells,
drive, iterate, report.  Copy it, adjust, go.

Usage: python examples/template.py [--iterations 500]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_WALL

# --- 1. case configuration (reference XML schema; or point HemoCell at an
#        existing config.xml on disk) ---------------------------------------
CONFIG_XML = """<?xml version="1.0" ?>
<hemocell>
  <ibm><stepMaterialEvery>1</stepMaterialEvery><stepParticleEvery>1</stepParticleEvery></ibm>
  <domain>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
  </domain>
  <sim><tmax>500</tmax></sim>
</hemocell>
"""

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=500)
    ap.add_argument("--workdir", default="output_template")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    for name, text in (("config.xml", CONFIG_XML), ("RBC.xml", RBC_XML)):
        with open(os.path.join(args.workdir, name), "w") as f:
            f.write(text)
    # one cell at the channel centre: "x y z rotX rotY rotZ" in µm/degrees
    with open(os.path.join(args.workdir, "RBC.pos"), "w") as f:
        f.write("1\n8 8 6 0 0 0\n")

    hc = HemoCell(os.path.join(args.workdir, "config.xml"))

    # --- 2. domain: a 32x32x24 channel with z walls, periodic x/y ----------
    flags = np.zeros((32, 32, 24), np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    hc.initialize_lattice(flags=flags)

    # --- 3. cells + drive --------------------------------------------------
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.set_body_force((1e-5, 0.0, 0.0))  # Poiseuille-style drive along x

    # --- 4. run ------------------------------------------------------------
    hc.set_output_dir(args.workdir)
    step = max(1, args.iterations // 5)
    while hc.iter < args.iterations:
        hc.iterate(step)
        hc.block()
        u = np.asarray(hc.fluid_velocity())
        print(
            f"iter {hc.iter}: RBC alive {hc.alive_count(0)} | "
            f"u max {np.abs(u).max() * hc.params.dx / hc.params.dt:.4g} m/s"
        )
    hc.write_output()
    print("(template) done — copy this file to start your own case")


if __name__ == "__main__":
    main()
