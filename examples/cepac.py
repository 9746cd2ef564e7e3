"""CEPAC: platelet-activation chemical released near a vessel wall.

Port of cases/CEPAC (reference: cases/CEPAC/CEPAC.cpp): a channel flow with
platelets, a CEPAC advection-diffusion field with a Dirichlet concentration
source patch on the wall (CEPAC.cpp:126-128), and optional solidification of
platelets that bind near high-shear wall sites.

Usage: python examples/cepac.py [--iterations 2000] [--solidify]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.fluid.advection_diffusion import concentration

PLT_XML = """<?xml version="1.0" ?>
<hemocell><MaterialModel>
  <name>PLT</name>
  <aspectRatio>0.434782608696</aspectRatio>
  <eta_m> 0.0 </eta_m>
  <kBend> 250 </kBend> <kVolume> 100.0 </kVolume>
  <kArea> 8.0 </kArea> <kLink> 25.0 </kLink> <kInnerLink> 25.0 </kInnerLink>
  <minNumTriangles> 66 </minNumTriangles>
  <radius> 1.25e-6 </radius> <Volume> 11 </Volume>
  <InnerEdges><Edge>0 1</Edge></InnerEdges>
  <distanceThreshold> 2.0 </distanceThreshold>
  <shearThreshold> 0.0 </shearThreshold>
</MaterialModel></hemocell>
"""

CONFIG_XML = """<?xml version="1.0" ?>
<hemocell>
  <ibm><stepMaterialEvery>1</stepMaterialEvery><stepParticleEvery>1</stepParticleEvery></ibm>
  <domain>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
  </domain>
  <sim><tmax>2000</tmax></sim>
</hemocell>
"""


def build(workdir: str, solidify: bool) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML)
    with open(os.path.join(workdir, "PLT.xml"), "w") as f:
        f.write(PLT_XML)
    with open(os.path.join(workdir, "PLT.pos"), "w") as f:
        f.write("2\n8 8 3.5 0 0 0\n16 8 6 30 40 0\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    shape = (48, 32, 24)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    hc.initialize_lattice(flags=flags)
    hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()
    hc.set_body_force((2e-6, 0.0, 0.0))

    # CEPAC source patch on the floor (CEPAC.cpp:126-128)
    mask = np.zeros(shape, np.uint8)
    mask[1:5, 14:18, 1:3] = 1
    value = np.full(shape, 0.05, np.float32)
    hc.enable_cepac(diffusivity_lbm=1.0 / 6.0, dirichlet_mask=mask,
                    dirichlet_value=value)
    if solidify:
        hc.enable_solidify(0, every=50)
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--solidify", action="store_true")
    ap.add_argument("--workdir", default="output_cepac")
    args = ap.parse_args()

    hc = build(args.workdir, args.solidify)
    for _ in range(max(1, args.iterations // 500)):
        hc.iterate(500)
        c = concentration(hc.state.cepac)
        print(
            f"iter {hc.iter}: CEPAC total {float(c.sum()):.3f} "
            f"max {float(c.max()):.4f} | PLT alive {hc.alive_count(0)}"
        )


if __name__ == "__main__":
    main()
