"""capillary: a WBC squeezing through a bifurcating capillary.

Port of examples/capillary (bifurcation variant; reference:
examples/capillary/{capillary.cpp,bifurcation.cpp}): a periodic channel
splitting into two branches around an elliptic divider, driven by a body
force, with one white blood cell deforming through the bifurcation.

Geometry is the reference's exact CSG recipe (bifurcation.cpp:13-95) built
with utils.geometry.

Usage: python examples/capillary.py [--resolution 50] [--capillary-d 10]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.utils import geometry as geom

WBC_XML = """<?xml version="1.0" ?>
<hemocell><MaterialModel>
  <name>WBC</name><eta_m>0.0</eta_m>
  <kBend>120.0</kBend><kVolume>50.0</kVolume><kArea>10.0</kArea><kLink>40.0</kLink>
  <kInnerRigid> 500 </kInnerRigid> <kCytoskeleton> 200 </kCytoskeleton>
  <coreRadius> 1.5e-6 </coreRadius>
  <minNumTriangles>600</minNumTriangles><radius>4.1e-6</radius><Volume>280</Volume>
</MaterialModel></hemocell>
"""

CONFIG_XML = """<?xml version="1.0" ?>
<hemocell>
  <ibm><stepMaterialEvery>1</stepMaterialEvery><stepParticleEvery>1</stepParticleEvery></ibm>
  <domain>
    <rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>0.5e-6</dx><dt>1e-7</dt>
    <kBT>4.100531391e-21</kBT>
  </domain>
  <sim><tmax>5000</tmax></sim>
</hemocell>
"""


def bifurcation_flags(resolution: int, capillary_d: float) -> np.ndarray:
    """The reference CSG recipe (bifurcation.cpp:13-95): outer walls minus
    the flow region, plus the inner elliptic divider."""
    nx, ny, nz = 8 * resolution, resolution, resolution
    shape = (nx, ny, nz)
    wall = 2
    outer_rx = ny - 2 * wall
    outer_ry = 0.5 * outer_rx
    inner_ry = outer_ry - capillary_d
    inner_rx = outer_rx * inner_ry / outer_ry
    cx = 0.1875 * nx
    cy = ny * 0.5 - 1

    # inlet channel height from the outer-ellipse/line intersection
    ellipse_start = cx - outer_rx + capillary_d
    b = -2.0 * cy
    c = cy * cy - outer_ry**2 * (1 - (ellipse_start - cx) ** 2 / outer_rx**2)
    d = b * b - 4.0 * c
    y_top = math.ceil((-b + math.sqrt(d)) / 2.0)
    y_bot = math.floor((-b - math.sqrt(d)) / 2.0)

    def ellipse2d(cx_, cy_, rx, ry):
        # 2D ellipse in (x, y), extruded along z
        x, y, z = np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        )
        return ((x - cx_) / rx) ** 2 + ((y - cy_) / ry) ** 2 <= 1.0

    bounding = np.ones(shape, bool)
    inlet = geom.box(shape, (0, y_bot - 1, 0), (nx, y_top - 1, nz))
    left_o = ellipse2d(cx, cy, outer_rx, outer_ry)
    right_o = ellipse2d(nx - cx, cy, outer_rx, outer_ry)
    center = geom.box(shape, (cx, wall, 0), (nx - cx, ny - wall - 2, nz))
    outer_solid = bounding & ~inlet & ~left_o & ~right_o & ~center

    middle = geom.box(
        shape,
        (cx, wall + capillary_d - 1, 0),
        (nx - cx, ny - wall - capillary_d - 1, nz),
    )
    left_i = ellipse2d(cx, cy, inner_rx, inner_ry)
    right_i = ellipse2d(nx - cx, cy, inner_rx, inner_ry)
    divider = left_i | middle | right_i

    fluid = ~(outer_solid | divider)
    return geom.flags_from_fluid_mask(fluid)


def build(workdir: str, resolution: int, capillary_d_lu: float) -> HemoCell:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.xml"), "w") as f:
        f.write(CONFIG_XML)
    with open(os.path.join(workdir, "WBC.xml"), "w") as f:
        f.write(WBC_XML)
    nx = 8 * resolution
    # the WBC starts in the inlet channel (capillary.cpp places it upstream)
    with open(os.path.join(workdir, "WBC.pos"), "w") as f:
        x_um = 0.05 * nx * 0.5
        y_um = (resolution * 0.5 - 1) * 0.5
        f.write(f"1\n{x_um} {y_um} {y_um} 0 0 0\n")

    hc = HemoCell(os.path.join(workdir, "config.xml"))
    flags = bifurcation_flags(resolution, capillary_d_lu)
    hc.initialize_lattice(flags=flags)
    hc.add_cell_type("WBC", "WbcHighOrderModel", "WBC_SPHERE")
    hc.load_particles()
    hc.set_body_force((2e-6, 0.0, 0.0))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=50)
    ap.add_argument("--capillary-d", type=float, default=10.0, help="lu")
    ap.add_argument("--iterations", type=int, default=5000)
    ap.add_argument("--workdir", default="output_capillary")
    args = ap.parse_args()

    hc = build(args.workdir, args.resolution, args.capillary_d)
    print(f"(capillary) domain {hc.shape}, WBC cells {hc.alive_count(0)}")
    for _ in range(max(1, args.iterations // 500)):
        hc.iterate(500)
        c = np.asarray(hc.state.cells[0].pos.mean(axis=1))
        print(
            f"iter {hc.iter}: WBC centre ({c[0,0]:.1f}, {c[0,1]:.1f}) lu, "
            f"alive {hc.alive_count(0)}"
        )


if __name__ == "__main__":
    main()
