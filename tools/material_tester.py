#!/usr/bin/env python3
"""material_tester: probe a cell type's force-extension response.

Equivalent of the reference tools/materialTester: stretch a single cell
template with increasing force and report the axial/transverse diameters —
a quick check that a material XML produces the expected stiffness.

Usage:
  python tools/material_tester.py RBC.xml [--forces 10 25 50 75 100 125]
                                          [--iterations 4000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell
from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.utils.stretch import stretch_force_array

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("material_xml")
    ap.add_argument("--model", default="RbcHighOrderModel")
    ap.add_argument("--forces", type=float, nargs="+",
                    default=[10, 25, 50, 75, 100, 125])
    ap.add_argument("--iterations", type=int, default=4000)
    args = ap.parse_args()

    name = os.path.basename(args.material_xml).replace(".xml", "")
    for force_pn in args.forces:
        with tempfile.TemporaryDirectory() as d:
            with open(os.path.join(d, "config.xml"), "w") as f:
                f.write(CONFIG_XML)
            import shutil

            shutil.copy(args.material_xml, os.path.join(d, name + ".xml"))
            with open(os.path.join(d, name + ".pos"), "w") as f:
                f.write("1\n12.0 6 6 90 0 0\n")

            hc = HemoCell(os.path.join(d, "config.xml"))
            nz = int(13 * (1e-6 / hc.params.dx))
            flags = np.zeros((2 * nz, nz, nz), np.uint8)
            for idx in (0, -1):
                flags[idx, :, :] = FLAG_WALL
                flags[:, idx, :] = FLAG_WALL
                flags[:, :, idx] = FLAG_WALL
            hc.initialize_lattice(flags=flags)
            hc.add_cell_type(name, args.model)
            hc.load_particles()
            placed = np.asarray(hc.cell_states[0].pos[0])
            hc.set_external_force(
                0, stretch_force_array(placed, 7, hc.params.pn_to_lu(force_pn))
            )
            v0 = float(hc.cell_volumes(0)[0])
            hc.iterate(args.iterations)
            bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
            to_um = hc.params.dx * 1e6
            axial = (bbox[1] - bbox[0]) * to_um
            transverse = (bbox[3] - bbox[2]) * to_um
            v1 = float(hc.cell_volumes(0)[0])
            print(
                f"{force_pn:7.1f} pN: axial {axial:6.3f} um, transverse "
                f"{transverse:6.3f} um, volume ratio {v1 / v0:.4f}"
            )


if __name__ == "__main__":
    main()
