#!/usr/bin/env python3
"""pos_to_vtk: render packCells .pos files as a legacy VTK PolyData mesh.

Equivalent of the reference tools/pos_to_vtk: instantiate the named cell
template at every position/rotation in a .pos file and write a single .vtk
file viewable in ParaView.

Usage:
  python tools/pos_to_vtk.py RBC.pos out.vtk [--type RBC|PLT] [--dx 0.5e-6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu.cells.state import load_pos_file, place_cells
from hemocell_tpu.mesh import construct_mesh


def write_vtk(path, vertices, triangles):
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\npos_to_vtk\nASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {len(vertices)} float\n")
        for v in vertices:
            f.write(f"{v[0]:.6g} {v[1]:.6g} {v[2]:.6g}\n")
        f.write(f"POLYGONS {len(triangles)} {4 * len(triangles)}\n")
        for t in triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pos_file")
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--type", default=None, help="RBC or PLT (default: from filename)")
    ap.add_argument("--dx", type=float, default=0.5e-6)
    args = ap.parse_args()

    name = args.type or os.path.basename(args.pos_file).split(".")[0].upper()
    if name.startswith("RBC"):
        mesh = construct_mesh("RBC_FROM_SPHERE", 3.91e-6 / args.dx, 600)
    elif name.startswith("PLT"):
        mesh = construct_mesh(
            "ELLIPSOID_FROM_SPHERE", 1.25e-6 / args.dx, 66, 0.434782608696
        )
    elif name.startswith("WBC"):
        mesh = construct_mesh("WBC_SPHERE", 4.2e-6 / args.dx, 600)
    else:
        raise SystemExit(f"unknown cell type {name}; pass --type")

    um_to_lu = 1e-6 / args.dx
    centers, angles = load_pos_file(args.pos_file, um_to_lu)
    cells = place_cells(mesh.vertices, centers, angles)

    nv = mesh.num_vertices
    verts = cells.reshape(-1, 3)
    tris = (
        np.asarray(mesh.triangles)[None, :, :]
        + (np.arange(len(centers)) * nv)[:, None, None]
    ).reshape(-1, 3)

    out = args.out or args.pos_file.replace(".pos", ".vtk")
    write_vtk(out, verts, tris)
    print(f"wrote {out}: {len(centers)} cells, {len(verts)} points")


if __name__ == "__main__":
    main()
