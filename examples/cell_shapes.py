"""cell_shapes: instantiate every cell template and report its geometry.

Port of examples/cell_shapes (reference: examples/cell_shapes): builds the
RBC (icosphere+biconcave map), the platelet (octasphere ellipsoid), the WBC
sphere, and — when a path is given — an arbitrary STL template (e.g. the
reference's examples/cell_shapes/RBC.stl), reporting vertex/triangle counts,
volume and surface area, and optionally writing VTK meshes.

Usage: python examples/cell_shapes.py [--stl RBC.stl] [--vtk-prefix out]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu.mesh import MeshMetrics, build_topology, construct_mesh

DX = 0.5e-6


def report(name, mesh):
    met = MeshMetrics(mesh)
    topo = build_topology(mesh)
    to_um = DX * 1e6
    print(
        f"{name:14s}: {mesh.num_vertices:4d} vertices, "
        f"{mesh.num_triangles:4d} triangles, "
        f"volume {met.volume * to_um**3:7.2f} um^3, "
        f"area {met.area * to_um**2:7.2f} um^2, "
        f"mean edge {met.mean_edge_length * to_um:.3f} um, "
        f"rings {sorted(set(int(v) for v in np.unique(topo.ring_n)))}"
    )
    return mesh


def write_vtk(path, mesh):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from pos_to_vtk import write_vtk as _w

    _w(path, mesh.vertices, mesh.triangles)
    print(f"  wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stl", default=None)
    ap.add_argument("--vtk-prefix", default=None)
    args = ap.parse_args()

    shapes = {
        "RBC": construct_mesh("RBC_FROM_SPHERE", 3.91e-6 / DX, 600),
        "PLT": construct_mesh(
            "ELLIPSOID_FROM_SPHERE", 1.25e-6 / DX, 66, 0.434782608696
        ),
        "WBC": construct_mesh("WBC_SPHERE", 4.1e-6 / DX, 600),
    }
    if args.stl:
        shapes["FROM_STL"] = construct_mesh(
            "MESH_FROM_STL", 3.91e-6 / DX, stl_file=args.stl
        )
    for name, mesh in shapes.items():
        report(name, mesh)
        if args.vtk_prefix:
            write_vtk(f"{args.vtk_prefix}_{name}.vtk", mesh)


if __name__ == "__main__":
    main()
