#!/usr/bin/env python3
"""batch_postprocess: generate XMF descriptors for every HDF5 output
(analog of scripts/batchPostProcess.sh, which calls the reference's
FluidHDF5toXMF.py + CellHDF5toXMF.py — those scripts also run unmodified
on this framework's output; this wrapper is self-contained).

Usage: python scripts/batch_postprocess.py [outdir]
The XMF files open directly in ParaView/VisIt next to the hdf5/ tree.
"""

from __future__ import annotations

import glob
import os
import sys

import h5py


def fluid_xmf(h5path: str) -> str:
    with h5py.File(h5path, "r") as f:
        dx = float(f.attrs["dx"][0])
        dt = float(f.attrs["dt"][0])
        it = int(f.attrs["iteration"][0])
        size = [int(v) for v in f.attrs["subdomainSize"]]
        rel = [float(v) for v in f.attrs["relativePosition"]]
        fields = [
            (name, ds.shape[-1])
            for name, ds in f.items()
            if hasattr(ds, "shape") and len(ds.shape) == 4
        ]
    nz, ny, nx = size[0], size[1], size[2]
    base = os.path.basename(h5path)
    attrs = "\n".join(
        f"""      <Attribute Name="{name}" AttributeType="{'Vector' if w == 3 else ('Tensor6' if w == 6 else 'Scalar')}" Center="Node">
        <DataItem Dimensions="{nz} {ny} {nx} {w}" NumberType="Float" Precision="4" Format="HDF">{base}:/{name}</DataItem>
      </Attribute>"""
        for name, w in fields
    )
    return f"""<?xml version="1.0" ?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="2.0">
  <Domain>
    <Grid Name="Fluid" GridType="Uniform">
      <Time Value="{it * dt}" />
      <Topology TopologyType="3DCoRectMesh" Dimensions="{nz} {ny} {nx}"/>
      <Geometry GeometryType="ORIGIN_DXDYDZ">
        <DataItem Dimensions="3">{rel[0] * dx} {rel[1] * dx} {rel[2] * dx}</DataItem>
        <DataItem Dimensions="3">{dx} {dx} {dx}</DataItem>
      </Geometry>
{attrs}
    </Grid>
  </Domain>
</Xdmf>
"""


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "."
    n = 0
    for h5path in sorted(
        glob.glob(os.path.join(outdir, "hdf5", "*", "Fluid.*.h5"))
    ):
        xmf = h5path.replace(".h5", ".xmf")
        with open(xmf, "w") as f:
            f.write(fluid_xmf(h5path))
        n += 1
    print(f"wrote {n} XMF descriptors under {outdir}/hdf5/")


if __name__ == "__main__":
    main()
