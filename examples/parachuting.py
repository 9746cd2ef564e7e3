"""parachuting: a single RBC deforming into a parachute in a narrow tube.

Port of examples/parachuting (reference: examples/parachuting/
parachuting.cpp:39-169): voxelize tube.stl at refDirN=20 (a ~10 um tube so
the RBC nearly fills the lumen), pipe parameters from the fluid
cross-section, one RBC loaded on the axis, Poiseuille body force — the cell
folds into the classic parachute shape as it advects.

The geometry/parameter/driving logic is identical to pipeflow, so this
reuses build_pipeflow; the case directory supplies tube.stl, RBC.xml and
RBC.pos (PLT is absent, handled conditionally by the builder).

Usage: python examples/parachuting.py [config.xml] [--tmax N]
Defaults to the reference case config.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pipeflow import build_pipeflow

REF_CONFIG = "/root/reference/examples/parachuting/config.xml"


def parachute_metrics(hc):
    """Axial extent and concavity proxy: the parachute folds the trailing
    face inward, so rear-axis vertices move ahead of the rim."""
    cs = hc.state.cells[0]
    pos = np.asarray(cs.pos)[np.asarray(cs.alive)]
    if pos.shape[0] == 0:
        return 0.0, 0.0
    p = pos[0]
    to_um = hc.params.dx * 1e6
    axial = (p[:, 0].max() - p[:, 0].min()) * to_um
    # concavity: x of the vertices nearest the tube axis minus the rim min-x
    r2 = (p[:, 1] - p[:, 1].mean()) ** 2 + (p[:, 2] - p[:, 2].mean()) ** 2
    core = p[r2 < np.percentile(r2, 10), 0]
    concavity = (core.min() - p[:, 0].min()) * to_um
    return axial, concavity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=5000)
    ap.add_argument("--out", default="output_parachuting")
    args = ap.parse_args()

    hc = build_pipeflow(args.config, args.out)
    cfg = hc.cfg
    tmeas = cfg["sim"].get("tmeas", int, 500)
    print(f"(parachuting) cells: {hc.alive_count(0)} | {hc.params.describe()}")

    while hc.iter < args.tmax:
        hc.iterate(min(tmeas, args.tmax - hc.iter))
        hc.block()
        axial, concavity = parachute_metrics(hc)
        print(
            f"iter {hc.iter}: alive {hc.alive_count(0)} | axial extent "
            f"{axial:.2f} um | rear concavity {concavity:.2f} um | "
            f"mean force {hc.mean_force_pn(0):.3f} pN"
        )
        if hc.outdir:
            hc.write_output()
    print("(parachuting) done")


if __name__ == "__main__":
    main()
