"""kolmogorovFlow: counter-driven shear in a fully periodic box.

Port of cases/kolmogorovFlow (reference: cases/kolmogorovFlow/
kolmogorovFlow.cpp:33-170): a refDirN^3 fully periodic box where the top
half (y <= ny/2) is driven by +x body force and the bottom half by -x — a
Kolmogorov (parallel-planes) shear without walls.  Pipe parameters use a
predefined radius ny/4 (kolmogorovFlow.cpp:54); the force magnitude is the
parallel-planes approximation 16 nu u_max/2 / (ny/4)^2
(kolmogorovFlow.cpp:74).  RBC + PLT loaded from the case .pos files.

Usage: python cases/kolmogorovflow.py [config.xml] [--tmax N]
Defaults to the reference case config.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell

REF_CONFIG = "/root/reference/cases/kolmogorovFlow/config.xml"


def build_kolmogorov(config_path: str) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    n = cfg["domain"]["refDirN"].read(int)
    hc.params.pipe_flow_radius(cfg, n // 4)

    shape = (n, n, n)
    hc.initialize_lattice(shape=shape)  # fully periodic, no walls

    if os.path.exists(os.path.join(cfg.directory, "RBC.xml")):
        hc.add_cell_type("RBC", "RbcHighOrderModel")
    if os.path.exists(os.path.join(cfg.directory, "PLT.xml")):
        hc.add_cell_type("PLT", "PltSimpleModel")
    hc.load_particles()

    r = n / 4.0
    force = 16 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / r / r
    # alternating half-space drive: +x for y <= (n-1)/2, -x below
    # (kolmogorovFlow.cpp:78-82; for odd n the midplane row is undriven)
    fx = np.zeros((3, n, n, n))
    top = np.arange(n) <= (n - 1) // 2 - (1 if n % 2 else 0)
    fx[0, :, top, :] = force
    fx[0, :, ~top, :] = -force
    if n % 2:
        fx[0, :, (n - 1) // 2, :] = force
    hc.set_body_force(fx)
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--tmax", type=int, default=2000)
    ap.add_argument("--out", default="output_kolmogorov")
    args = ap.parse_args()

    hc = build_kolmogorov(args.config)
    hc.set_output_dir(args.out)
    tmeas = hc.cfg["sim"].get("tmeas", int, 500)
    to_mps = hc.params.dx / hc.params.dt
    print(
        f"(kolmogorov) cells: "
        f"{sum(hc.alive_count(i) for i in range(len(hc.cell_types)))}"
    )
    while hc.iter < args.tmax:
        hc.iterate(min(tmeas, args.tmax - hc.iter))
        hc.block()
        u = np.asarray(hc.fluid_velocity())
        n = hc.shape[1]
        utop = u[0][:, : n // 2, :].mean()
        ubot = u[0][:, n // 2 :, :].mean()
        print(
            f"iter {hc.iter}: u_top {utop * to_mps:.4g} m/s "
            f"u_bottom {ubot * to_mps:.4g} m/s | cells "
            f"{sum(hc.alive_count(i) for i in range(len(hc.cell_types)))}"
        )
        hc.write_output()
    print("(kolmogorov) done")


if __name__ == "__main__":
    main()
