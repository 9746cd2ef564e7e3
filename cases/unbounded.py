"""unbounded: fully periodic bulk suspension driven along all three axes.

Port of cases/unbounded (reference: cases/unbounded/unbounded.cpp:40-110):
a refDirN^3 cube, periodicity on in x/y/z, pipe parameters from refDirN, and
the Poiseuille-style body force applied along ALL THREE axes
(unbounded.cpp:74-78) so the suspension translates diagonally through the
periodic box — a pure bulk-rheology / transport case with no walls at all.

The reference packing is 72,701 RBC + 5,089 PLT at 256^3; by default this
runner crops the packing to an ``--n``-sized corner sub-box so it smoke-runs
on one chip (use ``--n 256 --full`` for the full case).

Usage: python cases/unbounded.py [config.xml] [--n 64] [--tmax 500]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu import HemoCell

REF_CONFIG = "/root/reference/cases/unbounded/config.xml"


def crop_pos(src: str, dst: str, lo_um: float, hi_um: float):
    """Keep cells whose centre lies in [lo, hi]^3 (µm)."""
    with open(src) as f:
        n = int(f.readline())
        rows = [f.readline().split() for _ in range(n)]
    kept = [
        r for r in rows
        if all(lo_um <= float(r[i]) <= hi_um for i in range(3))
    ]
    with open(dst, "w") as f:
        f.write(f"{len(kept)}\n")
        for r in kept:
            f.write(" ".join(r) + "\n")
    return len(kept)


def build(config_path: str, n: int | None, workdir: str) -> HemoCell:
    hc = HemoCell(config_path)
    cfg = hc.cfg
    ref_n = cfg["domain"]["refDirN"].read(int)
    n = n or ref_n
    # lbm_pipe_parameters((*cfg), refDirN) — radius = refDirN/2
    hc.params.pipe_flow_radius(cfg, ref_n / 2.0)
    hc.initialize_lattice(shape=(n, n, n))

    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.add_cell_type("PLT", "PltSimpleModel")

    pos_dir = cfg.directory
    if n < ref_n:
        os.makedirs(workdir, exist_ok=True)
        margin = 4 * hc.params.dx * 1e6
        for name in ("RBC", "PLT"):
            kept = crop_pos(
                os.path.join(cfg.directory, name + ".pos"),
                os.path.join(workdir, name + ".pos"),
                margin, n * hc.params.dx * 1e6 - margin,
            )
            print(f"(unbounded) {name}: cropped packing to {kept} cells")
        pos_dir = workdir
    hc.load_particles(pos_dir)

    # driving force along all three axes (unbounded.cpp:74-78)
    r = ref_n / 2.0
    force = 8 * hc.params.nu_lbm * (hc.params.u_lbm_max * 0.5) / r / r
    hc.set_body_force((force, force, force))
    return hc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=REF_CONFIG)
    ap.add_argument("--n", type=int, default=64,
                    help="domain edge in lu (reference: refDirN=256)")
    ap.add_argument("--tmax", type=int, default=500)
    ap.add_argument("--workdir", default="output_unbounded")
    args = ap.parse_args()

    hc = build(args.config, args.n, args.workdir)
    names = [ct.name for ct in hc.cell_types]
    print(f"(unbounded) cells: "
          f"{ {nm: hc.alive_count(i) for i, nm in enumerate(names)} }")
    tmeas = min(250, args.tmax)
    while hc.iter < args.tmax:
        hc.iterate(min(tmeas, args.tmax - hc.iter))
        hc.block()
        u = np.asarray(hc.fluid_velocity())
        to_ms = hc.params.dx / hc.params.dt
        print(
            f"iter {hc.iter}: "
            + " ".join(f"{nm} {hc.alive_count(i)}" for i, nm in enumerate(names))
            + f" | u mean {np.abs(u).mean() * to_ms:.4g} m/s"
            + f" | RBC force {hc.mean_force_pn(0):.3f} pN"
        )
    print("(unbounded) done")


if __name__ == "__main__":
    main()
