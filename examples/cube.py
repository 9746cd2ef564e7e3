"""cube: RBC suspension in a sheared periodic box.

Port of examples/cube (reference: examples/cube/cube.cpp): a cube with
moving-wall shear on the z faces, periodic x/y, loaded with RBCs at a chosen
hematocrit — the canonical bulk-rheology case.

Usage: python examples/cube.py [--n 32] [--cells 16] [--shearrate 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.presets import default_params, rbc_suspension


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--cells", type=int, default=8)
    ap.add_argument("--shearrate", type=float, default=100.0, help="1/s")
    ap.add_argument("--iterations", type=int, default=2000)
    args = ap.parse_args()

    params = default_params()
    shear_lbm = args.shearrate * params.dt  # per-step velocity gradient
    shape = (args.n, args.n, args.n)
    v_wall = shear_lbm * (args.n - 2) / 2

    cfg, state, meta = rbc_suspension(
        shape=shape,
        n_cells=args.cells,
        params=params,
        shear_velocity=v_wall,
        particle_every=1,
        material_every=1,
    )
    print(
        f"(cube) {shape} lu, {meta['n_cells']} RBC "
        f"({meta['hematocrit']*100:.1f}% Ht), wall velocity {v_wall:.2e} lu"
    )
    run = build_runner(cfg)
    t0 = time.time()
    chunk = 200
    for i in range(args.iterations // chunk):
        state = run(state, chunk)
        import jax

        jax.block_until_ready(state)
        alive = int(state.cells[0].alive.sum())
        sec_it = (time.time() - t0) / ((i + 1) * chunk)
        print(
            f"iter {int(state.it)}: cells alive {alive} | {sec_it*1e3:.2f} ms/it"
        )
    print("(cube) done")


if __name__ == "__main__":
    main()
