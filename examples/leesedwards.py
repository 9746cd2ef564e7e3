"""leesEdwards: RBC suspension under unbounded uniform shear.

Port of cases/leesEdwards (reference: cases/leesEdwards/leesEdwards.cpp):
a fully periodic box sheared through Lees-Edwards wrapping across the z
faces — no walls, no velocity nodes, bulk rheology without boundary
artefacts.

Usage: python examples/leesedwards.py [--shearrate 100] [--iterations 2000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.presets import default_params, rbc_suspension


def build(shearrate_si: float, shape=(32, 32, 32), n_cells=4):
    params = default_params()
    gamma = shearrate_si * params.dt  # per-step shear rate in lu
    u_rel = gamma * shape[2]
    cfg, state, meta = rbc_suspension(
        shape=shape, n_cells=n_cells, params=params, repulsion=False,
        particle_every=1, material_every=1,
        # Lees-Edwards uses the jnp fluid path (the wrap correction is not
        # in the fused kernel yet)
        spread_mode="scatter",
    )
    cfg = dataclasses.replace(cfg, lees_edwards_velocity=float(u_rel),
                              use_pallas=False)
    from hemocell_tpu.dynamics import initial_sim_state
    from hemocell_tpu.cells.state import make_cell_state

    state = initial_sim_state(cfg, list(state.cells))
    return cfg, state, meta, gamma


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shearrate", type=float, default=100.0)
    ap.add_argument("--iterations", type=int, default=2000)
    args = ap.parse_args()

    cfg, state, meta, gamma = build(args.shearrate)
    print(
        f"(leesEdwards) {meta['n_cells']} RBC, shear rate {args.shearrate}/s "
        f"({gamma:.2e} per step)"
    )
    run = build_runner(cfg)
    for _ in range(max(1, args.iterations // 500)):
        state = run(state, 500)
        jax.block_until_ready(state)
        from hemocell_tpu.fluid import lbm

        zero = jnp.zeros((3,) + cfg.shape, cfg.dtype)
        _, u = lbm.macroscopic(state.f, zero)
        prof = np.asarray(u[0].mean(axis=(0, 1)))
        slope = np.polyfit(np.arange(len(prof)), prof, 1)[0]
        print(
            f"iter {int(state.it)}: alive "
            f"{int(state.cells[0].alive.sum())} | measured du_x/dz "
            f"{slope:.3e} (imposed {gamma:.3e}) | displacement "
            f"{float(state.le_displacement):.1f} lu"
        )


if __name__ == "__main__":
    main()
