"""Diagnose the no-cells pipeflow runner gap: runner says ~1.6 ms/iter but
the raw folded kernel at the same shape is ~0.42 ms.  Print the chosen
fold/tx and time the runner against a raw kernel loop using the case's own
flags + body force."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

from pipeflow import build_pipeflow  # noqa: E402

from hemocell_tpu.dynamics import pick_fold  # noqa: E402
from hemocell_tpu.fluid.pallas_lbm import (  # noqa: E402
    _pick_tx,
    fold_field,
    stream_collide_pallas,
)

CFG = "/root/reference/examples/pipeflow/config.xml"


def main():
    hc = build_pipeflow(CFG)
    hc.cell_states = [
        cs._replace(
            pos=cs.pos[:0], vel=cs.vel[:0], force=cs.force[:0],
            force_repulsion=cs.force_repulsion[:0], alive=cs.alive[:0],
            restime=None if cs.restime is None else cs.restime[:0],
            vel_prev=None if cs.vel_prev is None else cs.vel_prev[:0],
            solidify=None if cs.solidify is None else cs.solidify[:0],
        )
        for cs in hc.cell_states
    ]
    hc._dirty = True
    _ = hc.state
    cfg = hc._step_cfg
    X, Y, Z = cfg.shape
    print("shape", cfg.shape, "fold", pick_fold(cfg),
          "tx", _pick_tx(X, Y, Z),
          "body_force", cfg.body_force,
          "omega ndim", jnp.ndim(cfg.omega),
          "interior_every", cfg.interior_every,
          "solidify_every", cfg.solidify_every,
          "boundary_mask", cfg.boundary_mask is not None,
          "repulsion", cfg.repulsion_constant,
          "brep", cfg.boundary_repulsion_constant,
          "particle_every", cfg.particle_every)

    n = 50
    hc.iterate(n); hc.block()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter(); hc.iterate(n); hc.block()
        best = min(best, time.perf_counter() - t0)
    print(f"runner no-cells: {best/n*1e3:.3f} ms/iter")

    # raw kernel loop with the same flags + constant body force
    fold = pick_fold(cfg)
    f = fold_field(jnp.zeros((19, X, Y, Z), jnp.float32), fold)
    bf = jnp.asarray(cfg.body_force, jnp.float32)
    force = fold_field(
        jnp.zeros((3, X, Y, Z), jnp.float32) + bf[:, None, None, None], fold
    )
    flags_f = fold_field(jnp.asarray(cfg.flags), fold)
    om = float(cfg.omega)

    @jax.jit
    def loop(f):
        return jax.lax.fori_loop(
            0, n,
            lambda _, ff: stream_collide_pallas(ff, force, om, flags_f,
                                                fold=fold),
            f,
        )

    out = jax.block_until_ready(loop(f))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(out))
        best = min(best, time.perf_counter() - t0)
    print(f"raw kernel loop: {best/n*1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
