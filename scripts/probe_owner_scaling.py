"""Weak-scaling evidence for owner-computes particle sharding.

VERDICT r03 #3's done-condition: per-shard particle cost measured O(P/N).
Two parts:

1. **On-chip (default, TPU)**: the owner runner's per-shard particle work
   is, by construction (static shapes, parallel/owner_step.py), exactly
   {one build_ibm_plan sort + one pallas_spread + one pallas_interp +
   vertex ops} over Pl = ceil(P_total·margin/N) vertices on a fixed
   per-shard grid.  This probe times that op bundle on the real chip at
   P, P/2, P/4, P/8 — linear scaling in the input size IS the O(P/N)
   claim.  (The replicated shard_map step runs the same bundle at
   P_total on EVERY shard regardless of N.)

2. **Virtual mesh (JAX_PLATFORMS=cpu)**: correctness of the full owner
   runner under weak scaling (fixed per-shard volume + cells, growing
   mesh) — the timing there is interpret-mode Python overhead, so only
   the overflow-free execution is checked, not wall time.

Usage:
  timeout 1800 python scripts/probe_owner_scaling.py            # on chip
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 1800 python scripts/probe_owner_scaling.py --mesh # part 2
"""

import argparse
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
else:
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def on_chip():
    """Per-shard particle bundle cost vs input size (the owner design's
    per-shard size is Pl = P_total*margin/N; replicated = P_total)."""
    from hemocell_tpu.ibm.pallas_ibm import (
        build_ibm_plan,
        pallas_interp,
        pallas_spread,
        slab_capacity,
    )

    grid = (64 + 2 * 12 + 1, 64, 64)  # one shard's extended IBM grid
    P_total = 512 * 1024  # ~the reference weak-scaling class per 8 chips
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(jax.random.PRNGKey(1), (3,) + grid, jnp.float32)
    print(f"per-shard grid {grid}; bundle = plan sort + spread + interp",
          flush=True)
    base = None
    for div in (1, 2, 4, 8):
        P = P_total // div
        pos = jax.random.uniform(key, (P, 3), jnp.float32) * jnp.asarray(
            [grid[0] - 1.0, 64.0, 64.0]
        )
        F = jax.random.normal(key, (P, 3), jnp.float32) * 1e-4
        cap = slab_capacity(P, grid[0])

        @jax.jit
        def bundle(p, F=F, cap=cap):
            plan = build_ibm_plan(p, grid, cap, payload=F)
            fld, _ = pallas_spread(p, F, grid, capacity=cap, plan=plan)
            v, _ = pallas_interp(p, u, grid, capacity=cap, plan=plan)
            return p + v * 1e-30 + fld[0, 0, 0, 0] * 1e-30

        n = 30
        @jax.jit
        def loop(p):
            return jax.lax.fori_loop(0, n, lambda i, pp: bundle(pp), p)

        p = loop(pos); float(jnp.sum(p))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); p = loop(p); float(jnp.sum(p))
            best = min(best, (time.perf_counter() - t0) / n)
        if base is None:
            base = best
        print(f"  P={P:7d} (P_total/{div}): {best*1e3:7.3f} ms  "
              f"({base/best:.2f}x faster than P_total)", flush=True)


def on_mesh():
    from hemocell_tpu.parallel.owner_step import (
        build_owner_runner,
        suggest_envelope,
    )
    from hemocell_tpu.parallel.sharding import make_mesh, shard_state
    from hemocell_tpu.presets import rbc_suspension

    for n in (2, 4, 8):
        cfg, state, _ = rbc_suspension(
            shape=(32 * n, 24, 24), n_cells=4 * n,
            body_force=(1e-6, 0.0, 0.0), particle_every=2,
            material_every=4, repulsion=False, resort_every=4,
        )
        # uniform re-placement along x (the preset clusters cells — a
        # weak-scaling probe wants the production-balanced layout)
        cells = []
        for cs in state.cells:
            nc = cs.pos.shape[0]
            cm = jnp.mean(cs.pos, axis=1, keepdims=True)
            targets_x = (jnp.arange(nc) + 0.5) * (32.0 * n / nc)
            shift = jnp.stack(
                [targets_x - cm[:, 0, 0],
                 jnp.zeros(nc), jnp.zeros(nc)], axis=1
            )[:, None, :]
            cells.append(cs._replace(pos=cs.pos + shift))
        state = state._replace(cells=tuple(cells))
        env = suggest_envelope(state.cells, resort_every=4)
        mesh = make_mesh(n)
        run = build_owner_runner(cfg, mesh, envelope=env)
        out = run(shard_state(state, mesh), 4)
        jax.block_until_ready(out)
        ov = int(out.ibm_overflow)
        print(f"N={n}: owner runner 4 steps ok, overflow={ov}", flush=True)
        assert ov == 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true")
    args = ap.parse_args()
    (on_mesh if args.mesh else on_chip)()
