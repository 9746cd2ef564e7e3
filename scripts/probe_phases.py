"""Standalone per-phase breakdown of the coupled step from a preset
StepConfig/SimState (HemoCell.profile_phases needs the facade; presets
return the raw pytrees).  Usage:

    python scripts/probe_phases.py [X Y Z n_cells]

Each phase runs standalone in a jitted fori_loop with a chained carry
(the axon relay caches identical-input executions, so carries must change
across timing repeats).
"""

import os
import sys
import time

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hemocell_tpu.dynamics import build_runner, pick_fold  # noqa: E402
from hemocell_tpu.fluid import lbm  # noqa: E402
from hemocell_tpu.fluid.pallas_lbm import (  # noqa: E402
    fold_field,
    stream_collide_pallas,
)
from hemocell_tpu.ibm.pallas_ibm import (  # noqa: E402
    build_ibm_plan,
    pallas_interp,
    pallas_spread,
    slab_capacity,
)
from hemocell_tpu.presets import rbc_suspension  # noqa: E402

N = 20
REPEATS = 3


def timeit(fn, x0):
    x = fn(x0)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        x = fn(x)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - t0)
    return best / N


def main(shape, n_cells):
    cfg, st, meta = rbc_suspension(
        shape=shape, n_cells=n_cells, body_force=(5e-7, 0.0, 0.0),
        particle_every=5, material_every=20, repulsion=False,
        resort_every=8,
    )
    print(f"shape={shape} cells={meta['n_cells']} "
          f"Ht={meta['hematocrit']:.2f}", flush=True)
    runner = build_runner(cfg)
    results = {}
    results["total (iterate)"] = timeit(lambda s: runner(s, N), st)

    # fluid kernel standalone
    fold = pick_fold(cfg)
    dtype = cfg.dtype
    force0 = jnp.zeros((3,) + shape, dtype) + cfg.body_force[:, None, None, None]
    f0, force_c, flags_c = st.f, force0, cfg.flags
    if fold > 1:
        f0 = fold_field(f0, fold)
        force_c = fold_field(force_c, fold)
        flags_c = fold_field(flags_c, fold)

    @jax.jit
    def floop(f):
        return jax.lax.fori_loop(
            0, N,
            lambda i, ff: stream_collide_pallas(
                ff, force_c, cfg.omega, flags_c, None, fold=fold
            ),
            f,
        )

    results["collideAndStream"] = timeit(floop, f0)

    pos_flat = jnp.concatenate([cs.pos.reshape(-1, 3) for cs in st.cells])
    P0 = pos_flat.shape[0]
    P_pad = -(-P0 // 512) * 512
    pos_pad = jnp.pad(pos_flat, ((0, P_pad - P0), (0, 0)), constant_values=0.5)
    fshape = jnp.asarray(shape, dtype)
    pos_w = jnp.mod(pos_pad, fshape[None, :])
    fdep = jnp.pad(
        jnp.concatenate([cs.force.reshape(-1, 3) for cs in st.cells]),
        ((0, P_pad - P0), (0, 0)),
    )
    cap = slab_capacity(P_pad, shape[0])

    @jax.jit
    def sloop(p):
        def body(i, pp):
            plan = build_ibm_plan(pp, shape, cap, payload=fdep)
            field, _ = pallas_spread(
                pp, fdep, shape, capacity=cap, plan=plan,
            )
            return pp + field[0, 0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, N, body, p)

    results["spreadParticleForce (sort+kernel)"] = timeit(sloop, pos_w)

    plan0 = build_ibm_plan(pos_w, shape, cap, payload=fdep)

    @jax.jit
    def skloop(p):
        def body(i, pp):
            field, _ = pallas_spread(
                pp, fdep, shape, capacity=cap, plan=plan0,
            )
            return pp + field[0, 0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, N, body, p)

    results["  spread kernel only"] = timeit(skloop, pos_w)

    force_z = jnp.zeros((3,) + shape, dtype)
    _, u0 = lbm.macroscopic(st.f, force_z)

    @jax.jit
    def iloop(p):
        def body(i, pp):
            vals, _ = pallas_interp(pp, u0, shape, capacity=cap)
            return pp + vals[0, 0] * 1e-30
        return jax.lax.fori_loop(0, N, body, p)

    results["interpolateFluidVelocity /5"] = timeit(iloop, pos_w) / 5

    tc = cfg.types[0]
    cs = st.cells[0]

    @jax.jit
    def mloop(p):
        def body(i, pp):
            ft = jax.vmap(
                lambda a, b: tc.model_fn(a, b, tc.topo, tc.material).total
            )(pp, cs.vel)
            return pp + ft * 1e-30
        return jax.lax.fori_loop(0, N, body, p)

    results["applyConstitutiveModel /20"] = timeit(mloop, cs.pos) / 20

    if cfg.repulsion_constant > 0.0:
        from hemocell_tpu.cells.pallas_repulsion import pallas_repulsion

        gid = jnp.pad(
            jnp.repeat(
                jnp.arange(cs.pos.shape[0], dtype=jnp.int32), cs.pos.shape[1]
            ),
            (0, P_pad - P0), constant_values=-1,
        )
        act = jnp.pad(
            jnp.repeat(cs.alive.astype(dtype), cs.pos.shape[1]),
            (0, P_pad - P0),
        )

        @jax.jit
        def rloop(p):
            def body(i, pp):
                fr, _ = pallas_repulsion(
                    pp, gid, act, shape,
                    float(cfg.repulsion_constant),
                    float(cfg.repulsion_cutoff),
                )
                return pp + fr * 1e-30
            return jax.lax.fori_loop(0, N, body, p)

        results["applyRepulsionForce"] = timeit(rloop, pos_w)

    listed = sum(v for k, v in results.items()
                 if k != "total (iterate)" and not k.startswith("  "))
    results["other"] = max(0.0, results["total (iterate)"] - listed)
    total = results["total (iterate)"]
    print(f"{'phase':32s} {'ms/iter':>9s} {'%':>6s}")
    for k, v in results.items():
        print(f"{k:32s} {v * 1e3:9.3f} {100 * v / total:6.1f}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]] or [128, 128, 128, 872]
    main(tuple(args[:3]), args[3])
