"""In-runner ablation of the 128³ coupled suspension: each variant stubs
one phase INSIDE build_runner (monkeypatched before trace) and reports the
delta vs baseline — attribution by subtraction, the same approach as
bench_pipeflow --ablate.  Standalone kernel probes are misleading here:
eager device arrays captured as jit closure constants pay a ~1.2 ms/launch
scalar-operand penalty through the axon relay that in-graph operands do not
(see scripts/probe_phases.py history), so phases must be measured in-graph.

Usage: python scripts/probe_ablate_128.py [X Y Z n_cells]
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

import hemocell_tpu.ibm.pallas_ibm as pibm  # noqa: E402
import hemocell_tpu.fluid.pallas_lbm as plbm  # noqa: E402
from hemocell_tpu.dynamics import build_runner  # noqa: E402
from hemocell_tpu.presets import rbc_suspension  # noqa: E402

N = 20


def bench(runner, st, repeats=3):
    st = runner(st, N)
    jax.block_until_ready(st)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        st = runner(st, N)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    return best / N


def make_state(shape, n_cells, resort_every):
    return rbc_suspension(
        shape=shape, n_cells=n_cells, body_force=(5e-7, 0.0, 0.0),
        particle_every=5, material_every=20, repulsion=False,
        resort_every=resort_every,
    )


def run_variant(name, shape, n_cells, resort_every=1, patch=None):
    saved = {}
    mods = {"pibm": pibm, "plbm": plbm}
    try:
        for (modname, attr), fn in (patch or {}).items():
            mod = mods[modname]
            saved[(modname, attr)] = getattr(mod, attr)
            setattr(mod, attr, fn)
        cfg, st, meta = make_state(shape, n_cells, resort_every)
        runner = build_runner(cfg)
        dt = bench(runner, st)
        nodes = shape[0] * shape[1] * shape[2]
        print(f"{name:22s} dt={dt*1e3:.3f} ms/iter {nodes/dt/1e6:8.1f} MLUPS",
              flush=True)
        return dt
    finally:
        for (modname, attr), fn in saved.items():
            setattr(mods[modname], attr, fn)


def stub_spread(pos, forces, shape, capacity=2048, interpret=None,
                mask=None, plan=None, mm="f32"):
    return (jnp.zeros((3,) + tuple(shape), forces.dtype),
            jnp.zeros((), jnp.int32))


def stub_spread_shadow(plan, shape, capacity, interpret=None, mm="f32"):
    return (jnp.zeros((3,) + tuple(shape), plan.pos_cm.dtype),
            jnp.zeros((), jnp.int32))


def stub_interp(pos, field, shape, capacity=2048, interpret=None,
                plan=None, mm="f32"):
    return (jnp.zeros((pos.shape[0], field.shape[0]), field.dtype),
            jnp.zeros((), jnp.int32))


def stub_interp_shadow(plan, u, shape, capacity, interpret=None, mm="f32"):
    P = plan.order.shape[0]
    vals = jnp.zeros((P, u.shape[0]), u.dtype)
    vals_cm = jnp.zeros_like(plan.pos_cm)
    return vals, vals_cm


def stub_fluid(f, force, omega, flags, bc_velocity=None, tx=None,
               interpret=None, bc_density=None, fold=1, halos=None,
               lazy_force=None):
    return f


def main(shape, n_cells):
    print(f"shape={shape} n_cells={n_cells}", flush=True)
    base8 = run_variant("base (resort 8)", shape, n_cells, resort_every=8)
    base = run_variant("base (resort 1)", shape, n_cells)
    run_variant("no-fluid", shape, n_cells,
                patch={("plbm", "stream_collide_pallas"): stub_fluid})
    run_variant("no-spread", shape, n_cells,
                patch={("pibm", "pallas_spread"): stub_spread,
                       ("pibm", "pallas_spread_shadow"): stub_spread_shadow})
    run_variant("no-interp", shape, n_cells,
                patch={("pibm", "pallas_interp"): stub_interp,
                       ("pibm", "pallas_interp_shadow"): stub_interp_shadow})
    run_variant("no-ibm", shape, n_cells,
                patch={("pibm", "pallas_spread"): stub_spread,
                       ("pibm", "pallas_spread_shadow"): stub_spread_shadow,
                       ("pibm", "pallas_interp"): stub_interp,
                       ("pibm", "pallas_interp_shadow"): stub_interp_shadow})
    print(f"baseline resort8 {base8*1e3:.3f}  resort1 {base*1e3:.3f}",
          flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]] or [128, 128, 128, 872]
    main(tuple(args[:3]), args[3])
