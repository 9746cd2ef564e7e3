"""In-runner ablation of the north-star pipeflow30 case (post wall-hit fix).

Same attribution-by-subtraction approach as probe_ablate_128.py, applied to
the ACTUAL pipeflow30 configuration (walls, repulsion, boundary deletion,
resort cadence 16): each variant stubs one phase inside build_runner
(monkeypatched before trace) with dispatch-amortised timing (bench.time_run
chains 3x n-iteration calls per sync — see docs/PERFORMANCE.md "Timing
methodology").  Also measures the ibm_mm='bf16' MXU-rate variant.

Usage: timeout 1800 python scripts/probe_ablate30.py [n]
"""

import os
import sys
import time

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/cases")

import jax.numpy as jnp  # noqa: E402

import hemocell_tpu.ibm.pallas_ibm as pibm  # noqa: E402
import hemocell_tpu.fluid.pallas_lbm as plbm  # noqa: E402
import hemocell_tpu.cells.pallas_repulsion as prep  # noqa: E402
import hemocell_tpu.dynamics as dyn  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200

_real = {}


def bench(hc, n=N, repeats=3):
    st = hc.state
    runner = hc._runner
    st = runner(st, n)
    float(jnp.sum(st.f[0, 0, 0, :2]))  # compile + warm (true completion)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = st
        for _ in range(3):
            s = runner(s, n)
        float(jnp.sum(s.f[0, 0, 0, :2]))
        best = min(best, (time.perf_counter() - t0) / 3)
    return best / n


def stub_spread(pos, forces, shape, capacity=2048, interpret=None,
                mask=None, plan=None, mm="f32"):
    return (jnp.zeros((3,) + tuple(shape), forces.dtype),
            jnp.zeros((), jnp.int32))


def stub_spread_shadow(plan, shape, capacity, interpret=None, mm="f32",
                       mask=None, hit_cells=None):
    field = jnp.zeros((3,) + tuple(shape), plan.pos_cm.dtype)
    if hit_cells is not None:
        return field, jnp.zeros((int(hit_cells),), plan.pos_cm.dtype)
    return field


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


def stub_wall_hit(plan, wall, shape, capacity, n_cells, interpret=None):
    NCp = -(-max(1, int(n_cells)) // 128) * 128
    return jnp.zeros(NCp, plan.pos_cm.dtype)


def stub_repulsion(pos, cell_gid, active, shape, k_rep, cutoff,
                   *args, **kwargs):
    return jnp.zeros_like(pos)


PATCHES = {
    "no-fluid": [(plbm, "stream_collide_pallas", stub_fluid)],
    "no-spread": [(pibm, "pallas_spread", stub_spread),
                  (pibm, "pallas_spread_shadow", stub_spread_shadow)],
    "no-interp": [(pibm, "pallas_interp", stub_interp),
                  (pibm, "pallas_interp_shadow", stub_interp_shadow)],
    "no-wallhit": [(pibm, "pallas_wall_hit_cells", stub_wall_hit)],
    "no-repulsion": [(prep, "pallas_repulsion", stub_repulsion)],
}
# every kernel stubbed at once: what remains is the step's machinery
# (advance, shadow bookkeeping, [P]-elementwise, loop-carry traffic) —
# the "other" share of the phase table, isolated
PATCHES["no-kernels"] = [p for ps in PATCHES.values() for p in ps]


def run_variant(name, patches=(), mm=None, tweak=None):
    saved = []
    try:
        for mod, attr, fn in patches:
            saved.append((mod, attr, getattr(mod, attr)))
            setattr(mod, attr, fn)
            if hasattr(dyn, attr):
                saved.append((dyn, attr, getattr(dyn, attr)))
                setattr(dyn, attr, fn)
        from pipeflow30 import build_pipeflow30

        hc = build_pipeflow30(workdir="/tmp/pipeflow30_ablate")
        if mm:
            hc.ibm_mm = mm
        if tweak:
            tweak(hc)
        hc.iterate(1)
        hc.block()
        dt = bench(hc)
        nodes = 1
        for s in hc.shape:
            nodes *= int(s)
        print(f"{name:16s} dt={dt*1e3:7.3f} ms/iter "
              f"{nodes/dt/1e6:8.1f} MLUPS", flush=True)
        return dt
    finally:
        for mod, attr, fn in saved:
            setattr(mod, attr, fn)


def main():
    drill_only = len(sys.argv) > 2 and sys.argv[2] == "drill"
    if not drill_only:
        base = run_variant("base")
        for name, patches in PATCHES.items():
            dt = run_variant(name, patches)
            print(f"    -> {name} share: {(base - dt)*1e3:+.3f} ms",
                  flush=True)
        bf16 = run_variant("ibm_mm=bf16", mm="bf16")
        print(f"    -> bf16 delta: {(base - bf16)*1e3:+.3f} ms", flush=True)

    # machinery drill-down on the no-kernels residual: cadence tweaks
    # (measurement-only physics changes) isolate the resync sort and the
    # sorted-force refresh from the per-step machinery
    nk = run_variant("no-kernels(ref)", PATCHES["no-kernels"])

    def no_resort(hc):
        hc.resort_every = 10 ** 6  # explicit override wins

    def no_material(hc):
        for ct in hc.cell_types:
            ct.timescale = 10 ** 6

    def no_both(hc):
        no_resort(hc)
        no_material(hc)

    for name, tweak in (("nk+resort=inf", no_resort),
                        ("nk+material=inf", no_material),
                        ("nk+both=inf", no_both)):
        try:
            dt = run_variant(name, PATCHES["no-kernels"], tweak=tweak)
            print(f"    -> {name} saves: {(nk - dt) * 1e3:+.3f} ms "
                  f"of the {nk * 1e3:.3f} residual", flush=True)
        except Exception as e:
            print(f"    {name}: failed ({type(e).__name__}: {e})",
                  flush=True)


if __name__ == "__main__":
    main()
