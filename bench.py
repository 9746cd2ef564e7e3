"""Benchmark: coupled IB-LBM throughput on one TPU chip.

Headline metric (BASELINE.json): fluid MLUPS/chip + membrane
vertex-updates/s on the stated north-star configuration — a periodic pipe
with ~200 RBC+PLT at 30% tube hematocrit, packCells-initialized
(BASELINE.json configs[3], built by cases/pipeflow30.py).  The reference
publishes no absolute MLUPS (BASELINE.md); ``vs_baseline`` is the ratio to
an ESTIMATED 1.0 MLUPS/core for the MPI reference's coupled pipeflow
(Palabos BGK at ~5 MLUPS/core, degraded ~5x by IBM+mechanics — consistent
with the reference's own 16^3-25^3 block-per-core guidance); see
``vs_baseline_note``.

Secondary keys keep round-over-round comparability: the 64^3/128^3 periodic
suspensions, fluid-only 128^3, and the reference tube.stl pipeflow case.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the first tunnel compile can take minutes,
# repeat runs should be seconds
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "examples"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "cases"))


def time_run(runner, state, n, repeats=3):
    """min-of-repeats wall time for one runner(state, n) call.

    n must be LARGE (>=100): each dispatch through the axon relay costs
    ~25 ms of fixed overhead, which inflated every pre-r04 number by
    0.5-1.0 ms/iteration at the old n=20..50 (docs/PERFORMANCE.md
    "Timing methodology").  Sync is a 4-byte host fetch of a scalar that
    depends on the fluid state: block_until_ready alone can return before
    remote execution completes (see scripts/probe_roofline.py).

    Each timed pass chains `chain` calls and syncs ONCE at the end, so
    the fixed dispatch+fetch cost is paid once per `chain*n` iterations
    (intermediate dispatches overlap device execution)."""
    chain = 3
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(chain):
            state = runner(state, n)
        float(jnp.sum(state.f[0, 0, 0, :2]))
        times.append((time.perf_counter() - t0) / chain)
    times.sort()
    return times[0], state, times[len(times) // 2]


def measured_resort_every(state, extra_iters=0, body_force=0.0):
    """Auto-pick the IBM resort cadence from the drift bound
    (auto_resort_every): u_max measured on the warmed state, plus the
    worst-case growth |F|*extra_iters over the remaining timed window
    (body-force-driven periodic boxes accelerate ~F per step from rest),
    with a further 2x margin."""
    from hemocell_tpu.dynamics import auto_resort_every
    from hemocell_tpu.fluid import lbm

    _, u = lbm.macroscopic(state.f, None)
    u_max = float(jnp.max(jnp.abs(u)))
    f_mag = float(np.max(np.abs(np.asarray(body_force))))
    u_bound = 2.0 * max(u_max + f_mag * extra_iters, 1e-6)
    return auto_resort_every(u_bound), u_max


def suspension_point(shape, n_cells, n, make):
    """Warm up at cadence 1, measure u_max, rebuild at the picked cadence,
    then time."""
    from hemocell_tpu.dynamics import build_runner

    cfg, state, meta = make(resort_every=1)
    runner = build_runner(cfg)
    state = runner(state, 1)
    jax.block_until_ready(state)
    # total iterations the timed window will run past the u_max sample:
    # time_run chains 3 calls per repeat x 3 repeats = 9n
    resort, u_max = measured_resort_every(
        state, extra_iters=9 * n,
        body_force=cfg.body_force if cfg.body_force is not None else 0.0,
    )
    if resort != 1:
        import dataclasses

        cfg = dataclasses.replace(cfg, resort_every=resort)
        runner = build_runner(cfg)
        state = runner(state, 1)
        jax.block_until_ready(state)
    dt, state, dt_med = time_run(runner, state, n)
    return dt, meta, resort, u_max, dt_med


def main():
    from hemocell_tpu.presets import rbc_suspension

    dev = jax.devices()[0]
    platform = dev.platform
    result = {}

    # ---- north-star: periodic pipe, packCells init, 30% hematocrit ------
    # (BASELINE.json configs[3]; reference-style RBC+PLT types, walls,
    #  Poiseuille body force, stepParticleEvery=5, stepMaterialEvery=20,
    #  facade-auto resort cadence from the u_lbm_max drift bound)
    from pipeflow30 import build_pipeflow30

    hc = build_pipeflow30()
    n_rbc, n_plt = hc.alive_count(0), hc.alive_count(1)
    ht = hc.measured_hematocrit
    n_verts30 = sum(
        cs.pos.shape[0] * cs.pos.shape[1] for cs in hc.cell_states
    )
    n = 100
    hc.iterate(n)  # compile (n static) + warmup
    hc.block()
    times30 = []
    for _ in range(3):
        # chain 3 calls, sync once: the ~25 ms relay dispatch+fetch cost
        # amortises over 3n iterations (see time_run docstring)
        t0 = time.perf_counter()
        hc.iterate(n)
        hc.iterate(n)
        hc.iterate(n)
        hc.block()
        times30.append((time.perf_counter() - t0) / 3)
    times30.sort()
    dt30 = times30[0]
    nodes30 = hc.shape[0] * hc.shape[1] * hc.shape[2]
    mlups30 = nodes30 * n / dt30 / 1e6
    mlups30_med = nodes30 * n / times30[len(times30) // 2] / 1e6
    result.update({
        "metric": (
            f"pipeflow MLUPS/chip (periodic pipe, packCells init, "
            f"{n_rbc} RBC + {n_plt} PLT, {ht:.1%} tube hematocrit)"
        ),
        "value": round(mlups30, 3),
        "unit": "MLUPS",
        "vs_baseline": round(mlups30 / 1.0, 3),
        "vs_baseline_note": (
            "ratio to an ESTIMATED 1 MLUPS/core for the MPI reference's "
            "coupled pipeflow (no published numbers; BASELINE.md)"
        ),
        "pipeflow30_mlups": round(mlups30, 3),
        "pipeflow30_mlups_median": round(mlups30_med, 3),
        "pipeflow30_cells": n_rbc + n_plt,
        "pipeflow30_hematocrit": round(ht, 4),
        "pipeflow30_shape": list(hc.shape),
        "pipeflow30_resort_every": hc._auto_resort_every(),
        "pipeflow30_vertex_updates_per_s": round(n_verts30 * n / dt30, 1),
        "pipeflow30_s_per_iteration": round(dt30 / n, 6),
        # fluid-node MLUPS alongside box MLUPS: on walled domains the box
        # number flatters dense layouts (VERDICT r04 #3) — report both
        "pipeflow30_fluid_mlups": round(
            int((np.asarray(hc.flags) == 0).sum()) * n / dt30 / 1e6, 3
        ),
        "platform": platform,
    })

    # ---- coupled suspension 64^3 (round-over-round comparability) -------
    # Mirrors the validated pipeflow settings (examples/pipeflow/
    # pipeflow.cpp): stepParticleEvery=5, stepMaterialEvery=20, repulsion
    # disabled (commented out in the reference example too).
    def make64(resort_every):
        return rbc_suspension(
            shape=(64, 64, 64), n_cells=109,
            body_force=(5e-7, 0.0, 0.0), particle_every=5,
            material_every=20, repulsion=False, resort_every=resort_every,
        )

    dt_c, meta, resort64, umax64, dt_c_med = suspension_point(
        (64,) * 3, 109, 200, make64)
    result.update({
        "coupled_64_mlups": round(64 ** 3 * 200 / dt_c / 1e6, 3),
        "coupled_64_mlups_median": round(64 ** 3 * 200 / dt_c_med / 1e6, 3),
        "coupled_64_cells": meta["n_cells"],
        "coupled_64_hematocrit": round(meta["hematocrit"], 3),
        "coupled_64_resort_every": resort64,
        "vertex_updates_per_s": round(meta["n_vertices"] * 200 / dt_c, 1),
        "s_per_iteration": round(dt_c / 200, 6),
    })

    # ---- coupled at 128^3 (production scale) -----------------------------
    def make128(resort_every):
        return rbc_suspension(
            shape=(128, 128, 128), n_cells=872,
            body_force=(5e-7, 0.0, 0.0), particle_every=5,
            material_every=20, repulsion=False, resort_every=resort_every,
        )

    dt8, meta8, resort128, _, _ = suspension_point(
        (128,) * 3, 872, 100, make128)
    result.update({
        "coupled_128_mlups": round(128 ** 3 * 100 / dt8 / 1e6, 3),
        "coupled_128_cells": meta8["n_cells"],
        "coupled_128_hematocrit": round(meta8["hematocrit"], 3),
        "coupled_128_resort_every": resort128,
        "coupled_128_vertex_updates_per_s": round(
            meta8["n_vertices"] * 100 / dt8, 1
        ),
    })

    # ---- fluid only -----------------------------------------------------
    from hemocell_tpu.dynamics import build_runner

    cfg_f, state_f, _ = rbc_suspension(
        shape=(128, 128, 128), n_cells=0, body_force=(5e-7, 0.0, 0.0),
        repulsion=False,
    )
    runner_f = build_runner(cfg_f)
    state_f = runner_f(state_f, 1)
    jax.block_until_ready(state_f)
    dt_fluid, _, _ = time_run(runner_f, state_f, 500)
    result["fluid_only_mlups"] = round(128 ** 3 * 500 / dt_fluid / 1e6, 3)

    # ---- the reference pipeflow case itself (voxelized tube, RBC+PLT) ---
    pipeflow_cfg = "/root/reference/examples/pipeflow/config.xml"
    if os.path.exists(pipeflow_cfg):
        try:
            from pipeflow import build_pipeflow

            hc2 = build_pipeflow(pipeflow_cfg)
            hc2.iterate(n)  # compile (n is static) + warmup
            hc2.block()
            dt_pipe = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                hc2.iterate(n)
                hc2.iterate(n)
                hc2.iterate(n)
                hc2.block()
                dt_pipe = min(dt_pipe, (time.perf_counter() - t0) / 3)
            nodes_pipe = hc2.shape[0] * hc2.shape[1] * hc2.shape[2]
            result["pipeflow_mlups"] = round(nodes_pipe * n / dt_pipe / 1e6,
                                             3)
            result["pipeflow_fluid_mlups"] = round(
                int((np.asarray(hc2.flags) == 0).sum()) * n / dt_pipe / 1e6,
                3,
            )
            result["pipeflow_cells"] = hc2.alive_count(0) + hc2.alive_count(1)
            result["pipeflow_s_per_iteration"] = round(dt_pipe / n, 6)
        except Exception as e:  # never break the headline metric
            result["pipeflow_error"] = str(e)[:200]

    # ---- AR2 vessel tree (sparse-geometry class: 15.5% fluid in a
    # 411x253x128 box) — fluid-only step on one chip, box + fluid-node
    # MLUPS and HBM footprint (VERDICT r04 #3; reference: sparse
    # MultiBlock allocation, core/hemoCell.cpp:446-571)
    ar2_stl = "/root/reference/cases/AR2/shortoutlet_AR2_rotated.stl"
    if os.path.exists(ar2_stl):
        try:
            import dataclasses

            from hemocell_tpu.dynamics import initial_sim_state
            from hemocell_tpu.presets import default_params
            from hemocell_tpu.utils.voxelize import (
                pad_flags_tpu,
                voxelize_stl,
            )

            flags_a, _ = voxelize_stl(ar2_stl, 408, ref_dir=0)
            flags_a, _ = pad_flags_tpu(flags_a, x_mode="wall")
            params = default_params()
            from hemocell_tpu.dynamics import StepConfig as _SC

            cfg_a = _SC(
                shape=tuple(int(s) for s in flags_a.shape),
                flags=jnp.asarray(flags_a), omega=1.0 / params.tau,
                body_force=jnp.asarray([1e-6, 0.0, 0.0], jnp.float32),
            )
            runner_a = build_runner(cfg_a)
            st_a = initial_sim_state(cfg_a, [])
            st_a = runner_a(st_a, 1)
            jax.block_until_ready(st_a)
            dt_a, st_a, _ = time_run(runner_a, st_a, 100)
            nodes_a = 1
            for s in cfg_a.shape:
                nodes_a *= int(s)
            fluid_a = int((flags_a == 0).sum())
            result["ar2_fluid_only_box_mlups"] = round(
                nodes_a * 100 / dt_a / 1e6, 1
            )
            result["ar2_fluid_only_fluid_mlups"] = round(
                fluid_a * 100 / dt_a / 1e6, 1
            )
            result["ar2_shape"] = list(cfg_a.shape)
            result["ar2_fluid_fraction"] = round(fluid_a / nodes_a, 4)
            result["ar2_s_per_iteration"] = round(dt_a / 100, 6)
            result["ar2_f_hbm_gib"] = round(nodes_a * 19 * 4 / 2**30, 2)
        except Exception as e:
            result["ar2_error"] = str(e)[:200]

    _add_regression_note(result)
    print(json.dumps(result))


def _add_regression_note(result):
    """Compare against the newest committed BENCH_r*.json and flag >10%
    drops loudly (VERDICT r03 #6: make the perf record regression-proof).
    r04 note: the timing methodology changed this round (dispatch-overhead
    amortisation), so r04 vs r03 comparisons are expected to IMPROVE."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                     key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not benches:
        return
    try:
        with open(benches[-1]) as fh:
            prev = json.load(fh).get("parsed", {})
    except Exception:
        return
    prev_round = re.search(r"r(\d+)", benches[-1]).group(1)
    regressed = {}
    for k, v in prev.items():
        cur = result.get(k)
        if (isinstance(v, (int, float)) and isinstance(cur, (int, float))
                and ("mlups" in k or "updates_per_s" in k) and v > 0
                and cur < 0.9 * v):
            regressed[k] = {"prev": v, "now": cur}
    if regressed:
        result["REGRESSED_vs_r" + prev_round] = regressed


def _mesh_mode(n_shards: int):
    """--mesh N: multi-device scaling evidence (virtual CPU devices when
    the backend lacks N real chips) — delegates to scripts/bench_mesh.py
    in a fresh interpreter so the platform pin happens before JAX inits."""
    import subprocess

    env = dict(os.environ)
    if len(jax.devices()) < n_shards:
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_shards}"
        ).strip()
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_mesh.py")
    raise SystemExit(subprocess.call(
        [sys.executable, script, "--shards", str(n_shards)], env=env
    ))


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        _mesh_mode(int(sys.argv[sys.argv.index("--mesh") + 1]))
    main()
