"""Benchmark: coupled IB-LBM throughput on one TPU chip.

Headline metric (BASELINE.json): fluid MLUPS/chip + membrane
vertex-updates/s on an RBC suspension at ~30% hematocrit.  The reference
publishes no absolute MLUPS (BASELINE.md); ``vs_baseline`` is the ratio to an
estimated 1.0 MLUPS/core for the MPI reference's coupled pipeflow (Palabos
BGK at ~5 MLUPS/core, degraded ~5x by IBM+mechanics — consistent with the
reference's own guidance of 16^3-25^3 blocks per core).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import jax

# persistent compile cache: the first tunnel compile can take minutes,
# repeat runs should be seconds
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def time_run(runner, state, n, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = runner(state, n)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from hemocell_tpu.dynamics import build_runner
    from hemocell_tpu.presets import rbc_suspension

    dev = jax.devices()[0]
    platform = dev.platform

    # ---- coupled suspension (headline) ----------------------------------
    # Mirrors the validated pipeflow settings (examples/pipeflow/pipeflow.cpp):
    # stepParticleEvery=5, stepMaterialEvery=20, repulsion disabled (it is
    # commented out in the reference example too).
    shape = (64, 64, 64)
    # 30% hematocrit: RBC volume ~721 lu^3 -> ~109 cells in 64^3
    cfg, state, meta = rbc_suspension(
        shape=shape,
        n_cells=109,
        body_force=(5e-7, 0.0, 0.0),
        particle_every=5,
        material_every=20,
        repulsion=False,
        resort_every=8,
    )
    runner = build_runner(cfg)
    state = runner(state, 1)  # compile + warmup
    jax.block_until_ready(state)

    n = 50
    dt_coupled, state = time_run(runner, state, n)
    nodes = shape[0] * shape[1] * shape[2]
    mlups = nodes * n / dt_coupled / 1e6
    vups = meta["n_vertices"] * n / dt_coupled

    # ---- coupled at 128^3, ~30% hematocrit (production scale) ------------
    cfg8, state8, meta8 = rbc_suspension(
        shape=(128, 128, 128),
        n_cells=872,
        body_force=(5e-7, 0.0, 0.0),
        particle_every=5,
        material_every=20,
        repulsion=False,
        resort_every=8,
    )
    runner8 = build_runner(cfg8)
    state8 = runner8(state8, 1)
    jax.block_until_ready(state8)
    dt8, _ = time_run(runner8, state8, 20)
    mlups_128 = 128 ** 3 * 20 / dt8 / 1e6

    # ---- fluid only -----------------------------------------------------
    cfg_f, state_f, _ = rbc_suspension(
        shape=(128, 128, 128), n_cells=0, body_force=(5e-7, 0.0, 0.0),
        repulsion=False,
    )
    runner_f = build_runner(cfg_f)
    state_f = runner_f(state_f, 1)
    jax.block_until_ready(state_f)
    dt_fluid, _ = time_run(runner_f, state_f, n)
    mlups_fluid = 128 ** 3 * n / dt_fluid / 1e6

    result = {
        "metric": "coupled MLUPS/chip (RBC suspension ~30% hematocrit)",
        "value": round(mlups, 3),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / 1.0, 3),
        "fluid_only_mlups": round(mlups_fluid, 3),
        "coupled_128_mlups": round(mlups_128, 3),
        "coupled_128_cells": meta8["n_cells"],
        "coupled_128_vertex_updates_per_s": round(
            meta8["n_vertices"] * 20 / dt8, 1
        ),
        "vertex_updates_per_s": round(vups, 1),
        "n_cells": meta["n_cells"],
        "hematocrit": round(meta["hematocrit"], 3),
        "platform": platform,
        "s_per_iteration": round(dt_coupled / n, 6),
    }

    # ---- the reference pipeflow case itself (voxelized tube, RBC+PLT) ---
    pipeflow_cfg = "/root/reference/examples/pipeflow/config.xml"
    if os.path.exists(pipeflow_cfg):
        try:
            import sys

            sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                            "examples"))
            from pipeflow import build_pipeflow

            hc = build_pipeflow(pipeflow_cfg)
            hc.iterate(n)  # compile (n is static) + warmup
            hc.block()
            dt_pipe = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                hc.iterate(n)
                hc.block()
                dt_pipe = min(dt_pipe, time.perf_counter() - t0)
            nodes_pipe = hc.shape[0] * hc.shape[1] * hc.shape[2]
            result["pipeflow_mlups"] = round(nodes_pipe * n / dt_pipe / 1e6, 3)
            result["pipeflow_cells"] = hc.alive_count(0) + hc.alive_count(1)
            result["pipeflow_s_per_iteration"] = round(dt_pipe / n, 6)
        except Exception as e:  # never break the headline metric
            result["pipeflow_error"] = str(e)[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
