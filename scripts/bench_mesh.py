"""Multi-device scaling evidence: per-shard step time, halo traffic and
owner-table occupancy vs shard count (VERDICT r04 #5).

Runs the distributed runners over an N-device mesh — real chips when the
backend has them, else virtual CPU host devices — and records:

  * weak scaling: fixed per-shard slab (Xl x Y x Z) and per-shard cell
    count, N = 1/2/4/8 shards.  The owner-computes runner's particle work
    is O(P/N), so its per-shard step time should stay ~flat; the
    vertex-replicated shard_map runner re-sorts the FULL suspension on
    every shard, so its per-shard time grows with N (the weak-scaling
    wall the reference's per-block particle fields avoid,
    core/hemoCellFields.cpp:70-111).
  * strong scaling: fixed total domain, N = 1/2/4/8.
  * analytic ICI traffic per step (ppermute payload bytes per shard) and
    collective counts, from the runner designs.
  * owner-table occupancy: capacity vs actual owned cells.

CPU-mesh timings are RELATIVE evidence (virtual devices share host
cores; absolute ms are meaningless, ratios across N within one runner
are the signal).  Usage:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_mesh.py [--weak] [--strong] [--n 20]

or through ``python bench.py --mesh 8`` (which execs this).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _ensure_devices(n):
    if len(jax.devices()) < n:
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_num_cpu_devices", n)
        jax.config.update("jax_platforms", "cpu")
        assert len(jax.devices()) >= n


def _time(run, state, n, repeats=3):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = run(state, n)
        jax.block_until_ready(state)
        float(jnp.sum(state.f[0, 0, 0, :2]))
        ts.append((time.perf_counter() - t0) / n)
    ts.sort()
    return ts[0], state


def _per_shard_cost(run, state, n):
    """XLA cost analysis of the compiled SPMD program: per-device flops
    and bytes accessed per iteration.  Unlike virtual-CPU wall time
    (interpret-mode Pallas + host oversubscription), these are properties
    of the compiled program itself — the honest scaling signal."""
    try:
        c = jax.jit(run, static_argnums=(1,)).lower(state, n).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {
            "gflops_per_it_per_shard": round(
                float(ca.get("flops", 0.0)) / n / 1e9, 4
            ),
            "mib_accessed_per_it_per_shard": round(
                float(ca.get("bytes accessed", 0.0)) / n / 2**20, 2
            ),
        }
    except Exception as e:  # cost analysis is best-effort
        return {"cost_analysis_error": str(e)[:80]}


def _halo_analysis(cfg, n_shards, envelope=None, mode="owner"):
    """Analytic per-shard ppermute payload bytes per coupled step."""
    X, Y, Z = (int(s) for s in cfg.shape)
    plane = Y * Z * 4  # one f32 x-plane
    if mode == "owner":
        E = int(envelope)
        n_perm = 0
        traffic = 0
        # spread deposit halo: two [3, E, Y, Z] adds
        traffic += 2 * 3 * E * plane
        n_perm += 2
        # interp velocity extension: two [3(+1), E, Y, Z]
        nch = 4 if np.asarray(cfg.flags).any() else 3
        traffic += 2 * nch * E * plane
        n_perm += 2
        # fluid f + force halo rows: [19,1,Y,Z] + [3,1,Y,Z] each way
        traffic += 2 * (19 + 3) * plane
        n_perm += 4
        if np.asarray(cfg.flags).any():
            traffic += 2 * plane // 4  # uint8 flags rows
            n_perm += 2
        if cfg.repulsion_constant > 0:
            # neighbour cell tables (idx/pos/alive) per type
            n_perm += 3 * len(cfg.types) * (1 if n_shards == 2 else 2)
        # migration buffers at resort cadence: [mcap, nv, 3] x 7 arrays
        n_perm += 2
        return traffic, n_perm
    # replicated shard_map: 1-row halos + full-[P] interp psum
    traffic = 2 * (19 + 3) * plane
    n_perm = 4
    if np.asarray(cfg.flags).any():
        traffic += 2 * plane // 4
        n_perm += 2
    # IBM collector row + psum of [P,4] interp values
    traffic += 2 * 3 * plane
    n_perm += 1
    return traffic, n_perm


def weak_scaling(shard_counts=(1, 2, 4, 8), xl=24, yz=24,
                 cells_per_shard=12, n=20):
    """Fixed per-shard work; owner vs replicated per-shard step time."""
    import dataclasses

    from hemocell_tpu.dynamics import build_runner
    from hemocell_tpu.parallel.owner_step import (
        build_owner_runner,
        suggest_envelope,
    )
    from hemocell_tpu.parallel.sharded_step import build_shardmap_runner
    from hemocell_tpu.parallel.sharding import make_mesh, shard_state
    from hemocell_tpu.presets import rbc_suspension

    rows = []
    for ns in shard_counts:
        X = xl * ns
        nc = cells_per_shard * ns
        cfg, state, _ = rbc_suspension(
            shape=(X, yz, yz), n_cells=nc,
            body_force=(1e-6, 0.0, 0.0), repulsion=False,
            particle_every=2, material_every=4,
        )
        P = sum(cs.pos.shape[0] * cs.pos.shape[1] for cs in state.cells)
        if ns == 1:
            run = build_runner(dataclasses.replace(cfg,
                                                   spread_mode="pallas"))
            dt, _ = _time(run, state, n)
            rows.append(dict(shards=1, mode="single", X=X, cells=nc,
                             verts=P, ms_per_it=dt * 1e3))
            continue
        mesh = make_mesh(ns)
        env = suggest_envelope(state.cells, resort_every=cfg.resort_every)
        st = shard_state(state, mesh)
        for mode, build in (
            ("owner", lambda: build_owner_runner(cfg, mesh, envelope=env)),
            ("replicated", lambda: build_shardmap_runner(cfg, mesh)),
        ):
            run = build()
            dt, out = _time(run, st, n)
            traffic, n_perm = _halo_analysis(
                cfg, ns, envelope=env, mode=mode
            )
            row = dict(shards=ns, mode=mode, X=X, cells=nc, verts=P,
                       ms_per_it=dt * 1e3,
                       halo_kib_per_step=round(traffic / 1024, 1),
                       ppermutes_per_step=n_perm,
                       **_per_shard_cost(run, st, n))
            if mode == "owner":
                ccap = max(
                    1, min(nc, int(np.ceil(nc * 2.0 / ns)) + 4)
                )
                row["owner_table_capacity"] = ccap
                row["owner_cells_per_shard"] = nc / ns
                row["envelope"] = env
            rows.append(row)
    return rows


def strong_scaling(shard_counts=(2, 4, 8), shape=(64, 24, 24),
                   n_cells=24, n=20):
    from hemocell_tpu.parallel.owner_step import (
        build_owner_runner,
        owner_supported,
        suggest_envelope,
    )
    from hemocell_tpu.parallel.sharded_step import build_shardmap_runner
    from hemocell_tpu.parallel.sharding import make_mesh, shard_state
    from hemocell_tpu.presets import rbc_suspension

    cfg, state, _ = rbc_suspension(
        shape=shape, n_cells=n_cells, body_force=(1e-6, 0.0, 0.0),
        repulsion=False, particle_every=2, material_every=4,
    )
    env = suggest_envelope(state.cells, resort_every=cfg.resort_every)
    rows = []
    for ns in shard_counts:
        if shape[0] % ns or shape[0] // ns < env:
            continue
        mesh = make_mesh(ns)
        st = shard_state(state, mesh)
        builders = [("replicated",
                     lambda: build_shardmap_runner(cfg, mesh))]
        if owner_supported(cfg, n_cells) and ns >= 2:
            builders.insert(
                0, ("owner",
                    lambda: build_owner_runner(cfg, mesh, envelope=env))
            )
        for mode, build in builders:
            dt, _ = _time(build(), st, n)
            rows.append(dict(shards=ns, mode=mode, shape=list(shape),
                             cells=n_cells, ms_per_it=dt * 1e3))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--weak", action="store_true")
    ap.add_argument("--strong", action="store_true")
    args = ap.parse_args()
    _ensure_devices(args.shards)
    backend = jax.default_backend()
    out = {"backend": backend, "n_iter": args.n,
           "note": ("virtual CPU devices: ratios across shard counts "
                    "within one runner are the signal, absolute ms are "
                    "not" if backend == "cpu" else "real devices")}
    counts = tuple(
        c for c in (1, 2, 4, 8) if c <= args.shards
    )
    if args.weak or not args.strong:
        out["weak"] = weak_scaling(shard_counts=counts, n=args.n)
    if args.strong or not args.weak:
        out["strong"] = strong_scaling(
            shard_counts=tuple(c for c in counts if c > 1), n=args.n
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
