#!/usr/bin/env python3
"""weak_scaling: throughput sweep over domain sizes + virtual-mesh scaling.

Analog of the reference's cases/performance_testing weak-scaling harness
(256^3 per rank over 1..2048 MPI ranks): on TPU the scaling axis is chips in
a `jax.sharding.Mesh`.  With one physical chip, this script provides

  * a single-chip size sweep (MLUPS vs lattice size) on the real device, and
  * a virtual-device weak-scaling check (--virtual N) that runs the sharded
    coupled step over N host-platform devices, validating the multi-chip
    program (compile + collectives) that real pods would execute.

Usage:
  python tools/weak_scaling.py                 # size sweep on the device
  python tools/weak_scaling.py --virtual 8     # 8-virtual-device weak run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def size_sweep(sizes, n_iter=50):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hemocell_tpu.dynamics import build_runner
    from hemocell_tpu.presets import rbc_suspension

    results = []
    for s in sizes:
        n_cells = max(1, int(0.27 * s**3 / 721))
        cfg, state, meta = rbc_suspension(
            shape=(s, s, s), n_cells=n_cells, body_force=(5e-7, 0, 0),
            repulsion=False, particle_every=5, material_every=20,
        )
        run = build_runner(cfg)
        state = run(state, n_iter)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        state = run(state, n_iter)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        mlups = s**3 * n_iter / dt / 1e6
        results.append(
            {"size": s, "cells": meta["n_cells"], "mlups": round(mlups, 2),
             "ms_per_iter": round(dt / n_iter * 1e3, 3)}
        )
        print(json.dumps(results[-1]), flush=True)
    return results


def virtual_weak(n_devices, per_device_x=16, n_iter=5):
    import jax

    jax.config.update("jax_num_cpu_devices", n_devices)
    jax.config.update("jax_platforms", "cpu")
    from hemocell_tpu.parallel import (
        build_shardmap_runner,
        build_sharded_runner,
        make_mesh,
        shard_state,
    )
    from hemocell_tpu.presets import rbc_suspension

    X = per_device_x * n_devices
    cfg, state, meta = rbc_suspension(
        shape=(X, 16, 16), n_cells=max(1, n_devices // 2),
        body_force=(1e-6, 0, 0), repulsion=False,
    )
    mesh = make_mesh(n_devices, axes=("x",))
    for label, build in (("shard_map", build_shardmap_runner),
                         ("gspmd", build_sharded_runner)):
        sstate = shard_state(state, mesh)
        run = build(cfg, mesh)
        out = run(sstate, n_iter)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(out, n_iter)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "runner": label,
                    "devices": n_devices,
                    "shape": [X, 16, 16],
                    "iters": n_iter,
                    "wall_s": round(dt, 3),
                    "note": "virtual CPU mesh — validates the multi-chip "
                            "program",
                }
            ),
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[32, 48, 64, 96, 128])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--virtual", type=int, default=0)
    args = ap.parse_args()
    if args.virtual:
        virtual_weak(args.virtual)
    else:
        size_sweep(args.sizes, args.iters)


if __name__ == "__main__":
    main()
