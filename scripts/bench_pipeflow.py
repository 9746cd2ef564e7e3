"""Variant + ablation bench for the north-star pipeflow case on the real
tube.  Usage:

    python scripts/bench_pipeflow.py [n_iters] [--ablate]

Ablation stubs kernels via monkeypatching (jax.profiler.trace hangs through
the axon tunnel, so attribution is done by subtraction).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

from pipeflow import build_pipeflow  # noqa: E402

CFG = "/root/reference/examples/pipeflow/config.xml"


def bench(hc, n=50, repeats=4):
    hc.iterate(n)
    hc.block()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        hc.iterate(n)
        hc.block()
        best = min(best, time.perf_counter() - t0)
    return best / n


def report(name, hc, dt):
    nodes = hc.shape[0] * hc.shape[1] * hc.shape[2]
    print(
        f"{name:16s} shape={hc.shape} dt={dt*1e3:.3f} ms/iter "
        f"{nodes/dt/1e6:8.1f} MLUPS", flush=True,
    )


def run_variant(name, overrides=None, patch=None, no_cells=False):
    import hemocell_tpu.ibm.pallas_ibm as pibm

    saved = {}
    if patch:
        for attr, fn in patch.items():
            saved[attr] = getattr(pibm, attr)
            setattr(pibm, attr, fn)
    try:
        hc = build_pipeflow(CFG)
        if no_cells:
            # zero cells entirely: rebuild with empty states
            hc.cell_states = [
                cs._replace(
                    pos=cs.pos[:0], vel=cs.vel[:0], force=cs.force[:0],
                    force_repulsion=cs.force_repulsion[:0],
                    alive=cs.alive[:0],
                    restime=None if cs.restime is None else cs.restime[:0],
                    vel_prev=None if cs.vel_prev is None else cs.vel_prev[:0],
                    solidify=None if cs.solidify is None else cs.solidify[:0],
                )
                for cs in hc.cell_states
            ]
            hc._dirty = True
        for k, v in (overrides or {}).items():
            setattr(hc, k, v)
            hc._dirty = True
        dt = bench(hc)
        report(name, hc, dt)
    finally:
        for attr, fn in saved.items():
            setattr(pibm, attr, fn)


def main():
    ablate = "--ablate" in sys.argv

    run_variant("auto", {})
    run_variant("resort1", {"resort_every": 1})

    # isolate the SimState.ibm_overflow carry: strip the counter
    hc = build_pipeflow(CFG)
    hc.resort_every = 1
    hc._dirty = True
    _ = hc.state
    hc._state = hc._state._replace(ibm_overflow=None)
    dt = bench(hc)
    report("no-ovf", hc, dt)
    if not ablate:
        return
    run_variant("no-cells", no_cells=True)

    import hemocell_tpu.ibm.pallas_ibm as pibm

    real_spread = pibm.pallas_spread
    real_interp = pibm.pallas_interp
    real_plan = pibm.build_ibm_plan

    def stub_spread(pos, forces, shape, capacity=2048, interpret=None,
                    mask=None, plan=None, mm="f32"):
        return (
            jnp.zeros((3,) + tuple(shape), forces.dtype),
            jnp.zeros((), jnp.int32),
        )

    def stub_interp(pos, field, shape, capacity=2048, interpret=None,
                    plan=None, mm="f32"):
        nf = field.shape[0]
        return (
            jnp.zeros((pos.shape[0], nf), field.dtype),
            jnp.zeros((), jnp.int32),
        )

    run_variant(
        "no-spread", {"resort_every": 1},
        patch={"pallas_spread": stub_spread},
    )
    run_variant(
        "no-interp", {"resort_every": 1},
        patch={"pallas_interp": stub_interp},
    )
    run_variant(
        "no-ibm", {"resort_every": 1},
        patch={"pallas_spread": stub_spread, "pallas_interp": stub_interp},
    )

    def stub_plan(pos, shape, capacity, payload=None, subdiv=1):
        # skip the sort: identity order (physics wrong, timing right)
        P = pos.shape[0]
        X = int(shape[0])
        from hemocell_tpu.ibm.pallas_ibm import SUBDIV
        sd = subdiv
        starts = jnp.zeros(X * sd + 1, jnp.int32)
        order = jnp.arange(P, dtype=jnp.int32)
        pos_cm = jnp.zeros((4, P + capacity), pos.dtype)
        payload_cm = jnp.zeros((4, P + capacity), pos.dtype)
        return pibm.IbmPlanT(
            starts, pos_cm, order, order, jnp.zeros((), jnp.int32),
            payload_cm,
        )

    run_variant(
        "no-sort", {"resort_every": 1},
        patch={"build_ibm_plan": stub_plan},
    )


if __name__ == "__main__":
    main()
