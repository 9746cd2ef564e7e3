"""One-shot perf sweep to run on the real TPU chip after changes.

Collects, in one serialized chip session (chip jobs must never overlap):
  1. bench.py equivalents (64^3 / 128^3 coupled, fluid-only, pipeflow)
  2. fluid kernel tx sweep at 128^3 (no-flags SMEM-force fast path)
  3. resort_every sweep on the 64^3 suspension (sort-plan amortisation)
  4. per-phase breakdown of the 64^3 suspension + pipeflow (profile_phases)

Usage:  timeout 1800 python scripts/chip_sweep.py [--quick]
Prints one JSON line per section; paste the numbers into
docs/PERFORMANCE.md after a run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def best_of(fn, repeats=4):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def fluid_tx_sweep(shape=(128, 128, 128), txs=(2, 4, 8, 16), n=50):
    """Kernel-only MLUPS per tx on the no-flags SMEM-force fast path."""
    from hemocell_tpu.fluid import lbm
    from hemocell_tpu.fluid.pallas_lbm import stream_collide_pallas

    X, Y, Z = shape
    rho = jnp.ones(shape, jnp.float32)
    u = jnp.zeros((3,) + shape, jnp.float32)
    f0 = lbm.equilibrium_dev(rho, u)
    bf = jnp.asarray([5e-7, 0.0, 0.0], jnp.float32)
    out = {}
    for tx in txs:
        if X % tx:
            continue

        @jax.jit
        def loop(f, tx=tx):
            def body(_, ff):
                return stream_collide_pallas(ff, bf, 0.9, None, tx=tx,
                                             interpret=False)
            return jax.lax.fori_loop(0, n, body, f)

        try:
            jax.block_until_ready(loop(f0))  # compile
            dt = best_of(lambda: jax.block_until_ready(loop(f0)))
            out[f"tx={tx}"] = round(X * Y * Z * n / dt / 1e6, 1)
        except Exception as e:
            out[f"tx={tx}"] = f"ERROR {str(e)[:120]}"
    # default pick for reference
    @jax.jit
    def loop_def(f):
        def body(_, ff):
            return stream_collide_pallas(ff, bf, 0.9, None, interpret=False)
        return jax.lax.fori_loop(0, n, body, f)

    jax.block_until_ready(loop_def(f0))
    dt = best_of(lambda: jax.block_until_ready(loop_def(f0)))
    out["tx=auto"] = round(X * Y * Z * n / dt / 1e6, 1)
    return out


def resort_sweep(values=(4, 8, 16, 32), n=50):
    from hemocell_tpu.dynamics import build_runner
    from hemocell_tpu.presets import rbc_suspension

    out = {}
    for rs in values:
        cfg, state, meta = rbc_suspension(
            shape=(64, 64, 64), n_cells=109, body_force=(5e-7, 0, 0),
            particle_every=5, material_every=20, repulsion=False,
            resort_every=rs,
        )
        runner = build_runner(cfg)
        state = runner(state, 1)
        jax.block_until_ready(state)
        dt = best_of(lambda: jax.block_until_ready(runner(state, n)))
        out[f"resort={rs}"] = round(64 ** 3 * n / dt / 1e6, 1)
    return out


def phase_profiles(quick=False):
    from hemocell_tpu.presets import rbc_suspension
    from hemocell_tpu import HemoCell

    out = {}
    # pipeflow phases via the facade
    pipeflow_cfg = "/root/reference/examples/pipeflow/config.xml"
    if os.path.exists(pipeflow_cfg):
        from pipeflow import build_pipeflow

        hc = build_pipeflow(pipeflow_cfg)
        out["pipeflow"] = hc.profile_phases(n=20 if quick else 50)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["bench", "tx", "resort", "phases"])
    args = ap.parse_args()

    print(json.dumps({"platform": jax.devices()[0].platform}))

    if "tx" not in args.skip:
        print(json.dumps({"fluid_tx_sweep_128": fluid_tx_sweep()}))
        print(json.dumps({
            "fluid_tx_sweep_256x128x128": fluid_tx_sweep((256, 128, 128))
        }))

    if "resort" not in args.skip:
        print(json.dumps({"resort_sweep_64": resort_sweep()}))

    if "phases" not in args.skip:
        try:
            print(json.dumps({"phases": phase_profiles(args.quick)}))
        except Exception as e:
            print(json.dumps({"phases_error": str(e)[:200]}))

    if "bench" not in args.skip:
        import subprocess

        r = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo",
                           capture_output=True, text=True, timeout=1500)
        print(r.stdout.strip().splitlines()[-1] if r.stdout.strip() else
              json.dumps({"bench_error": r.stderr[-200:]}))


if __name__ == "__main__":
    main()
