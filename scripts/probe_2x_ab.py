"""On-chip A/B: one-pass vs two-step fused fluid kernel.

VERDICT r03 flagged that fluid/pallas_lbm_2x.py shipped default-on with no
on-chip measurement, and BENCH_r03's fluid_only_mlups (1219 = 1.72 ms/it at
128^3) reads SLOWER than the one-pass kernel's own roofline row (1.531
ms/it).  This probe settles it: time N one-pass steps vs N/2 two-step calls
on identical state, per shape, and report per-LBM-step ms for both.  The
result decides dynamics.build_runner's default (see docs/PERFORMANCE.md
"2x kernel A/B").

Reference hot loop: lattice->collideAndStream(), core/hemoCell.cpp:317.

Usage: timeout 1800 python scripts/probe_2x_ab.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from hemocell_tpu.fluid.pallas_lbm import _pick_tx, stream_collide_pallas
from hemocell_tpu.fluid.pallas_lbm_2x import _pick_tx_2x, stream_collide_pallas_2x


def bench(loop, f, n_lbm_steps, repeats=3):
    # chain state across repeats + host FETCH to sync (block_until_ready
    # does not await relay execution; see probe_roofline.py).  n_lbm_steps
    # must be large (>=200): the relay adds ~25 ms of per-DISPATCH
    # overhead, which inflates a 50-step loop by ~0.5 ms/step
    # (docs/PERFORMANCE.md "Timing methodology").
    f = loop(f)
    float(jnp.sum(f))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        f = loop(f)
        float(jnp.sum(f))
        best = min(best, time.perf_counter() - t0)
    return best / n_lbm_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n = 100 if args.quick else 500  # LBM steps per timed loop (even)
    omega = 1.1
    force = jnp.asarray([1e-7, 0.0, 0.0], jnp.float32)
    print(f"backend={jax.default_backend()}", flush=True)

    for shape in ((128, 128, 128), (256, 128, 128)):
        X, Y, Z = shape
        tx1 = _pick_tx(X, Y, Z, 19)
        tx2 = _pick_tx_2x(X, Y, Z, 19)
        key = jax.random.PRNGKey(0)
        f = jax.random.uniform(key, (19, X, Y, Z), jnp.float32, -1e-3, 1e-3)
        sites = X * Y * Z

        @jax.jit
        def loop1(f0):
            return jax.lax.fori_loop(
                0, n,
                lambda i, ff: stream_collide_pallas(ff, force, omega, None,
                                                    tx=tx1),
                f0)

        @jax.jit
        def loop2(f0):
            return jax.lax.fori_loop(
                0, n // 2,
                lambda i, ff: stream_collide_pallas_2x(ff, force, omega,
                                                       None, tx=tx2 or None),
                f0)

        dt1 = bench(loop1, f, n)
        dt2 = bench(loop2, f, n)
        print(f"  shape={shape} tx1={tx1} tx2={tx2}", flush=True)
        print(f"    one-pass {dt1 * 1e3:7.3f} ms/step  "
              f"{sites / dt1 / 1e9:5.2f} GLUPS", flush=True)
        print(f"    2x-fused {dt2 * 1e3:7.3f} ms/step  "
              f"{sites / dt2 / 1e9:5.2f} GLUPS  "
              f"({'WIN' if dt2 < dt1 else 'LOSS'} "
              f"{dt1 / dt2:4.2f}x)", flush=True)

        # also try a tx sweep for 2x to rule out a bad auto-pick
        best = (tx2, dt2)
        for tx in (1, 2, 4, 8):
            if X % tx or tx == tx2:
                continue

            @jax.jit
            def loopt(f0, tx=tx):
                return jax.lax.fori_loop(
                    0, n // 2,
                    lambda i, ff: stream_collide_pallas_2x(
                        ff, force, omega, None, tx=tx),
                    f0)

            try:
                dtt = bench(loopt, f, n)
            except Exception as e:  # VMEM OOM etc.
                print(f"    2x tx={tx}: failed ({type(e).__name__})",
                      flush=True)
                continue
            print(f"    2x tx={tx} {dtt * 1e3:7.3f} ms/step  "
                  f"{sites / dtt / 1e9:5.2f} GLUPS", flush=True)
            if dtt < best[1]:
                best = (tx, dtt)
        print(f"    best 2x: tx={best[0]} {best[1] * 1e3:.3f} ms/step "
              f"vs one-pass {dt1 * 1e3:.3f}", flush=True)


if __name__ == "__main__":
    main()
