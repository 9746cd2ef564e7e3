"""On-chip A/B: k-step fused fluid kernel, k in {2, 3, 4}.

The 2x kernel matched its HBM-traffic model exactly (1.82-1.86x over
one-pass; docs/PERFORMANCE.md "2x kernel A/B"), which predicts further
wins for deeper fusion: at tx=8 the per-step traffic is 23.75 (k=2),
17.42 (k=3), 14.25 (k=4) row-channels — IF the k collides over the
(tx+2k)-row extended slab stay hidden under the DMA.  This probe times
each k (with a tx sweep) on identical state; the winner becomes
dynamics.build_runner's pure-fluid default.

Reference hot loop: lattice->collideAndStream(), core/hemoCell.cpp:317.

Usage: timeout 1800 python scripts/probe_kx_ab.py [--quick]
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

from hemocell_tpu.fluid.pallas_lbm_2x import (
    _pick_tx_2x,
    stream_collide_pallas_2x,
)
from hemocell_tpu.fluid.pallas_lbm_kx import (
    pick_tx_kx,
    stream_collide_pallas_kx,
)


def bench(loop, f, n_lbm_steps, repeats=3):
    # chain state across repeats + host FETCH to sync; large n so the
    # relay's ~25 ms per-dispatch overhead amortises to <0.1 ms/step
    # (docs/PERFORMANCE.md "Timing methodology")
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
    n = 120 if args.quick else 600  # LBM steps per timed loop (lcm-friendly)
    omega = 1.1
    force = jnp.asarray([1e-7, 0.0, 0.0], jnp.float32)
    print(f"backend={jax.default_backend()}", flush=True)

    for shape in ((128, 128, 128), (256, 128, 128)):
        X, Y, Z = shape
        key = jax.random.PRNGKey(0)
        f = jax.random.uniform(key, (19, X, Y, Z), jnp.float32, -1e-3, 1e-3)
        sites = X * Y * Z

        tx2 = _pick_tx_2x(X, Y, Z, 19)

        @jax.jit
        def loop2(f0):
            return jax.lax.fori_loop(
                0, n // 2,
                lambda i, ff: stream_collide_pallas_2x(
                    ff, force, omega, None, tx=tx2 or None),
                f0)

        dt2 = bench(loop2, f, n)
        print(f"  shape={shape}", flush=True)
        print(f"    2x (tx={tx2})    {dt2 * 1e3:7.3f} ms/step  "
              f"{sites / dt2 / 1e9:5.2f} GLUPS", flush=True)

        overall = ("2x", tx2, dt2)
        for k in (3, 4):
            txa = pick_tx_kx(X, Y, Z, 19, k)
            best = (None, float("inf"))
            for tx in sorted({txa, 2, 4, 8, 16} - {0, None}):
                if X % tx:
                    continue

                @jax.jit
                def loopk(f0, k=k, tx=tx):
                    return jax.lax.fori_loop(
                        0, n // k,
                        lambda i, ff: stream_collide_pallas_kx(
                            ff, force, omega, None, k=k, tx=tx),
                        f0)

                try:
                    dtk = bench(loopk, f, n)
                except Exception as e:  # VMEM OOM etc.
                    print(f"    {k}x tx={tx}: failed "
                          f"({type(e).__name__})", flush=True)
                    continue
                mark = " <- auto-pick" if tx == txa else ""
                print(f"    {k}x tx={tx:<3d}     {dtk * 1e3:7.3f} ms/step  "
                      f"{sites / dtk / 1e9:5.2f} GLUPS{mark}", flush=True)
                if dtk < best[1]:
                    best = (tx, dtk)
            if best[0] is not None:
                verdict = "WIN" if best[1] < dt2 else "LOSS"
                print(f"    best {k}x: tx={best[0]} "
                      f"{best[1] * 1e3:.3f} ms/step "
                      f"({verdict} {dt2 / best[1]:4.2f}x vs 2x)", flush=True)
                if best[1] < overall[2]:
                    overall = (f"{k}x", best[0], best[1])
        print(f"    OVERALL best: {overall[0]} tx={overall[1]} "
              f"{overall[2] * 1e3:.3f} ms/step "
              f"{sites / overall[2] / 1e9:5.2f} GLUPS", flush=True)


if __name__ == "__main__":
    main()
