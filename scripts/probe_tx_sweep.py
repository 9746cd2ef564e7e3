"""Sweep the stream-collide slab height ``tx`` on the real chip.

Hypothesis (docs/PERFORMANCE.md roofline section): at 128^3 the default
VMEM budget picks tx=1, so every program re-reads 2 halo rows per body row
— a 3x read amplification on f (352 B/site instead of ~168).  Larger tx
amortises the halo to (tx+2)/tx.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.pallas_lbm import _pick_tx, stream_collide_pallas


def bench_shape(shape, txs, n=50, mode="field"):
    """mode: 'field' = [3,X,Y,Z] force + flags operands (coupled-step
    shape), 'uniform' = [3] SMEM force + no flags (fluid-only fast
    path)."""
    X, Y, Z = shape
    key = jax.random.PRNGKey(0)
    f = jax.random.uniform(key, (19, X, Y, Z), jnp.float32, -1e-3, 1e-3)
    if mode == "field":
        force = jnp.zeros((3, X, Y, Z), jnp.float32)
        flags = jnp.zeros((X, Y, Z), jnp.uint8)
        c_in = 23
    else:
        force = jnp.asarray([1e-7, 0.0, 0.0], jnp.float32)
        flags = None
        c_in = 19
    omega = 1.1
    ref = None
    print(f"shape={shape} mode={mode} default tx="
          f"{_pick_tx(X, Y, Z, c_in)}", flush=True)
    for tx in txs:
        if X % tx:
            continue

        @jax.jit
        def loop(f0, tx=tx):
            def body(i, ff):
                return stream_collide_pallas(ff, force, omega, flags, tx=tx)

            return jax.lax.fori_loop(0, n, body, f0)

        try:
            out = jax.block_until_ready(loop(f))
        except Exception as e:
            print(f"  tx={tx:4d}  FAIL {str(e)[:120]}", flush=True)
            continue
        if ref is None:
            ref = out
        else:
            err = float(jnp.abs(out - ref).max())
            assert err < 1e-5, (tx, err)
        # chain state across repeats: the axon relay caches identical-input
        # executions (see scripts/probe_roofline.py), so re-timing loop(f)
        # with the same f can return instantly and inflate MLUPS
        ff = out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ff = loop(ff)
            jax.block_until_ready(ff)
            best = min(best, time.perf_counter() - t0)
        mlups = X * Y * Z * n / best / 1e6
        gbs = mlups * 1e6 * (19 + c_in) * 4 / 1e9
        print(f"  tx={tx:4d}  {mlups:8.1f} MLUPS  ~{gbs:5.0f} GB/s eff",
              flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    bench_shape((128, 128, 128), [1, 2, 4, 8, 16, 32])
    bench_shape((128, 128, 128), [1, 2, 4, 8, 16, 32], mode="uniform")
    bench_shape((256, 128, 128), [1, 2, 4, 8, 16, 32])
    bench_shape((256, 128, 128), [1, 2, 4, 8, 16, 32], mode="uniform")
