"""Component ablation of the fused stream-collide kernel on the real chip.

The kernel reads ~190 B/site at 128^3 (uniform-force fast path) — an HBM
roofline of ~4.3 GLUPS at 820 GB/s — yet measures ~1.05 GLUPS.  This probe
separates the three candidate costs:

  copy      same grid/BlockSpec structure, kernel body = out[:] = body[:]
            -> achievable streaming GB/s for this access pattern
  copy3     same, but also reading the 2 halo-row operands (DMA overhead)
  collide   BGK+Guo+moments on the body block, NO pull/rolls
  pull      3-region read + the 24 Y/Z pltpu.rolls + seam stores, NO collide
  full      stream_collide_pallas (production kernel)

If copy ~ full, the kernel is bandwidth-bound and only layout changes help.
If collide or pull dominate, that's the VPU bottleneck to attack
(fewer-roll pull scheme / skip halo-row collide for unneeded directions).

Usage: timeout 1800 python scripts/probe_roofline.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the env var alone does not stick on this box (sitecustomize re-pins
    # the axon backend); pin explicitly for tunnel-down smoke runs
    jax.config.update("jax_platforms", "cpu")

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hemocell_tpu.fluid import d3q19
from hemocell_tpu.fluid.pallas_lbm import (
    _collide_local,
    _pick_tx,
    stream_collide_pallas,
)

_C = d3q19.C


def _specs(Q, X, Y, Z, tx, three_region):
    V = pltpu.VMEM

    def body4(i):
        return (0, i, 0, 0)

    def lo4(i):
        return (0, (i * tx - 1) % X, 0, 0)

    def hi4(i):
        return (0, ((i + 1) * tx) % X, 0, 0)

    if three_region:
        in_specs = [
            pl.BlockSpec((Q, 1, Y, Z), lo4, memory_space=V),
            pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V),
            pl.BlockSpec((Q, 1, Y, Z), hi4, memory_space=V),
        ]
    else:
        in_specs = [pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V)]
    out_spec = pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V)
    return in_specs, out_spec


def _build(mode, X, Y, Z, tx, omega):
    """Return a jitted f -> f' ablation step."""
    Q = 19
    three = mode in ("copy3", "pull")

    def kernel(*refs):
        if three:
            f_lo, f_body, f_hi, out = refs
        else:
            f_body, out = refs
        if mode == "copy":
            out[:] = f_body[:]
            return
        if mode == "copy3":
            out[:] = f_body[:] + f_lo[:] + f_hi[:]
            return
        if mode == "collide":
            post = _collide_local(
                f_body[:], (1e-7, 0.0, 0.0), omega, None, None
            )
            for q in range(Q):
                out[q] = post[q]
            return
        # mode == "pull": x-shift via the halo regions + Y/Z rolls, no
        # collide (post == raw f)
        post_b = [f_body[q] for q in range(Q)]
        post_l = [f_lo[q] for q in range(Q)]
        post_h = [f_hi[q] for q in range(Q)]
        for q in range(Q):
            cx, cy, cz = int(_C[q, 0]), int(_C[q, 1]), int(_C[q, 2])

            def rollyz(src):
                ny, nz = src.shape[1], src.shape[2]
                if cy:
                    src = pltpu.roll(src, shift=cy % ny, axis=1)
                if cz:
                    src = pltpu.roll(src, shift=cz % nz, axis=2)
                return src

            if cx == 0:
                out[q] = rollyz(post_b[q])
            elif cx == 1:
                out[q, 0:1] = rollyz(post_l[q])
                if tx > 1:
                    out[q, 1:tx] = rollyz(post_b[q][0 : tx - 1])
            else:
                if tx > 1:
                    out[q, 0 : tx - 1] = rollyz(post_b[q][1:tx])
                out[q, tx - 1 : tx] = rollyz(post_h[q])

    in_specs, out_spec = _specs(Q, X, Y, Z, tx, three)

    interpret = jax.default_backend() == "cpu"

    @jax.jit
    def step(f):
        args = (f, f, f) if three else (f,)
        return pl.pallas_call(
            kernel,
            grid=(X // tx,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Q, X, Y, Z), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20,
            ),
            interpret=interpret,
        )(*args)

    return step


def bench(step, f, n, repeats=3):
    @jax.jit
    def loop(f0):
        return jax.lax.fori_loop(0, n, lambda i, ff: step(ff), f0)

    # chain the state across repeats: the axon relay caches identical-input
    # executions, so re-timing loop(f) with the same f returns instantly
    # and reads as a bogus ~0 ms.  Feeding each repeat the previous output
    # defeats the cache.  Synchronise with a host FETCH (float(sum)) —
    # block_until_ready alone does not wait for relay execution of these
    # ablation programs (measured: "copy" read 0.002 ms/it with
    # block_until_ready vs the true 1.59 ms with a fetch).
    f = loop(f)
    float(jnp.sum(f))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        f = loop(f)
        float(jnp.sum(f))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--shape", type=int, nargs=3, default=(128, 128, 128))
    args = ap.parse_args()
    X, Y, Z = args.shape
    n = 20 if args.quick else 50
    omega = 1.1
    tx = _pick_tx(X, Y, Z, 19)
    print(f"backend={jax.default_backend()} shape={args.shape} tx={tx}",
          flush=True)
    key = jax.random.PRNGKey(0)
    f = jax.random.uniform(key, (19, X, Y, Z), jnp.float32, -1e-3, 1e-3)
    sites = X * Y * Z

    rows = []
    for mode in ("copy", "copy3", "collide", "pull"):
        step = _build(mode, X, Y, Z, tx, omega)
        dt = bench(step, f, n)
        # bytes: copy reads 19 + writes 19; copy3/pull add 2 halo rows
        amp = (tx + 2) / tx if mode in ("copy3", "pull") else 1.0
        gbs = (19 * amp + 19) * 4 * sites / dt / 1e9
        rows.append((mode, dt, gbs))
        print(f"  {mode:8s} {dt * 1e3:7.3f} ms/it  {sites / dt / 1e9:5.2f} "
              f"GLUPS  ~{gbs:5.0f} GB/s", flush=True)

    force = jnp.asarray([1e-7, 0.0, 0.0], jnp.float32)

    @jax.jit
    def full(ff):
        return stream_collide_pallas(ff, force, omega, None, tx=tx)

    dt = bench(full, f, n)
    gbs = (19 * (tx + 2) / tx + 19) * 4 * sites / dt / 1e9
    print(f"  {'full':8s} {dt * 1e3:7.3f} ms/it  {sites / dt / 1e9:5.2f} "
          f"GLUPS  ~{gbs:5.0f} GB/s", flush=True)
    print("interpretation: full ~= copy -> HBM-bound; "
          "full ~= collide+pull-copy3 -> VPU-bound", flush=True)


if __name__ == "__main__":
    main()
