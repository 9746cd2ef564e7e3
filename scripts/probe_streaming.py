"""Measure this chip's real streaming envelope: raw XLA elementwise
bandwidth vs Pallas grid-copy bandwidth across block structures.

Motivation: the fused stream-collide kernel ablates to pure-copy cost
(scripts/probe_roofline.py), so the only remaining lever is the streaming
itself.  This probe answers "how fast can this machine stream at all?"
for (a) XLA's own elementwise pipeline, (b) XLA's roll (the stream
pattern), and (c) Pallas pallas_call copies over every plausible block
structure (flat row-blocks, the kernel's [19,tx,Y,Z] x-slabs, per-
direction (q,x) grids).

Measured 2026-08-19 on the v5e chip (relay-attached), 19*128^3 f32:

    xla eltwise (3 layouts)      305-323 GB/s   <- machine XLA envelope
    xla roll-y                   211 GB/s
    pallas copies (all shapes)   205-219 GB/s   <- Pallas DMA plateau
    production kernel            ~200 GB/s effective (95% of plateau)

Conclusion: the Pallas DMA path caps ~1.5x under XLA's elementwise
streaming on this part, is insensitive to block shape, and the production
kernel sits at 92-96% of that plateau — streaming-bound, not compute- or
structure-bound.  (Reference hot loop analog: collideAndStream,
/root/reference/core/hemoCell.cpp:317.)

Usage: timeout 900 python scripts/probe_streaming.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench(fn, x, n=50):
    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(0, n, lambda i, xx: fn(xx), x0)

    # chain state + host-fetch a scalar: the axon relay caches identical-
    # input executions and block_until_ready alone does not wait for
    # remote completion (see scripts/probe_roofline.py)
    y = loop(x)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    y = loop(y)
    float(jnp.sum(y))
    return (time.perf_counter() - t0) / n


def main():
    N = 19 * 128 * 128 * 128
    nbytes = N * 4

    print(f"backend={jax.default_backend()}", flush=True)
    print("-- raw XLA streaming --", flush=True)
    shapes = [
        ((19, 128, 128, 128), "f19  "),
        ((128 * 19, 128, 128), "flat3"),
        ((19 * 128 * 128, 128), "mat2 "),
    ]
    for shape, name in shapes:
        x = jnp.ones(shape, jnp.float32) * 1e-3
        dt = bench(lambda a: a * 1.000001 + 1e-9, x)
        print(f"  {name} eltwise: {dt * 1e3:7.3f} ms  "
              f"{2 * nbytes / dt / 1e9:4.0f} GB/s", flush=True)
    x = jnp.ones((19, 128, 128, 128), jnp.float32)
    dt = bench(lambda a: jnp.roll(a, 1, axis=2) * 1.000001, x)
    print(f"  roll-y       : {dt * 1e3:7.3f} ms  "
          f"{2 * nbytes / dt / 1e9:4.0f} GB/s", flush=True)

    print("-- Pallas grid copies --", flush=True)

    def pallas_copy(x, block_rows):
        def k(i_ref, o_ref):
            o_ref[:] = i_ref[:] * 1.000001

        spec = pl.BlockSpec((block_rows, x.shape[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k, grid=(x.shape[0] // block_rows,),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(x)

    x2 = jnp.ones((N // 128, 128), jnp.float32)
    for br in (512, 2048, 8192, 19456, 38912):
        dt = bench(functools.partial(pallas_copy, block_rows=br), x2)
        print(f"  flat [{br:5d},128] : {dt * 1e3:7.3f} ms  "
              f"{2 * nbytes / dt / 1e9:4.0f} GB/s", flush=True)

    def pallas_copy4(x, tx, per_q):
        def k(i_ref, o_ref):
            o_ref[:] = i_ref[:] * 1.000001

        if per_q:
            grid = (19, 128 // tx)
            spec = pl.BlockSpec((1, tx, 128, 128),
                                lambda q, i: (q, i, 0, 0),
                                memory_space=pltpu.VMEM)
        else:
            grid = (128 // tx,)
            spec = pl.BlockSpec((19, tx, 128, 128),
                                lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k, grid=grid, in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(x)

    x4 = jnp.ones((19, 128, 128, 128), jnp.float32)
    for tx in (2, 4, 8, 16):
        dt = bench(functools.partial(pallas_copy4, tx=tx, per_q=False), x4)
        print(f"  [19,{tx:2d},128,128]  : {dt * 1e3:7.3f} ms  "
              f"{2 * nbytes / dt / 1e9:4.0f} GB/s", flush=True)
    for tx in (8, 32):
        dt = bench(functools.partial(pallas_copy4, tx=tx, per_q=True), x4)
        print(f"  q-grid [1,{tx:2d},..] : {dt * 1e3:7.3f} ms  "
              f"{2 * nbytes / dt / 1e9:4.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
