"""Fluid-kernel-only timing probe across tube-like shapes (chip).

Isolates stream_collide_pallas in a chained in-jit loop to see how shape
padding / fold / walls affect the kernel rate, independent of the step
machinery.  Usage: python scripts/probe_fluid_shapes.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.fluid.pallas_lbm import fold_field, stream_collide_pallas


def tube_flags(shape, r=None):
    X, Y, Z = shape
    yy, zz = np.meshgrid(np.arange(Y), np.arange(Z), indexing="ij")
    r = r if r is not None else (min(Y, Z) - 2) / 2
    r2 = (yy - (Y - 1) / 2) ** 2 + (zz - (Z - 1) / 2) ** 2
    wall2d = r2 > r * r
    return np.broadcast_to(
        np.where(wall2d[None], FLAG_WALL, 0).astype(np.uint8), shape
    ).copy()


def probe(shape, fold, walls=True, n=100):
    X, Y, Z = shape
    flags = tube_flags(shape) if walls else np.zeros(shape, np.uint8)
    f = jnp.zeros((19, X, Y, Z), jnp.float32)
    force = jnp.zeros((3, X, Y, Z), jnp.float32)
    flags_d = jnp.asarray(flags)
    if fold > 1:
        f = fold_field(f, fold)
        force = fold_field(force, fold)
        flags_d = fold_field(flags_d, fold)

    @jax.jit
    def loop(f):
        def body(_, f):
            return stream_collide_pallas(
                f, force, 1.1, flags_d, fold=fold
            )
        return jax.lax.fori_loop(0, n, body, f)

    out = jax.block_until_ready(loop(f))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(out))
        best = min(best, time.perf_counter() - t0)
    dt = best / n
    nodes = X * Y * Z
    print(
        f"shape={shape} fold={fold} walls={int(walls)}: "
        f"{dt*1e3:7.3f} ms/iter {nodes/dt/1e6:8.1f} MLUPS", flush=True,
    )


if __name__ == "__main__":
    probe((104, 53, 53), 2)
    probe((104, 53, 53), 1)
    probe((104, 56, 64), 2)
    probe((104, 64, 64), 2)
    probe((104, 56, 128), 1)
    probe((128, 64, 64), 2)
    probe((104, 53, 53), 2, walls=False)
    probe((128, 128, 128), 1, walls=False)
