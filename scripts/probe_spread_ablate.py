"""On-chip component ablation of the IBM spread kernel.

After the r04 wall-hit fix, spreadParticleForce is the dominant
pipeflow30 phase (~1.0 of 2.44 ms/it, docs/PERFORMANCE.md per-phase
table).  This probe splits the shadow spread call into cumulative
component costs on a synthetic pipeflow30-class workload (248x56x56
tube, ~335k vertices, shadow windows SUBDIV/EXTRA):

    sort     build_ibm_plan (the amortised resort, for scale)
    dma      window DMAs + chunk loop, no compute
    onehot   + Sy/Szf one-hot construction (no matmuls)
    mm       + the [3Y,CH]@[CH,2Z] deposit contraction (no renorm)
    renorm   + the fluid-weight total dot + divide (== production)
    prod     the production pallas_spread_shadow(mask=...) call
    prod-bf16  production with mm='bf16'
    interp   pallas_interp_shadow (for comparison)

Whatever dominates (onehot-dma vs mm-onehot vs renorm-mm) is the
optimization target.  Reference: spreadParticleForce is one phase of
the reference profiler (helper/profiler.cpp:138-180); the kernel
itself replaces immersedBoundaryMethod.h:62-138's per-vertex stencil.

Usage: timeout 1800 python scripts/probe_spread_ablate.py [--quick]
"""

import argparse
import functools
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hemocell_tpu.ibm.pallas_ibm import (
    EXTRA,
    SUBDIV,
    _pick_chunk,
    _prefetched_window,
    _window_bounds,
    _window_weights,
    build_ibm_plan,
    pallas_interp_shadow,
    pallas_spread_shadow,
    slab_capacity,
)

X, Y, Z = 248, 56, 56
INTERP = jax.default_backend() == "cpu"


def make_workload(p_target=335_000, seed=0):
    rng = np.random.default_rng(seed)
    R = Y / 2 - 2.5
    n = 0
    pts = []
    while n < p_target:
        cand = rng.uniform(0, 1, (p_target, 3))
        cand[:, 0] *= X
        cand[:, 1] = cand[:, 1] * Y
        cand[:, 2] = cand[:, 2] * Z
        r2 = (cand[:, 1] - Y / 2) ** 2 + (cand[:, 2] - Z / 2) ** 2
        keep = cand[r2 < R * R]
        pts.append(keep)
        n += len(keep)
    pos = np.concatenate(pts)[:p_target].astype(np.float32)
    P_pad = -(-p_target // 512) * 512
    pos = np.pad(pos, ((0, P_pad - p_target), (0, 0)), constant_values=0.5)
    F = rng.normal(0, 1e-4, (P_pad, 3)).astype(np.float32)
    yy, zz = np.meshgrid(np.arange(Y), np.arange(Z), indexing="ij")
    wall = ((yy - Y / 2) ** 2 + (zz - Z / 2) ** 2) >= R * R
    mask = np.broadcast_to(~wall, (X, Y, Z)).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(F), jnp.asarray(mask)


def variant_kernel(level, C, CH, starts_ref, pos_hbm, F_hbm, m_lo, m_hi,
                   out_pair, pos_v2, F_v2, sem_p, sem_f):
    g = pl.program_id(0) - 1
    al, nch = _window_bounds(starts_ref, g, X, SUBDIV, EXTRA, C, CH)
    pos_v, F_v = _prefetched_window(
        starts_ref, X, SUBDIV, EXTRA, C,
        (pos_hbm, F_hbm), (pos_v2, F_v2), (sem_p, sem_f),
    )
    out_pair[0] = jnp.zeros((3, Y, 2 * Z), jnp.float32)

    def _chunk(ci, carry):
        sl = pl.ds(pl.multiple_of(ci * CH, CH), CH)
        if level == "dma":
            touch = jnp.sum(pos_v[:, sl]) + jnp.sum(F_v[:, sl])
            out_pair[0] += touch * 1e-30
            return carry
        Sy, Szf = _window_weights(pos_v[:, sl], g, X, CH, Y, Z)
        if level == "onehot":
            touch = jnp.sum(Sy) + jnp.sum(Szf) + jnp.sum(F_v[:, sl])
            out_pair[0] += touch * 1e-30
            return carry
        F = F_v[:, sl]
        if level == "renorm":
            m_pair = jnp.concatenate([m_lo[0, 0], m_hi[0, 0]], axis=1)
            t = jax.lax.dot_general(
                m_pair, Szf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.sum(Sy * t, axis=0, keepdims=True)
            F = F * (1.0 / jnp.maximum(s, 1e-30))
        M3 = jnp.concatenate([Sy * F[c : c + 1, :] for c in range(3)], axis=0)
        planes = jax.lax.dot_general(
            M3, Szf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_pair[0] += planes.reshape(3, Y, 2 * Z)
        return carry

    jax.lax.fori_loop(0, nch, _chunk, 0)


@functools.partial(jax.jit, static_argnames=("level", "capacity"))
def run_variant(plan, mask, level, capacity):
    C = capacity
    m_x = mask[:, None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, Y, Z), lambda q, s: ((q - 1 + X) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Y, Z), lambda q, s: (q % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, Y, 2 * Z), lambda q, s: (q, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, C), jnp.float32),
            pltpu.VMEM((2, 4, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(variant_kernel, level, C, _pick_chunk(C, Y, Z))
    pair = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X + 2, 3, Y, 2 * Z), jnp.float32),
        interpret=INTERP,
    )(plan.starts, plan.pos_cm, plan.payload_cm, m_x, m_x)
    lo, hi = pair[..., :Z], pair[..., Z:]
    field = lo[1 : X + 1] + hi[0:X]
    field = field.at[0].add(lo[X + 1] + hi[X])
    field = field.at[1].add(hi[X + 1])
    field = field.at[X - 1].add(lo[0])
    return field.transpose(1, 0, 2, 3)


def timed(fn, n, repeats=3):
    """fn(carry scalar) -> scalar; chained across n in-loop iterations."""

    @jax.jit
    def loop(c0):
        return jax.lax.fori_loop(0, n, lambda i, c: fn(c), c0)

    c = loop(jnp.zeros((), jnp.float32))
    float(c)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = loop(c * 1e-30)
        float(c)
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--verts", type=int, default=335_000)
    args = ap.parse_args()
    n = 30 if args.quick else 200
    print(f"backend={jax.default_backend()}", flush=True)

    pos, F, mask = make_workload(args.verts)
    P_pad = pos.shape[0]
    C = slab_capacity(P_pad, X)
    print(f"P_pad={P_pad} capacity={C} chunk={_pick_chunk(C, Y, Z)}",
          flush=True)
    shape = (X, Y, Z)

    def mkplan(c):
        return build_ibm_plan(
            pos + c * 1e-30, shape, C, payload=F, subdiv=SUBDIV,
            aux=jnp.zeros(P_pad, jnp.float32),
        )

    dt = timed(lambda c: jnp.sum(mkplan(c).pos_cm), n // 4)
    print(f"  sort/plan      {dt * 1e3:7.3f} ms", flush=True)

    plan0 = jax.jit(mkplan)(jnp.zeros((), jnp.float32))

    def perturbed(c):
        return plan0._replace(pos_cm=plan0.pos_cm + c * 1e-30)

    for level in ("dma", "onehot", "mm", "renorm"):
        dt = timed(
            lambda c, lv=level: jnp.sum(
                run_variant(perturbed(c), mask, lv, C)
            ), n,
        )
        print(f"  {level:<14s} {dt * 1e3:7.3f} ms", flush=True)

    for mm in ("f32", "bf16"):
        dt = timed(
            lambda c, mm=mm: jnp.sum(
                pallas_spread_shadow(
                    perturbed(c), shape, C, mm=mm, mask=mask,
                    interpret=INTERP,
                )
            ), n,
        )
        print(f"  prod mm={mm:<5s}  {dt * 1e3:7.3f} ms", flush=True)

    u = jnp.zeros((3, X, Y, Z), jnp.float32) + 1e-3
    dt = timed(
        lambda c: jnp.sum(
            pallas_interp_shadow(
                perturbed(c), u, shape, C, interpret=INTERP
            )[0]
        ), n,
    )
    print(f"  interp_shadow  {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
