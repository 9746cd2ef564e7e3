"""k-step fused D3Q19 stream-collide Pallas TPU kernel (k >= 2).

Generalises the two-step kernel (fluid/pallas_lbm_2x.py): each program
reads its slab plus k halo rows per side, runs collide->stream k times
entirely in VMEM, and writes the slab once per k steps.  Per-step HBM
traffic is ((tx+2k)/tx * 19 + 19) / k row-channels:

    tx=8   k=2: 23.75   k=3: 17.42   k=4: 14.25   (one-pass: 42.75)

so k=3 models 1.36x over k=2 and k=4 models 1.67x — *if* the growing
VPU work (k collides over (tx+2k)-row slabs: (1 + 2k/tx) collides per
site per step) stays hidden under the DMA.

Measured on-chip (v5e, scripts/probe_kx_ab.py, 2026-08-20, n=600
dispatch-amortised): at tx=8, 128^3 runs 0.588 (k=2) / 0.435 (k=3) /
0.411 (k=4) / 0.400 (k=5) ms per LBM step — 5.11 GLUPS at k=4 — and
256x128^2 reaches 5.43 GLUPS at k=4.  The k=2->3 gain (1.35x) tracks
the traffic model (1.36x); k=3->4 yields only 5.8% of the modelled 22%
and k=4->5 2.7%, so the kernel transitions from HBM- to VPU-bound
around k=4; k=6/tx=8 no longer fits VMEM.  k=4 is therefore the
pure-fluid default (dynamics.build_runner) — k=5's extra 2.7% rides
the VMEM cliff (its working set brackets the compile boundary) and is
opt-in via StepConfig.fluid_k.

Scope = the 2x kernel's (reference `lattice->collideAndStream()`,
core/hemoCell.cpp:317, pure-fluid runs): uniform [3] body force via
SMEM or unforced, scalar omega, optional bounce-back flags, periodic,
single chip, no folding.  Coupled iterations spread a fresh IBM force
field every step and cannot fuse across the fluid boundary.

Bit-exactness: every step evaluates the one-pass kernel's exact
`_collide_local` math on the same operands in the same order, so the
result is bitwise identical to k sequential `stream_collide_pallas`
calls (asserted in tests/test_fluid_kx.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import d3q19
from .pallas_lbm import _collide_local

_C = d3q19.C


def _rollyz(src, cy, cz):
    ny, nz = src.shape[1], src.shape[2]
    if cy:
        src = pltpu.roll(src, shift=cy % ny, axis=1)
    if cz:
        src = pltpu.roll(src, shift=cz % nz, axis=2)
    return src


def _kernel_kx(tx, k, force_mode, has_flags, *refs):
    # operand order: f rows (m_k..m_1, body, p_1..p_k),
    # [flags rows x (2k+1)], omega SMEM, [force SMEM], out
    cursor = [0]

    def take(n):
        r = refs[cursor[0] : cursor[0] + n]
        cursor[0] += n
        return r if n > 1 else r[0]

    f_rows = take(2 * k + 1)
    flags_ext = None
    if has_flags:
        fl = take(2 * k + 1)
        flags_ext = jnp.concatenate([r[:] for r in fl], axis=0)
    omega_ref = take(1)
    force_u = None
    if force_mode == "smem":
        force_ref = take(1)
        force_u = (force_ref[0], force_ref[1], force_ref[2])
    out = take(1)
    omega = omega_ref[0]

    # extended slab: body rows sit at ext rows [k, tx+k)
    cur = jnp.concatenate([r[:] for r in f_rows], axis=1)  # [19, tx+2k, Y, Z]

    for s in range(k):
        m = tx + 2 * (k - s)  # valid rows in cur
        flags_s = flags_ext[s : s + m] if has_flags else None
        post = _collide_local(cur, force_u, omega, flags_s, None)
        nxt = [None] * 19
        for q in range(19):
            cx, cy, cz = int(_C[q, 0]), int(_C[q, 1]), int(_C[q, 2])
            # next row j (ext row s+1+j) pulls post row j+1-cx
            nxt[q] = _rollyz(post[q][1 - cx : 1 - cx + m - 2], cy, cz)
        cur = nxt

    for q in range(19):
        out[q] = cur[q]


def pick_tx_kx(X, Y, Z, c_in, k, vmem_budget=96 * 2 ** 20):
    """Largest divisor of X fitting the k-step working set: double-
    buffered ins ((tx+2k) rows x c_in) and out (tx x 19), plus ~2x
    (tx+2k) x 19 rows of live per-step temporaries.  The temporaries
    coefficient is calibrated on-chip (scripts/probe_kx_ab.py,
    2026-08-20): k=4/tx=8 at a 128x128 cross section (95 MiB under this
    model) compiles and is the fastest sweep point, while the 2x
    picker's 3x-temporaries model would reject it at 114 MiB; Mosaic
    keeps only ~2 of the k+1 19-row sets live at once.  k=6/tx=8
    (114 MiB here) genuinely fails to fit, bracketing the boundary."""
    yp = -(-Y // 8) * 8
    zp = -(-Z // 128) * 128
    row = yp * zp * 4

    def need(tx):
        return (
            2 * ((tx + 2 * k) * c_in + tx * 19) + 2 * (tx + 2 * k) * 19
        ) * row

    best = 0
    for tx in range(1, X + 1):
        if X % tx == 0 and need(tx) < vmem_budget:
            best = tx
    # escape hatch for tx=1: the kernel's actual vmem_limit_bytes carries
    # ~4% headroom over the comfort budget, scaled so a caller-supplied
    # budget is honored consistently (default: 100 MiB over 96)
    if best == 0 and need(1) < (vmem_budget * 25) // 24:
        best = 1
    return best


@functools.partial(jax.jit, static_argnames=("k", "tx", "interpret"))
def stream_collide_pallas_kx(f, force, omega, flags, k=3, tx=None,
                             interpret=None):
    """k fused LBM steps: bitwise equal to applying
    ``stream_collide_pallas(f, force, omega, flags)`` k times, at
    roughly 1/k the per-step HBM write traffic.  ``force`` is None or a
    uniform [3]; ``omega`` scalar; ``flags`` None (all-fluid periodic)
    or uint8 [X, Y, Z] (bounce-back walls).  Falls back to the 2x
    kernel (and ultimately one-pass calls) when no slab fits VMEM."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert k >= 2
    Q, X, Y, Z = f.shape
    assert force is None or force.ndim == 1, "kx kernel: uniform force only"
    force_mode = "none" if force is None else "smem"
    has_flags = flags is not None
    dtype = f.dtype
    omega_arr = jnp.asarray(omega, dtype)
    assert omega_arr.ndim == 0, "kx kernel: scalar omega only"

    c_in = 19 + (1 if has_flags else 0)
    if tx is None:
        tx = pick_tx_kx(X, Y, Z, c_in, k)
    if tx == 0:
        from .pallas_lbm_2x import stream_collide_pallas_2x

        n2, rem = divmod(k, 2)
        for _ in range(n2):
            f = stream_collide_pallas_2x(f, force, omega, flags,
                                         interpret=interpret)
        if rem:
            from .pallas_lbm import stream_collide_pallas

            f = stream_collide_pallas(f, force, omega, flags,
                                      interpret=interpret)
        return f
    n = X // tx
    assert X % tx == 0, (X, tx)

    V = pltpu.VMEM

    def row4(off):
        def idx(i):
            return (0, (i * tx + off) % X, 0, 0)

        return pl.BlockSpec((Q, 1, Y, Z), idx, memory_space=V)

    def row3(off):
        def idx(i):
            return ((i * tx + off) % X, 0, 0)

        return pl.BlockSpec((1, Y, Z), idx, memory_space=V)

    def body4(i):
        return (0, i, 0, 0)

    offs = list(range(-k, 0)) + [None] + list(range(tx, tx + k))
    in_specs = [
        pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V)
        if o is None else row4(o)
        for o in offs
    ]
    args = [f] * (2 * k + 1)
    if has_flags:
        flags_i = flags.astype(jnp.int32)

        def fbody3(i):
            return (i, 0, 0)

        in_specs += [
            pl.BlockSpec((tx, Y, Z), fbody3, memory_space=V)
            if o is None else row3(o)
            for o in offs
        ]
        args += [flags_i] * (2 * k + 1)
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args += [omega_arr.reshape(1)]
    if force_mode == "smem":
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [jnp.asarray(force, dtype)]

    kernel = functools.partial(_kernel_kx, tx, k, force_mode, has_flags)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V),
        out_shape=jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=350 * k * X * Y * Z,
            bytes_accessed=(c_in + 19) * X * Y * Z * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
