"""Two-step fused D3Q19 stream-collide Pallas TPU kernel.

The one-pass kernel (fluid/pallas_lbm.py) is measured HBM-bound at the
chip's Pallas streaming envelope (~218 GB/s → ~1.35 GLUPS at 128³;
docs/PERFORMANCE.md "Measured roofline").  A one-pass design cannot go
faster — but fusing TWO timesteps into one pass halves the HBM round
trips per step: each program reads its slab plus a 2-row halo per side,
runs collide→stream twice entirely in VMEM, and writes the slab once.
Per-step traffic drops from (tx+2)/tx·19 reads + 19 writes to
((tx+4)/tx·19 + 19)/2 — at tx=4 that is 28.5 vs 47.5 row-channels
(1.67×); at tx=8 it is 23.75 vs 42.75 (1.8×) — and the extra collide
work rides the VPU slack the roofline probe showed (full ≈ copy).

Measured on-chip (v5e, scripts/probe_2x_ab.py, 2026-08-20, n=500
dispatch-amortised timing — shorter loops are inflated ~0.5 ms/call by
the relay's per-dispatch overhead, see docs/PERFORMANCE.md "Timing
methodology"): 128³ one-pass 1.082 ms/step (1.94 GLUPS) vs 2x tx=8
0.596 ms/step (3.52 GLUPS) — a 1.82× win; 256×128² one-pass 2.103 vs
2x 1.134 ms/step (3.70 GLUPS, 1.86×).  Both match the traffic model's
1.8× at tx=8.  The tx sweep put tx=8 ahead of the old auto-pick tx=4
by ~8%, so the picker budget below is calibrated to the measured
compile boundary, not the one-pass kernel's conservative 64 MiB
comfort budget.

Scope (the fluid-only hot path — reference `lattice->collideAndStream()`,
core/hemoCell.cpp:317, during cell-free warmup / pure-fluid runs):
  * uniform body force ([3] via SMEM, Guo) or unforced;
  * scalar omega;
  * optional flags (bounce-back walls); no velocity/pressure BCs, no
    Lees-Edwards, no lane folding, single chip, periodic x wrap.
Coupled iterations spread a fresh IBM force field every step, so they
cannot fuse across the fluid boundary — they keep the one-pass kernel.

Bit-exactness: both steps evaluate the exact `_collide_local` math of the
one-pass kernel on the same operands in the same order, so the result is
bitwise identical to two sequential `stream_collide_pallas` calls
(asserted in tests/test_fluid_2x.py).
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


def _kernel2x(tx, force_mode, has_flags, *refs):
    # operand order: f rows (m2, m1, body, p1, p2), [flags rows x5],
    # omega SMEM, [force SMEM], out
    cursor = [0]

    def take(n):
        r = refs[cursor[0] : cursor[0] + n]
        cursor[0] += n
        return r if n > 1 else r[0]

    f_m2, f_m1, f_body, f_p1, f_p2 = take(5)
    flags_ext = None
    if has_flags:
        fl = take(5)
        flags_ext = jnp.concatenate([r[:] for r in fl], axis=0)
    omega_ref = take(1)
    force_u = None
    if force_mode == "smem":
        force_ref = take(1)
        force_u = (force_ref[0], force_ref[1], force_ref[2])
    out = take(1)
    omega = omega_ref[0]

    # extended slab: body rows sit at ext rows [2, tx+2)
    ext = jnp.concatenate(
        [f_m2[:], f_m1[:], f_body[:], f_p1[:], f_p2[:]], axis=1
    )  # [19, tx+4, Y, Z]

    # ---- step 1: collide everywhere, pull onto ext rows [1, tx+3) -------
    post0 = _collide_local(ext, force_u, omega, flags_ext, None)
    f1 = [None] * 19
    for q in range(19):
        cx, cy, cz = int(_C[q, 0]), int(_C[q, 1]), int(_C[q, 2])
        # f1 row j (ext row j+1) pulls post0 ext row j+1-cx
        f1[q] = _rollyz(post0[q][1 - cx : 1 - cx + tx + 2], cy, cz)

    # ---- step 2: collide the tx+2 streamed rows, pull onto the body -----
    flags1 = flags_ext[1 : tx + 3] if has_flags else None
    post1 = _collide_local(f1, force_u, omega, flags1, None)
    for q in range(19):
        cx, cy, cz = int(_C[q, 0]), int(_C[q, 1]), int(_C[q, 2])
        # out row r (ext row r+2) pulls post1 row r+1-cx
        out[q] = _rollyz(post1[q][1 - cx : 1 - cx + tx], cy, cz)


def _pick_tx_2x(X, Y, Z, c_in, vmem_budget=96 * 2 ** 20):
    """Largest divisor of X fitting the two-step working set: double-
    buffered ins ((tx+4) rows × c_in) and out (tx × 19), plus the ext
    concat, the f1 intermediate and one post set (~3×(tx+4)×19 rows).

    The 96 MiB budget is calibrated on-chip: tx=8 at a 128×128 cross
    section (model cost 94.6 MiB) compiles and is the fastest point of
    the probe_2x_ab.py sweep — the model over-counts because Mosaic
    fuses the post-collision temporaries instead of materialising all
    three 19-row sets."""
    yp = -(-Y // 8) * 8
    zp = -(-Z // 128) * 128
    row = yp * zp * 4

    def need(tx):
        return (2 * ((tx + 4) * c_in + tx * 19) + 3 * (tx + 4) * 19) * row

    best = 0
    for tx in range(1, X + 1):
        if X % tx == 0 and need(tx) < vmem_budget:
            best = tx
    if best == 0 and need(1) < 100 * 2 ** 20:
        # over the comfort budget but inside the hard scoped-VMEM limit:
        # a single-row two-step slab still halves HBM traffic vs two
        # one-pass calls (mirrors pallas_lbm._pick_tx's escape hatch)
        best = 1
    return best


@functools.partial(jax.jit, static_argnames=("tx", "interpret"))
def stream_collide_pallas_2x(f, force, omega, flags, tx=None,
                             interpret=None):
    """TWO fused LBM steps: bitwise equal to applying
    ``stream_collide_pallas(f, force, omega, flags)`` twice, at roughly
    half the per-step HBM traffic.  ``force`` is None or a uniform [3];
    ``omega`` scalar; ``flags`` None (all-fluid periodic) or uint8
    [X, Y, Z] (bounce-back walls).  Returns the post-2-step populations.
    Falls back to two one-pass kernel calls when no slab fits VMEM."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Q, X, Y, Z = f.shape
    assert force is None or force.ndim == 1, "2x kernel: uniform force only"
    force_mode = "none" if force is None else "smem"
    has_flags = flags is not None
    dtype = f.dtype
    omega_arr = jnp.asarray(omega, dtype)
    assert omega_arr.ndim == 0, "2x kernel: scalar omega only"

    c_in = 19 + (1 if has_flags else 0)
    if tx is None:
        tx = _pick_tx_2x(X, Y, Z, c_in)
    if tx == 0:
        from .pallas_lbm import stream_collide_pallas

        f1 = stream_collide_pallas(f, force, omega, flags,
                                   interpret=interpret)
        return stream_collide_pallas(f1, force, omega, flags,
                                     interpret=interpret)
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

    in_specs = [
        row4(-2), row4(-1),
        pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V),
        row4(tx), row4(tx + 1),
    ]
    args = [f, f, f, f, f]
    if has_flags:
        flags_i = flags.astype(jnp.int32)

        def fbody3(i):
            return (i, 0, 0)

        in_specs += [
            row3(-2), row3(-1),
            pl.BlockSpec((tx, Y, Z), fbody3, memory_space=V),
            row3(tx), row3(tx + 1),
        ]
        args += [flags_i] * 5
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args += [omega_arr.reshape(1)]
    if force_mode == "smem":
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [jnp.asarray(force, dtype)]

    kernel = functools.partial(_kernel2x, tx, force_mode, has_flags)
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
            flops=700 * X * Y * Z,
            bytes_accessed=(c_in + 19) * X * Y * Z * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
