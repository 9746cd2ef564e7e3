"""Pallas IBM kernels: force spreading and velocity interpolation over
x-slab-sorted vertices.

The TPU-native endgame for the IBM exchange: XLA's gather/scatter serialise
(~10 ms per 70k vertices at 64^3), so both directions are reformulated as
per-slab dense one-hot contractions executed on the MXU inside a Pallas
kernel:

  * vertices are sorted by their base x-slab once per call (bitonic sort +
    row permute in XLA) and stored component-major [4, P+pad] so windows are
    lane-aligned;
  * the kernel grid runs over slabs; each program DMAs a 128-aligned window
    of sorted vertex columns that covers its slab (align-down start +
    in-kernel masking on each vertex's true x-base — Mosaic requires
    provably aligned dynamic slices, arbitrary slab starts are not);
  * spread: out[y,z] = (Sy * a) @ Sz^T per component, x-weight split over
    two block-spec'd outputs (rows g and g+1), vertices of other slabs
    masked to zero;
  * interpolation: t = u_row @ Sz -> v = sum_y Sy * t accumulated over rows
    g and g+1; each program emits its whole window into its own output
    block, and one XLA gather un-sorts the per-slab copies (each vertex
    reads the block of its OWN slab, where it is always computed correctly).

Walled domains fuse the boundary-aware weight renormalisation into the
spread kernel (mask= argument); window overflow is returned for callers to
assert on (HemoCell.sanity_check warns on tight occupancy).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 128


def _accumulate_windows(blocks, window_al, P, C):
    """Sum per-program window blocks into the sorted-order value array.

    blocks: [NQ, 4, C] — program q's values for sorted columns
    [window_al[q], window_al[q] + C); columns not claimed by q (the
    vertex's current slab is not q's) are exact zeros (the ``mine`` mask
    in _window_weights), so summing overlapping windows reconstructs every
    vertex's single claimed value.  This replaces a [P]-element arbitrary
    gather from blocks — XLA lowers that gather ~50x slower than these
    NQ dynamic-slice adds (1.5 ms vs 30 us for 70k vertices at 64^3).

    Returns acc [4, P + C] in sorted order (tail C columns are padding).
    """
    NQ = blocks.shape[0]
    acc = jnp.zeros((4, P + C), blocks.dtype)

    def body(q, acc):
        al = window_al[q].astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        cur = jax.lax.dynamic_slice(acc, (zero, al), (4, C))
        return jax.lax.dynamic_update_slice(acc, cur + blocks[q], (zero, al))

    return jax.lax.fori_loop(0, NQ, body, acc)


def pallas_ibm_fits(shape) -> bool:
    """True while the spread outputs (2 x [X,3,Y,Z] f32) fit the
    toolchain's DEFAULT scoped-VMEM stack-allocation budget.  Above this,
    build_runner raises the per-jit budget via compiler options
    (dynamics.scoped_vmem_limit_kib) — the kernels work at any size up to
    physical VMEM."""
    X, Y, Z = (int(v) for v in shape)
    return 2 * X * 3 * Y * Z * 4 <= 7 * 2**20


def slab_capacity(n_vertices: int, nx: int, safety: float = 4.0) -> int:
    """Static window size: safety * mean occupancy + alignment slack,
    rounded up to 512."""
    c = int(
        np.ceil((safety * max(1, n_vertices) / nx + _ALIGN) / 512.0) * 512
    )
    return max(512, min(c, int(np.ceil((n_vertices + _ALIGN) / 512.0) * 512)))


def adaptive_capacity(pos, X, margin=1.5):
    """Static window capacity from MEASURED initial slab occupancy.

    ``slab_capacity``'s blind safety=4 over mean occupancy makes every
    window DMA + chunk loop carry ~4x the columns that are actually
    occupied.  Measured on-chip (scripts/probe_spread_ablate.py +
    capacity A/B, 335k verts in a 248x56x56 tube): capacity 5632 -> 2048
    takes the shadow spread 0.85 -> 0.73 ms and interp 2.11 -> 1.88 ms.

    Sizing: per-sub-bucket counts of the CURRENT positions, sliding-sum
    over the widest window a kernel reads (one slab + the 2*EXTRA shadow
    drift strips + _ALIGN alignment slack), x ``margin`` for drift and
    slow redistribution, rounded to 512 with a 1024 floor and the
    safety=4 static pick as ceiling.  Mid-run redistribution past the
    margin is caught by the carried overflow counter (the facade warns
    and falls back to the exact scatter path — silent drops can't
    happen; see HemoCell._check_overflow)."""
    X = int(X)
    p = np.asarray(pos, np.float64)
    P_pad = -(-p.shape[0] // 512) * 512
    ceil_cap = slab_capacity(P_pad, X)
    occ = window_occupancy(p, X)
    cap = int(np.ceil((occ * margin + _ALIGN) / 512.0) * 512)
    return int(min(max(cap, 1024), ceil_cap))


def window_occupancy(pos, X) -> int:
    """Max vertex count over the widest window any slab kernel reads (one
    slab + the 2*EXTRA shadow drift strips) — the quantity a static window
    capacity must cover.  Shared by adaptive_capacity (sizing) and the
    facade's sanity_check (pre-flight headroom warning)."""
    X = int(X)
    p = np.asarray(pos, np.float64)
    M = SUBDIV
    sub = np.mod(np.floor(np.mod(p[:, 0], X) * M).astype(np.int64), X * M)
    counts = np.bincount(sub, minlength=X * M)
    W = M + 2 * EXTRA
    csum = np.concatenate([[0], np.cumsum(counts)])
    # shadow windows clamp at the domain ends (build: lo/hi clipped)
    return max(
        int(csum[min(s + W, X * M)] - csum[max(s, 0)])
        for s in range(-EXTRA, X * M - M + EXTRA + 1, M)
    )


def _sort_by_slab(pos, X):
    ix = jnp.mod(jnp.floor(pos[:, 0]).astype(jnp.int32), X)
    order = jnp.argsort(ix)
    ix_s = ix[order]
    starts = jnp.searchsorted(
        ix_s, jnp.arange(X + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return order, ix_s, starts


def _component_major(arr, pad_cols):
    """[P, 3] -> [4, P+pad_cols] (sublane-padded, tail-padded)."""
    P = arr.shape[0]
    out = jnp.zeros((4, P + pad_cols), arr.dtype)
    return out.at[:3, :P].set(arr.T)


def _window_iotas(C, Y, Z):
    """Loop-invariant iota/mod planes for _window_weights, built ONCE per
    kernel invocation instead of per chunk (the mod over [2Z, C] is ~2 of
    the ~7 VPU ops per element of the one-hot construction; hoisting it
    out of the dynamic chunk fori_loop is free VMEM-resident reuse)."""
    ids_y = jax.lax.broadcasted_iota(jnp.int32, (Y, C), 0)
    ids_2z = jax.lax.broadcasted_iota(jnp.int32, (2 * Z, C), 0)
    ids_zm = jnp.mod(ids_2z, Z)
    lo_half = ids_2z < Z
    return ids_y, ids_zm, lo_half


def _window_weights(pos4c, g, X, C, Y, Z, ids=None):
    """Per-window one-hots; vertices not belonging to slab g are masked.

    pos4c: [4, C] (row 3 padding; padded tail columns hold position 0 whose
    x-base 0 only matches slab g=0 — callers pad with x = -1 instead).
    ``ids``: optional precomputed _window_iotas(C, Y, Z).
    Returns (Sy [Y,C], Szf [2Z,C])."""
    px = pos4c[0:1, :]
    py = pos4c[1:2, :]
    pz = pos4c[2:3, :]
    ix = jnp.floor(px).astype(jnp.int32)
    mine = (ix == g).astype(px.dtype)  # [1, C]

    fx = px - jnp.floor(px)
    wx0 = (1.0 - fx) * mine
    wx1 = fx * mine

    iy = jnp.floor(py).astype(jnp.int32)
    iz = jnp.floor(pz).astype(jnp.int32)
    fy = py - jnp.floor(py)
    fz = pz - jnp.floor(pz)

    ids_y, ids_zm, lo_half = ids if ids is not None else _window_iotas(
        C, Y, Z
    )
    Sy = (ids_y == jnp.mod(iy, Y)) * (1.0 - fy) + (
        ids_y == jnp.mod(iy + 1, Y)
    ) * fy
    # plane-packed z one-hot: lanes [0, Z) carry the wx0-weighted z stencil
    # (deposit/gather plane g), lanes [Z, 2Z) the wx1-weighted one (plane
    # g+1) — both x-planes ride ONE [.., CH] @ [CH, 2Z] MXU contraction at
    # full lane width (two Z<=64 matmuls would each pad N to 128)
    Sz2 = (ids_zm == jnp.mod(iz, Z)) * (1.0 - fz) + (
        ids_zm == jnp.mod(iz + 1, Z)
    ) * fz
    Szf = Sz2 * jnp.where(lo_half, wx0, wx1)
    return Sy, Szf


def _mm_cast(arr, mm):
    """Cast a matmul operand for the MXU: 'bf16' trades ~3 decimal digits
    of trilinear-weight precision for the 4-8x bf16 MXU rate (accumulation
    stays f32 via preferred_element_type)."""
    return arr.astype(jnp.bfloat16) if mm == "bf16" else arr


def _aligned_window(starts_ref, g):
    start = starts_ref[g]
    al = (start // _ALIGN) * _ALIGN
    return pl.multiple_of(al, _ALIGN)


class IbmPlanT(NamedTuple):
    """Shared per-step sort plan: computed once, reused by spread and
    interpolation (both kernels stream the same sorted windows — the
    x-slab sort is ~half the cost of either call alone)."""

    starts: jnp.ndarray   # [X+1] int32 slab offsets into the sorted order
    pos_cm: jnp.ndarray   # [4, P+C] sorted component-major positions
    order: jnp.ndarray    # [P] sort permutation
    ix_s: jnp.ndarray     # [P] sorted slab ids
    overflow: jnp.ndarray
    payload_cm: jnp.ndarray | None = None  # [4, P+C] sorted payload


def build_ibm_plan(pos, shape, capacity, payload=None,
                   subdiv=1, overflow_slabs=None, aux=None) -> IbmPlanT:
    """One multi-operand lax.sort carries positions (and optionally a
    [P,3] payload, e.g. the spread forces) along with the slab keys —
    measurably faster than argsort + separate row gathers on TPU.

    ``subdiv`` > 1 sorts with sub-slab resolution (shadow mode: within-slab
    order then follows x, so drifted vertices concentrate in thin boundary
    strips and the widened windows stay cheap).

    ``overflow_slabs`` restricts the overflow count to the first N slabs:
    the sharded step (parallel/sharded_step.py) parks other shards' vertices
    in the final (halo-row) slab, whose zero-payload drops are harmless by
    construction and must not trip the facade's corruption guard.

    ``aux`` (a [P] float array, e.g. global cell ids) rides the sort and is
    stored in pos_cm row 3 (otherwise unused padding) — the wall-contact
    kernel (pallas_wall_hit_cells) reduces per cell from it in-kernel."""
    X, Y, Z = (int(s) for s in shape)
    P = pos.shape[0]
    C = capacity
    fshape = jnp.asarray((X, Y, Z), dtype=pos.dtype)
    p = jnp.mod(pos, fshape[None, :])
    ix = jnp.clip(
        jnp.floor(p[:, 0] * subdiv).astype(jnp.int32), 0, X * subdiv - 1
    )
    iota = jnp.arange(P, dtype=jnp.int32)
    operands = [ix, p[:, 0], p[:, 1], p[:, 2]]
    if payload is not None:
        operands += [payload[:, 0], payload[:, 1], payload[:, 2]]
    if aux is not None:
        operands.append(aux)
    operands.append(iota)
    out = jax.lax.sort(tuple(operands), num_keys=1, is_stable=True)
    ix_s = out[0]
    order = out[-1]
    starts = jnp.searchsorted(
        ix_s, jnp.arange(X * subdiv + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    # WINDOW-exact overflow: the kernels address C columns from the
    # ALIGNED start of each slab's window — which in shadow mode spans
    # the slab plus EXTRA drift strips per side (_window_bounds).  The
    # counter must measure exactly that span, else a tight capacity
    # (adaptive_capacity) could cut trailing strip columns without
    # tripping the guard.  For subdiv=1 this reduces to the per-slab
    # formula (window == slab).
    E = EXTRA if subdiv > 1 else 0
    gs = jnp.arange(X, dtype=jnp.int32)
    lo_idx = jnp.clip(gs * subdiv - E, 0, X * subdiv)
    hi_idx = jnp.clip((gs + 1) * subdiv + E, 0, X * subdiv)
    al = (starts[lo_idx] // _ALIGN) * _ALIGN
    per_slab = jnp.maximum(starts[hi_idx] - al - C, 0)
    if overflow_slabs is not None:
        per_slab = per_slab[: int(overflow_slabs)]
    overflow = jnp.sum(per_slab).astype(jnp.int32)
    pos_cm = jnp.zeros((4, P + C), pos.dtype)
    pos_cm = pos_cm.at[0, :P].set(jnp.clip(out[1], 0.0, X - 1e-6))
    pos_cm = pos_cm.at[1, :P].set(out[2])
    pos_cm = pos_cm.at[2, :P].set(out[3])
    if aux is not None:
        pos_cm = pos_cm.at[3, :P].set(out[-2])
        pos_cm = pos_cm.at[3, P:].set(-1.0)  # tail matches no cell id
    pos_cm = pos_cm.at[0, P:].set(-1.0)  # tail never matches a slab
    payload_cm = None
    if payload is not None:
        payload_cm = jnp.zeros((4, P + C), payload.dtype)
        payload_cm = payload_cm.at[0, :P].set(out[4])
        payload_cm = payload_cm.at[1, :P].set(out[5])
        payload_cm = payload_cm.at[2, :P].set(out[6])
    return IbmPlanT(starts, pos_cm, order, ix_s, overflow, payload_cm)


# ---------------------------------------------------------------------------
# spread


def _window_bounds(starts_ref, s, X, M, E, C, CH):
    """Aligned window start + dynamic chunk count for the program claiming
    slab ``s``.  ``starts`` has sub-slab resolution M (buckets per slab);
    the window covers slab s's sorted region extended by E sub-buckets on
    each side — in shadow mode drifted vertices sit in those boundary
    strips (the sub-slab sort orders within-slab by x)."""
    lo_idx = jnp.clip(s * M - E, 0, X * M)
    hi_idx = jnp.clip((s + 1) * M + E, 0, X * M)
    start = starts_ref[lo_idx]
    al = pl.multiple_of((start // _ALIGN) * _ALIGN, _ALIGN)
    nch = jnp.clip((starts_ref[hi_idx] - al + CH - 1) // CH, 0, C // CH)
    return al, nch


def _prefetched_window(starts_ref, X, M, E, C, srcs, bufs, sems):
    """Cross-program double-buffered window DMA.

    The slab windows live in ANY/HBM space and were copied in-kernel with
    an immediate wait — serialising ~C-column DMAs against compute on
    every program (measured: >half the spread kernel at 128³/560k
    vertices).  TPU grid programs run sequentially and scratch persists
    across them, so program p instead waits on the copy started by p-1
    and prefetches p+1's window into the alternate buffer slot.

    srcs: HBM refs [4, P+C]; bufs: [2, 4, C] VMEM scratch (slot-major);
    sems: DMA semaphore arrays of shape (2,), one per src.  Returns the
    [4, C] window views for THIS program (bufs[i][slot])."""
    p = pl.program_id(0)
    n_prog = pl.num_programs(0)

    def dmas(prog, slot):
        g = prog - (1 if E else 0)
        lo_idx = jnp.clip(g * M - E, 0, X * M)
        al = pl.multiple_of(
            (starts_ref[lo_idx] // _ALIGN) * _ALIGN, _ALIGN
        )
        return [
            pltpu.make_async_copy(
                src.at[:, pl.ds(al, C)], buf.at[slot], sem.at[slot]
            )
            for src, buf, sem in zip(srcs, bufs, sems)
        ]

    @pl.when(p == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(p + 1 < n_prog)
    def _():
        for d in dmas(p + 1, (p + 1) % 2):
            d.start()

    slot = p % 2
    for d in dmas(p, slot):
        d.wait()
    # return slot-indexed REFS (not loaded values): the chunk loop reads
    # CH-column slices on demand
    return tuple(buf.at[slot] for buf in bufs)


def _spread_kernel(C, CH, X, Y, Z, M, E, mm, starts_ref, pos_hbm, F_hbm,
                   out_pair, pos_v2, F_v2, sem_p, sem_f):
    g = pl.program_id(0) - (1 if E else 0)  # slab claimed (shadow: -1..X)
    al, nch = _window_bounds(starts_ref, g, X, M, E, C, CH)

    pos_v, F_v = _prefetched_window(
        starts_ref, X, M, E, C,
        (pos_hbm, F_hbm), (pos_v2, F_v2), (sem_p, sem_f),
    )

    # chunk the window so the one-hot matrices fit VMEM at large capacity;
    # the trip count is dynamic (from the prefetched slab offsets) so only
    # occupied chunks burn MXU flops — the static capacity is just an upper
    # bound.  out_pair packs both deposit planes on the lane axis
    # (lanes [0,Z) = plane g, [Z,2Z) = plane g+1) so one [3Y,CH]@[CH,2Z]
    # contraction serves both at full lane width.
    out_pair[0] = jnp.zeros((3, Y, 2 * Z), F_v.dtype)
    ids = _window_iotas(CH, Y, Z)

    def _chunk(ci, carry):
        sl = pl.ds(pl.multiple_of(ci * CH, CH), CH)
        Sy, Szf = _window_weights(pos_v[:, sl], g, X, CH, Y, Z, ids)
        F = F_v[:, sl]
        M3 = jnp.concatenate(
            [Sy * F[c : c + 1, :] for c in range(3)], axis=0
        )  # [3Y, CH]
        planes = jax.lax.dot_general(
            _mm_cast(M3, mm), _mm_cast(Szf, mm),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=F_v.dtype,
        )  # [3Y, 2Z]
        out_pair[0] += planes.reshape(3, Y, 2 * Z)
        return carry

    jax.lax.fori_loop(0, nch, _chunk, 0)


def _pick_chunk(C, Y, Z, budget=4 * 2**20):
    """Largest 512-multiple chunk whose one-hot working set fits budget,
    capped at 512 so the dynamic trip count tracks true slab occupancy.

    The fori_loop trip count skips whole chunks past the occupied end of
    the window, so chunk size sets the granularity of wasted MXU/VPU work:
    with safety=4 windows the mean occupancy is ~C/4 columns, and a
    budget-sized chunk (often == C) burns the full window regardless.  At
    512 the per-chunk fixed cost (one-hot iotas, matmul setup) is already
    amortised and waste drops to <=511 columns per window."""
    per = (Y + 3 * Y + 2 * Z + 2 * Z) * 4
    ch = max(512, min((budget // per) // 512 * 512, 512))
    while C % ch:
        ch -= 512
    return max(ch, 512)


def _spread_renorm_kernel(C, CH, X, Y, Z, M, E, mm, starts_ref, pos_hbm,
                          F_hbm, m_lo, m_hi, out_pair, pos_v2, F_v2,
                          sem_p, sem_f):
    """Spread with fused boundary-aware renormalisation: the per-vertex
    fluid-weight total (the separate mask-interpolation pass of the jnp
    path, reference core/immersedBoundaryMethod.h:62-138) is computed from
    the same one-hots and divided out in-kernel.  ``M``/``E`` follow
    _spread_kernel: sub-slab window resolution + drift strips (shadow)."""
    g = pl.program_id(0) - (1 if E else 0)
    al, nch = _window_bounds(starts_ref, g, X, M, E, C, CH)

    pos_v, F_v = _prefetched_window(
        starts_ref, X, M, E, C,
        (pos_hbm, F_hbm), (pos_v2, F_v2), (sem_p, sem_f),
    )

    out_pair[0] = jnp.zeros((3, Y, 2 * Z), F_v.dtype)
    ids = _window_iotas(CH, Y, Z)
    # per-column fluid-weight total over both x-planes: the wx weights
    # live in Szf, so one plane-packed contraction covers both
    m_pair = jnp.concatenate([m_lo[0, 0], m_hi[0, 0]], axis=1)  # [Y, 2Z]

    def _chunk(ci, carry):
        sl = pl.ds(pl.multiple_of(ci * CH, CH), CH)
        Sy, Szf = _window_weights(pos_v[:, sl], g, X, CH, Y, Z, ids)
        t = jax.lax.dot_general(
            _mm_cast(m_pair, mm), _mm_cast(Szf, mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=F_v.dtype,
        )  # [Y, CH]
        s = jnp.sum(Sy * t, axis=0, keepdims=True)
        scale = 1.0 / jnp.maximum(s, 1e-30)  # masked columns: wx=0 anyway
        F = F_v[:, sl] * scale
        M3 = jnp.concatenate(
            [Sy * F[c : c + 1, :] for c in range(3)], axis=0
        )
        planes = jax.lax.dot_general(
            _mm_cast(M3, mm), _mm_cast(Szf, mm),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=F_v.dtype,
        )
        out_pair[0] += planes.reshape(3, Y, 2 * Z)
        return carry

    jax.lax.fori_loop(0, nch, _chunk, 0)
    # destination masking fused in-kernel: deposits landing ON solid nodes
    # are zeroed here (the renorm divides by the FLUID weight total but the
    # one-hots still deposit everywhere) — replaces a full-field
    # ``field * fluid_mask`` pass outside the kernel (r05)
    out_pair[0] = out_pair[0] * m_pair[None]


@functools.partial(jax.jit, static_argnames=("shape", "capacity", "interpret",
                                             "mm"))
def pallas_spread(pos, forces, shape, capacity=2048, interpret=None,
                  mask=None, plan=None, mm="f32"):
    """[P,3] forces -> [3,X,Y,Z] field (pure trilinear, periodic).

    With ``mask`` (a [X,Y,Z] fluid mask), each vertex's deposit is divided
    by its interpolated fluid-weight total in-kernel — the fused version of
    the separate mask-interpolation + renormalisation pass (boundary-aware
    spreading, reference core/immersedBoundaryMethod.h:62-138).

    Pass ``plan=build_ibm_plan(pos, shape, capacity)`` to share the x-slab
    sort with pallas_interp in the same step.

    Returns (field, overflow)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    C = capacity
    dtype = forces.dtype

    if plan is None:
        plan = build_ibm_plan(pos, shape, capacity, payload=forces)
    starts, pos_cm, overflow = plan.starts, plan.pos_cm, plan.overflow
    F_cm = (
        plan.payload_cm
        if plan.payload_cm is not None
        else _component_major(forces[plan.order], C)
    )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [pos_cm, F_cm]
    if mask is not None:
        in_specs += [
            pl.BlockSpec((1, 1, Y, Z), lambda g, s: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Y, Z), lambda g, s: ((g + 1) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        m_x = mask.astype(dtype)[:, None]  # [X, 1, Y, Z]
        operands += [m_x, m_x]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, Y, 2 * Z), lambda g, s: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, C), pos.dtype),
            pltpu.VMEM((2, 4, C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if mask is not None:
        kernel = functools.partial(
            _spread_renorm_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z, 1, 0, mm
        )
    else:
        kernel = functools.partial(
            _spread_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z, 1, 0, mm
        )
    pair = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X, 3, Y, 2 * Z), dtype),
        interpret=interpret,
    )(starts, *operands)
    # lane halves -> lattice rows: program g deposited plane g in lanes
    # [0, Z) and plane (g+1) mod X in lanes [Z, 2Z)
    field = pair[..., :Z] + jnp.roll(pair[..., Z:], 1, axis=0)
    return field.transpose(1, 0, 2, 3), overflow


# ---------------------------------------------------------------------------
# interpolation


def _interp_kernel(C, CH, X, Y, Z, NCH, M, E, mm, starts_ref, pos_hbm,
                   u_lo, u_hi, out_ref, pos_v2, sem_p):
    g = pl.program_id(0) - (1 if E else 0)
    # dynamic trip count: only chunks holding this slab's vertices are
    # computed.  The whole block is zeroed first: the window-sum un-sort
    # (_accumulate_windows) adds every column of every block, so the
    # untouched tail past the occupied span must be exact zeros.
    al, nch = _window_bounds(starts_ref, g, X, M, E, C, CH)
    out_ref[0] = jnp.zeros((4, C), out_ref.dtype)

    (pos_v,) = _prefetched_window(
        starts_ref, X, M, E, C, (pos_hbm,), (pos_v2,), (sem_p,),
    )

    # plane-packed u: lanes [0,Z) = plane g, [Z,2Z) = plane g+1 — one
    # [NCH*Y, 2Z] @ [2Z, CH] matmul serves both x-planes (wx in Szf)
    u_pair = jnp.concatenate([u_lo[0], u_hi[0]], axis=2)  # [NCH, Y, 2Z]
    ids = _window_iotas(CH, Y, Z)

    def _chunk(ci, carry):
        sl = pl.ds(pl.multiple_of(ci * CH, CH), CH)
        Sy, Szf = _window_weights(pos_v[:, sl], g, X, CH, Y, Z, ids)
        t = jax.lax.dot_general(
            _mm_cast(u_pair.reshape(NCH * Y, 2 * Z), mm),
            _mm_cast(Szf, mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=pos_v.dtype,
        ).reshape(NCH, Y, CH)
        acc = jnp.sum(Sy[None] * t, axis=1)  # [NCH, CH]
        if NCH < 4:
            acc = jnp.concatenate(
                [acc, jnp.zeros((4 - NCH, CH), acc.dtype)], axis=0
            )
        out_ref[0, :, sl] = acc  # [4, CH]
        return carry

    jax.lax.fori_loop(0, nch, _chunk, 0)


@functools.partial(jax.jit, static_argnames=("shape", "capacity", "interpret",
                                             "mm"))
def pallas_interp(pos, u, shape, capacity=2048, interpret=None, plan=None,
                  mm="f32"):
    """Interpolate u [NCH<=4, X, Y, Z] to vertices [P, NCH] (pure
    trilinear).  Extra channels (e.g. a fluid mask for boundary-aware
    renormalisation) ride along for free.  Pass ``plan`` to share the
    x-slab sort with pallas_spread."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    NCH = u.shape[0]
    assert NCH <= 4
    P = pos.shape[0]
    C = capacity
    dtype = u.dtype

    if plan is None:
        plan = build_ibm_plan(pos, shape, capacity)
    starts, pos_cm = plan.starts, plan.pos_cm
    order, ix_s, overflow = plan.order, plan.ix_s, plan.overflow
    u_x = u.transpose(1, 0, 2, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, NCH, Y, Z), lambda g, s: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCH, Y, Z), lambda g, s: ((g + 1) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, C), lambda g, s: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, C), pos.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _interp_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z, NCH, 1, 0, mm
    )
    blocks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X, 4, C), dtype),
    interpret=interpret,
    )(starts, pos_cm, u_x, u_x)
    # un-sort step 1: window-sum the per-program blocks into sorted order
    # (claimed columns carry the value, others exact zeros)
    window_al = (starts[:-1] // _ALIGN) * _ALIGN  # [X]
    acc = _accumulate_windows(blocks, window_al, P, C)
    cols_sorted = [acc[c, :P] for c in range(NCH)]
    # step 2: one multi-payload sort keyed on the permutation replaces the
    # inverse scatter + row gather (a permutation sorted by itself yields
    # the original order; TPU sorts beat TPU scatters)
    unsorted = jax.lax.sort(
        tuple([order] + cols_sorted), num_keys=1, is_stable=True
    )
    return jnp.stack(unsorted[1:], axis=1), overflow


# ---------------------------------------------------------------------------
# shadow (amortised-resort) variants
#
# In shadow mode the sorted layout persists across steps: positions advance
# IN the sorted arrays (pos_cm[:3] += vel_cm) and the per-step sort
# disappears.  The sort key has sub-slab resolution (SUBDIV buckets per
# slab) so within-slab order follows x: vertices that drift across a slab
# boundary sit in thin strips next to it, and each program's window only
# extends EXTRA sub-buckets past its slab.  Two extra edge programs claim
# the "virtual" slabs -1 and X for drift across the periodic x-boundary,
# where positions are left UNWRAPPED in [-1, X+1) until the next resort.
# A resort every K steps restores the invariant; K*u_max must stay inside
# the strips (shadow_supported_drift).


SUBDIV = 8   # sub-buckets per slab in the shadow sort key
EXTRA = 2    # boundary-strip sub-buckets each window absorbs as drift


def shadow_supported_drift(resort_every: int, u_max: float = 0.05) -> bool:
    # drift between resorts must stay inside the EXTRA sub-bucket strips
    return resort_every * u_max < (EXTRA - 1) / SUBDIV


def _spread_renorm_hit_kernel(C, CH, X, Y, Z, NCp, M, E, mm, starts_ref,
                              pos_hbm, F_hbm, m_lo, m_hi, out_pair, out_hit,
                              pos_v2, F_v2, sem_p, sem_f):
    """Spread + renormalisation + FUSED per-cell wall-contact counts.

    The standalone wall-hit kernel (_hit_kernel) re-reads exactly the
    windows this kernel just loaded and rebuilds the same iotas — measured
    0.32 ms/it on pipeflow30 (scripts/probe_ablate30.py, r05).  Here the
    nearest-node wall sample and the cellId one-hot reduction ride the
    spread pass: the wall indicator is the COMPLEMENT of the renorm fluid
    mask already on-chip, so no extra operand or window DMA exists.  The
    verdict is computed from the spread positions (= post-advance of the
    PREVIOUS step), so boundary-contact deletion lands one step after the
    reference's schedule (core/hemoCellParticleField.cpp:566-588) — the
    dying cell spreads one extra (solid-masked, force-capped) deposit."""
    g = pl.program_id(0) - (1 if E else 0)
    al, nch = _window_bounds(starts_ref, g, X, M, E, C, CH)

    pos_v, F_v = _prefetched_window(
        starts_ref, X, M, E, C,
        (pos_hbm, F_hbm), (pos_v2, F_v2), (sem_p, sem_f),
    )

    out_pair[0] = jnp.zeros((3, Y, 2 * Z), F_v.dtype)
    out_hit[0] = jnp.zeros((8, NCp), F_v.dtype)
    ids = _window_iotas(CH, Y, Z)
    ids_y, ids_zm, lo_half = ids
    ids_c = jax.lax.broadcasted_iota(jnp.int32, (CH, NCp), 1)
    m_pair = jnp.concatenate([m_lo[0, 0], m_hi[0, 0]], axis=1)  # [Y, 2Z]
    w_pair = 1.0 - m_pair  # wall indicator = complement of the fluid mask

    def _chunk(ci, carry):
        sl = pl.ds(pl.multiple_of(ci * CH, CH), CH)
        p4 = pos_v[:, sl]
        Sy, Szf = _window_weights(p4, g, X, CH, Y, Z, ids)
        t = jax.lax.dot_general(
            _mm_cast(m_pair, mm), _mm_cast(Szf, mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=F_v.dtype,
        )  # [Y, CH]
        s = jnp.sum(Sy * t, axis=0, keepdims=True)
        scale = 1.0 / jnp.maximum(s, 1e-30)
        F = F_v[:, sl] * scale
        M3 = jnp.concatenate(
            [Sy * F[c : c + 1, :] for c in range(3)], axis=0
        )
        planes = jax.lax.dot_general(
            _mm_cast(M3, mm), _mm_cast(Szf, mm),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=F_v.dtype,
        )
        out_pair[0] += planes.reshape(3, Y, 2 * Z)

        # nearest-node wall test (_hit_kernel math, same claim structure)
        px, py, pz, cid = p4[0:1], p4[1:2], p4[2:3], p4[3:4]
        mine = (jnp.floor(px).astype(jnp.int32) == g).astype(px.dtype)
        hi_x = (px - jnp.floor(px)) >= 0.5
        ny = jnp.mod(jnp.floor(py + 0.5).astype(jnp.int32), Y)
        nz = jnp.mod(jnp.floor(pz + 0.5).astype(jnp.int32), Z)
        Syn = (ids_y == ny).astype(px.dtype)  # [Y, CH]
        Szn = ((ids_zm == nz) & (lo_half != hi_x)).astype(px.dtype)
        th = jax.lax.dot_general(
            w_pair, Szn, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=px.dtype,
        )  # [Y, CH]
        hit = jnp.sum(Syn * th, axis=0, keepdims=True) * mine  # [1, CH]
        oh = (ids_c == cid.astype(jnp.int32).reshape(CH, 1)).astype(px.dtype)
        out_hit[0, 0:1] += jax.lax.dot_general(
            hit, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=px.dtype,
        )
        return carry

    jax.lax.fori_loop(0, nch, _chunk, 0)
    # fused destination masking (see _spread_renorm_kernel)
    out_pair[0] = out_pair[0] * m_pair[None]


@functools.partial(jax.jit, static_argnames=("shape", "capacity", "interpret",
                                             "mm", "hit_cells"))
def pallas_spread_shadow(plan, shape, capacity, interpret=None, mm="f32",
                         mask=None, hit_cells=None):
    """Spread from a shadow plan (pos_cm holds CURRENT, possibly drifted,
    unwrapped positions; payload_cm the current sorted forces).

    With ``mask`` (a [X,Y,Z] fluid mask) the deposit is renormalised by the
    per-vertex fluid-weight total in-kernel, exactly as pallas_spread's
    walled path — this is what lets walled domains (pipeflow tube) ride the
    amortised-resort shadow instead of re-sorting every step.

    With ``hit_cells=n`` (requires ``mask`` and a plan whose pos_cm row 3
    carries cell ids), the per-cell wall-contact counts are computed IN the
    same pass (the standalone wall-hit kernel's windows and iotas are
    shared — see _spread_renorm_hit_kernel) and the return becomes
    ``(field, hits[n])``.

    Returns the [3,X,Y,Z] field (or ``(field, hits)``)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    C = capacity
    dtype = plan.payload_cm.dtype

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [plan.pos_cm, plan.payload_cm]
    if mask is not None:
        # program q claims slab s = q-1; deposit planes mod(s, X) and
        # mod(s+1, X) — the mask blocks follow the same wrap
        in_specs += [
            pl.BlockSpec((1, 1, Y, Z), lambda q, s: ((q - 1 + X) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Y, Z), lambda q, s: (q % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        m_x = mask.astype(dtype)[:, None]  # [X, 1, Y, Z]
        operands += [m_x, m_x]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X + 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, Y, 2 * Z), lambda q, s: (q, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, C), plan.pos_cm.dtype),
            pltpu.VMEM((2, 4, C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    hits = None
    if mask is not None and hit_cells is not None:
        NCp = -(-max(1, int(hit_cells)) // 128) * 128
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(X + 2,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 3, Y, 2 * Z), lambda q, s: (q, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, NCp), lambda q, s: (q, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 4, C), plan.pos_cm.dtype),
                pltpu.VMEM((2, 4, C), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _spread_renorm_hit_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z,
            NCp, SUBDIV, EXTRA, mm
        )
        pair, hit_blocks = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((X + 2, 3, Y, 2 * Z), dtype),
                jax.ShapeDtypeStruct((X + 2, 8, NCp), dtype),
            ],
            interpret=interpret,
        )(plan.starts, *operands)
        hits = jnp.sum(hit_blocks[:, 0], axis=0)[: int(hit_cells)]
    else:
        if mask is not None:
            kernel = functools.partial(
                _spread_renorm_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z,
                SUBDIV, EXTRA, mm
            )
        else:
            kernel = functools.partial(
                _spread_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z, SUBDIV,
                EXTRA, mm
            )
        pair = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((X + 2, 3, Y, 2 * Z), dtype),
            interpret=interpret,
        )(plan.starts, *operands)
    # lane halves -> per-program deposit planes, then onto lattice rows:
    # program q claims slab s = q-1; lo -> row mod(s, X), hi -> mod(s+1, X)
    lo, hi = pair[..., :Z], pair[..., Z:]
    field = lo[1 : X + 1] + hi[0:X]
    field = field.at[0].add(lo[X + 1] + hi[X])
    field = field.at[1].add(hi[X + 1])
    field = field.at[X - 1].add(lo[0])
    field = field.transpose(1, 0, 2, 3)
    if hits is not None:
        return field, hits
    return field


@functools.partial(
    jax.jit, static_argnames=("shape", "capacity", "interpret", "mm")
)
def pallas_interp_shadow(plan, u, shape, capacity, interpret=None, mm="f32"):
    """Interpolate u [NCH<=4,X,Y,Z] onto the shadow plan's (drifted)
    vertices.  Returns (vals [P,NCH] in canonical order,
    vals_cm [4,P+C] in sorted layout — the latter feeds pos_cm updates)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    NCH = u.shape[0]
    assert NCH <= 4
    C = capacity
    P = plan.order.shape[0]
    dtype = u.dtype
    u_x = u.transpose(1, 0, 2, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, NCH, Y, Z), lambda q, s: ((q - 1 + X) % X, 0, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, NCH, Y, Z), lambda q, s: (q % X, 0, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, C), lambda q, s: (q, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, C), plan.pos_cm.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _interp_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z, NCH, SUBDIV, EXTRA,
        mm
    )
    blocks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X + 2, 4, C), dtype),
        interpret=interpret,
    )(plan.starts, plan.pos_cm, u_x, u_x)
    # un-sort: window-sum the per-program blocks into the sorted layout —
    # each column is claimed (nonzero) only in the program covering the
    # vertex's CURRENT slab, so the overlapping-window sum reconstructs it
    g_all = jnp.arange(X + 2, dtype=jnp.int32) - 1
    lo_idx = jnp.clip(g_all * SUBDIV - EXTRA, 0, X * SUBDIV)
    window_al = (plan.starts[lo_idx] // _ALIGN) * _ALIGN  # [X+2]
    acc = _accumulate_windows(blocks, window_al, P, C)
    vals_cm = acc  # [4, P+C] sorted layout, tail + rows >= NCH zero
    cols_sorted = [acc[c, :P] for c in range(NCH)]
    unsorted = jax.lax.sort(
        tuple([plan.order] + cols_sorted), num_keys=1, is_stable=True
    )
    return jnp.stack(unsorted[1:], axis=1), vals_cm


def _hit_kernel(C, CH, X, Y, Z, NCp, M, E, starts_ref, pos_hbm, w_lo, w_hi,
                out_ref, pos_v2, sem_p):
    """Per-cell wall-contact counts over the shadow windows.

    Samples the wall indicator at each vertex's NEAREST lattice node
    (the reference deletion criterion flags[round(p)] != FLUID,
    core/hemoCellParticleField.cpp:566-588) by swapping the trilinear
    weights for nearest-node one-hots — the claim structure (mine =
    floor(px) == g) and the two loaded x-planes are identical to
    _interp_kernel, so window coverage/drift bounds are inherited.  The
    per-cell reduction happens IN-KERNEL via a cellId one-hot contraction
    (ids from pos_cm row 3), so no [P] unsort or scatter ever runs."""
    g = pl.program_id(0) - (1 if E else 0)
    al, nch = _window_bounds(starts_ref, g, X, M, E, C, CH)
    out_ref[0] = jnp.zeros((8, NCp), out_ref.dtype)

    (pos_v,) = _prefetched_window(
        starts_ref, X, M, E, C, (pos_hbm,), (pos_v2,), (sem_p,),
    )
    w_pair = jnp.concatenate([w_lo[0, 0], w_hi[0, 0]], axis=1)  # [Y, 2Z]
    ids_y, ids_zm, lo_half = _window_iotas(CH, Y, Z)
    ids_c = jax.lax.broadcasted_iota(jnp.int32, (CH, NCp), 1)

    def _chunk(ci, carry):
        sl = pl.ds(pl.multiple_of(ci * CH, CH), CH)
        p4 = pos_v[:, sl]  # [4, CH]
        px, py, pz, cid = p4[0:1], p4[1:2], p4[2:3], p4[3:4]
        mine = (jnp.floor(px).astype(jnp.int32) == g).astype(px.dtype)
        hi_x = (px - jnp.floor(px)) >= 0.5  # nearest x-plane is g+1
        ny = jnp.mod(jnp.floor(py + 0.5).astype(jnp.int32), Y)
        nz = jnp.mod(jnp.floor(pz + 0.5).astype(jnp.int32), Z)
        Sy = (ids_y == ny).astype(px.dtype)  # [Y, CH]
        Sz = ((ids_zm == nz) & (lo_half != hi_x)).astype(px.dtype)
        t = jax.lax.dot_general(
            w_pair, Sz, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=px.dtype,
        )  # [Y, CH]
        hit = jnp.sum(Sy * t, axis=0, keepdims=True) * mine  # [1, CH]
        oh = (ids_c == cid.astype(jnp.int32).reshape(CH, 1)).astype(px.dtype)
        acc = jax.lax.dot_general(
            hit, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=px.dtype,
        )  # [1, NCp]
        out_ref[0, 0:1] += acc
        return carry

    jax.lax.fori_loop(0, nch, _chunk, 0)


@functools.partial(
    jax.jit, static_argnames=("shape", "capacity", "n_cells", "interpret")
)
def pallas_wall_hit_cells(plan, wall, shape, capacity, n_cells,
                          interpret=None):
    """Per-cell count of vertices whose nearest lattice node is a wall.

    Replaces the [P]-element arbitrary flags gather of the boundary-contact
    deletion (coupling.on_boundary) — measured 1.86 ms/it at 147k vertices
    on pipeflow30, 47% of the whole coupled step.  ``plan`` must be a
    shadow plan whose pos_cm row 3 carries global cell ids
    (build_ibm_plan(..., aux=cid)); ``wall`` is a [X,Y,Z] 0/1 indicator of
    non-fluid nodes.  Returns counts [n_cells] (f32; exact integers)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    C = capacity
    NCp = -(-max(1, int(n_cells)) // 128) * 128
    dtype = plan.pos_cm.dtype
    w_x = wall.astype(dtype)[:, None]  # [X, 1, Y, Z]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, Y, Z), lambda q, s: ((q - 1 + X) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Y, Z), lambda q, s: (q % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, NCp), lambda q, s: (q, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _hit_kernel, C, _pick_chunk(C, Y, Z), X, Y, Z, NCp, SUBDIV, EXTRA
    )
    blocks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X + 2, 8, NCp), dtype),
        interpret=interpret,
    )(plan.starts, plan.pos_cm, w_x, w_x)
    return jnp.sum(blocks[:, 0], axis=0)[: int(n_cells)]


# ---------------------------------------------------------------------------
# static-binned variants (large domains)
#
# The scalar-prefetch kernels above stream dynamic slab windows, but this
# toolchain stack-allocates the outputs of scalar-prefetch pallas calls in
# scoped VMEM, capping the field size.  For large domains the vertices are
# instead pre-binned into a fixed [X, capacity] layout with an XLA row
# gather, and plain GridSpec kernels (like the fluid kernel, whose outputs
# are HBM-resident) consume one bin block per program.


def build_bins(pos, shape, capacity, extras=()):
    """Sort + bin vertices by x-slab into fixed-capacity rows.

    Returns (pos_b [X,4,C], valid [X,1,C], unbin (ix_s, ranks, order),
    overflow, binned extras [X,4,C] each)."""
    X, Y, Z = (int(s) for s in shape)
    P = pos.shape[0]
    C = capacity
    fshape = jnp.asarray((X, Y, Z), dtype=pos.dtype)
    p = jnp.mod(pos, fshape[None, :])
    order, ix_s, starts = _sort_by_slab(p, X)
    counts = jnp.diff(starts)
    overflow = jnp.sum(jnp.maximum(counts - C, 0))

    ranks = starts[:-1, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
    valid = ranks < (starts[:-1] + counts)[:, None]  # [X, C]
    members = jnp.minimum(ranks, P - 1)

    def bin4(arr_sorted):
        b = arr_sorted[members]  # [X, C, 3]
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:2] + (1,), b.dtype)], axis=-1
        )
        return b.transpose(0, 2, 1)  # [X, 4, C]

    p_sorted = p[order]
    pos_b = bin4(p_sorted)
    extras_b = tuple(bin4(e[order]) for e in extras)
    return pos_b, valid[:, None, :].astype(pos.dtype), (ix_s, starts, order), \
        overflow, extras_b


def _spread_static_kernel(C, Y, Z, pos_ref, F_ref, valid_ref, out_lo, out_hi):
    pos = pos_ref[0]  # [4, C]
    F = F_ref[0]
    valid = valid_ref[0]  # [1, C]

    py = pos[1:2, :]
    pz = pos[2:3, :]
    fx = pos[0:1, :] - jnp.floor(pos[0:1, :])
    wx0 = (1.0 - fx) * valid
    wx1 = fx * valid
    iy = jnp.floor(py).astype(jnp.int32)
    iz = jnp.floor(pz).astype(jnp.int32)
    fy = py - jnp.floor(py)
    fz = pz - jnp.floor(pz)
    ids_y = jax.lax.broadcasted_iota(jnp.int32, (Y, C), 0)
    ids_z = jax.lax.broadcasted_iota(jnp.int32, (Z, C), 0)
    Sy = (ids_y == jnp.mod(iy, Y)) * (1.0 - fy) + (
        ids_y == jnp.mod(iy + 1, Y)
    ) * fy
    Sz = (ids_z == jnp.mod(iz, Z)) * (1.0 - fz) + (
        ids_z == jnp.mod(iz + 1, Z)
    ) * fz

    for out_ref, wx in ((out_lo, wx0), (out_hi, wx1)):
        planes = []
        for c in range(3):
            M = Sy * (F[c : c + 1, :] * wx)
            planes.append(
                jax.lax.dot_general(
                    M, Sz,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=M.dtype,
                )
            )
        out_ref[0] = jnp.stack(planes, axis=0)


def _interp_static_kernel(C, Y, Z, NCH, pos_ref, valid_ref, u_lo, u_hi,
                          out_ref):
    pos = pos_ref[0]
    valid = valid_ref[0]
    py = pos[1:2, :]
    pz = pos[2:3, :]
    fx = pos[0:1, :] - jnp.floor(pos[0:1, :])
    wx0 = (1.0 - fx) * valid
    wx1 = fx * valid
    iy = jnp.floor(py).astype(jnp.int32)
    iz = jnp.floor(pz).astype(jnp.int32)
    fy = py - jnp.floor(py)
    fz = pz - jnp.floor(pz)
    ids_y = jax.lax.broadcasted_iota(jnp.int32, (Y, C), 0)
    ids_z = jax.lax.broadcasted_iota(jnp.int32, (Z, C), 0)
    Sy = (ids_y == jnp.mod(iy, Y)) * (1.0 - fy) + (
        ids_y == jnp.mod(iy + 1, Y)
    ) * fy
    Sz = (ids_z == jnp.mod(iz, Z)) * (1.0 - fz) + (
        ids_z == jnp.mod(iz + 1, Z)
    ) * fz

    rows = []
    for c in range(NCH):
        acc = None
        for u_ref, wx in ((u_lo, wx0), (u_hi, wx1)):
            t = jax.lax.dot_general(
                u_ref[0, c], Sz,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=Sz.dtype,
            )
            v = jnp.sum(Sy * t, axis=0, keepdims=True) * wx
            acc = v if acc is None else acc + v
        rows.append(acc)
    for _ in range(4 - NCH):
        rows.append(jnp.zeros_like(rows[0]))
    out_ref[0] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("shape", "capacity", "interpret"))
def pallas_spread_static(pos, forces, shape, capacity=2048, interpret=None):
    """Static-binned spread (no scalar prefetch); same result as
    pallas_spread."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    C = capacity
    dtype = forces.dtype
    pos_b, valid, _, overflow, (F_b,) = build_bins(
        pos, shape, C, extras=(forces,)
    )

    lo, hi = pl.pallas_call(
        functools.partial(_spread_static_kernel, C, Y, Z),
        grid=(X,),
        in_specs=[
            pl.BlockSpec((1, 4, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, Y, Z), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Y, Z), lambda g: ((g + 1) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((X, 3, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, 3, Y, Z), dtype),
        ),
        interpret=interpret,
    )(pos_b, F_b, valid)
    return (lo + hi).transpose(1, 0, 2, 3), overflow


@functools.partial(jax.jit, static_argnames=("shape", "capacity", "interpret"))
def pallas_interp_static(pos, u, shape, capacity=2048, interpret=None):
    """Static-binned interpolation (no scalar prefetch); same result as
    pallas_interp."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    X, Y, Z = (int(s) for s in shape)
    NCH = u.shape[0]
    assert NCH <= 4
    P = pos.shape[0]
    C = capacity
    dtype = u.dtype
    pos_b, valid, (ix_s, starts, order), overflow, _ = build_bins(
        pos, shape, C
    )
    u_x = u.transpose(1, 0, 2, 3)

    blocks = pl.pallas_call(
        functools.partial(_interp_static_kernel, C, Y, Z, NCH),
        grid=(X,),
        in_specs=[
            pl.BlockSpec((1, 4, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCH, Y, Z), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCH, Y, Z), lambda g: ((g + 1) % X, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, C), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, 4, C), dtype),
        interpret=interpret,
    )(pos_b, valid, u_x, u_x)
    # un-bin: sorted vertex i sits at column (i - start_{g(i)}) of block g(i)
    col = jnp.arange(P, dtype=jnp.int32) - starts[:-1][ix_s]
    flat = (ix_s * 4) * C + col
    bf = blocks.reshape(-1)
    vals_sorted = jnp.stack([bf[flat + c * C] for c in range(NCH)], axis=1)
    inv = jnp.zeros(P, jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    return vals_sorted[inv], overflow
