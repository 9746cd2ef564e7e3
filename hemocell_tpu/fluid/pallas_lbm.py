"""Fused D3Q19 stream-collide Pallas TPU kernel.

The jnp reference path (fluid/lbm.py) materialises 19 rolled copies of the
population array per step; this kernel computes ``stream(collide(f))`` in one
pass over X-slabs, reading each population value ~(TX+2)/TX times and writing
it once — the hot loop of the framework (reference equivalent:
``lattice->collideAndStream()``, core/hemoCell.cpp:317).

Design:
  * f laid out [19, X, Y, Z]; grid over X in slabs of TX rows.  Each program
    fetches the slab plus one halo row on each side (three BlockSpecs over
    the same array: halo-low row, body, halo-high row; periodic wrap via
    modular index maps — the TPU-native replacement for the reference's MPI
    envelope exchange at the single-chip level).
  * collide (BGK + Guo forcing + bounce-back / moving-velocity masks) is
    evaluated on the extended slab, then each direction is shifted by its
    lattice velocity: X-shift = static row slice of the extended slab,
    Y/Z-shift = pltpu.roll (periodic within the full cross-section).
  * bit-identical math to lbm.stream_collide (same formulas, f32).

Restrictions: single-chip arrays (shard_map integration comes separately),
scalar omega + optional per-node omega, X % TX == 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.defaults import FLAG_FLUID, FLAG_PRESSURE, FLAG_VELOCITY, FLAG_WALL
from . import d3q19

_C = d3q19.C  # [19, 3] host ints
_W = d3q19.W
_OPP = d3q19.OPP


def _csum(terms):
    """Signed sum of a list of (coeff, array) with coeff in {-1, +1}."""
    acc = None
    for s, a in terms:
        t = -a if s < 0 else a
        acc = t if acc is None else acc + t
    return acc


def _collide_local(f, force, omega, flags, bc_velocity, bc_density=None,
                   qs=None):
    """BGK+Guo+masks on a [19, S, Y, Z] slab; same math as lbm.collide but
    fully unrolled with python-scalar lattice constants (Pallas kernels
    cannot capture device-array constants).  ``f`` holds deviation
    populations h = f - w (see fluid/lbm.py docstring).

    Opposite-pair factored: with G = (rho-1) - 1.5 rho usq and cu/cF
    evaluated for the pair's canonical (lower-index) member,

        feq_{q±} = [wq G + 4.5 wq rho cu²]  ±  [3 wq rho cu]      (E ± O)
        S_{q±}   = [9 wq cu cF - 3 wq uF]   ±  [3 wq cF]          (A ± B)

    so each of the 9 opposite pairs shares its even parts — ~30% fewer VPU
    ops per site than evaluating the textbook feq/S per direction (the
    kernel is VPU-bound, not HBM-bound: docs/PERFORMANCE.md).  When ``qs``
    requests a single pair member (halo rows), the same expressions are
    evaluated with the same canonical orientation, so the value is bitwise
    identical to the body pass.

    ``force`` may be a [3, S, Y, Z] field, a 3-tuple of traced scalars
    (uniform body force), or None (unforced: Guo terms skipped entirely).
    ``flags`` may be None (all-fluid: wall/velocity/pressure masks skipped;
    requires bc_velocity/bc_density to be None too).

    ``qs``: emit only these population indices (others return None) —
    halo rows only feed the pull for the 5 directions that cross the slab
    edge, so colliding the other 14 on them is wasted VPU work.  The
    moments still read all 19 inputs (they must)."""
    # macroscopic moments
    rho = f[0]
    for q in range(1, 19):
        rho = rho + f[q]
    rho = rho + 1.0
    mom = []
    for i in range(3):
        m = _csum(
            [(int(_C[q, i]), f[q]) for q in range(19) if _C[q, i] != 0]
        )
        mom.append(m if force is None else m + 0.5 * force[i])
    inv_rho = 1.0 / rho
    u = [m * inv_rho for m in mom]
    usq = u[0] * u[0] + u[1] * u[1] + u[2] * u[2]

    if flags is None:
        assert bc_velocity is None and bc_density is None
        is_wall = None
    else:
        is_wall = flags == FLAG_WALL
    if bc_velocity is not None:
        is_vel = flags == FLAG_VELOCITY
    if bc_density is not None:
        is_pres = flags == FLAG_PRESSURE

    om_c = 1.0 - 0.5 * omega
    G = (rho - 1.0) - 1.5 * (rho * usq)
    # per-weight-class hoisted products (two classes: 1/18 axis, 1/36 diag)
    w_classes = sorted({float(_W[q]) for q in range(1, 19)})
    wG = {w: w * G for w in w_classes}
    uF = None
    if force is not None:
        uF = u[0] * force[0] + u[1] * force[1] + u[2] * force[2]
        uF3w = {w: (3.0 * w) * uF for w in w_classes}

    outs = [None] * 19

    def emit(q, wq, feq, S, cu_s):
        """Relax + boundary masks for one direction.  ``cu_s`` is
        (sign, cu-of-canonical-member) or None for the rest population."""
        f_bgk = f[q] - omega * (f[q] - feq)
        if S is not None:
            f_bgk = f_bgk + om_c * S
        if is_wall is None:
            out = f_bgk
        else:
            f_bb = f[int(_OPP[q])]
            out = jnp.where(is_wall, f_bb, f_bgk)
        if bc_velocity is not None:
            if cu_s is None:
                f_mb = f_bb
            else:
                cx, cy, cz = (int(v) for v in _C[q])
                cu_w = _csum(
                    [
                        (c, bc_velocity[i])
                        for i, c in enumerate((cx, cy, cz))
                        if c != 0
                    ]
                )
                f_mb = f_bb + (6.0 * wq) * cu_w
            out = jnp.where(is_vel, f_mb, out)
        if bc_density is not None:
            # fixed-density outlet, second order: feq(rho0, u) + f^neq —
            # same formula as lbm.collide (see there for the derivation)
            r0 = bc_density
            if cu_s is None:
                f_pr = f_bgk + wq * (r0 - rho) * (1.0 - 1.5 * usq)
            else:
                s, cu = cu_s
                f_pr = f_bgk + wq * (r0 - rho) * (
                    (1.0 - 1.5 * usq) + ((3.0 * s) * cu + 4.5 * (cu * cu))
                )
            out = jnp.where(is_pres, f_pr, out)
        outs[q] = out

    # rest population (never in a halo qs: cx == 0)
    if qs is None or 0 in qs:
        w0 = float(_W[0])
        feq0 = w0 * G
        S0 = None if force is None else (-3.0 * w0) * uF
        emit(0, w0, feq0, S0, None)

    for qa in range(1, 19):
        qb = int(_OPP[qa])
        if qb < qa:
            continue
        members = [(qa, 1.0), (qb, -1.0)]
        if qs is not None:
            members = [(q, s) for q, s in members if q in qs]
        if not members:
            continue
        cxa, cya, cza = (int(v) for v in _C[qa])
        wq = float(_W[qa])
        cu = _csum(
            [(c, u[i]) for i, c in enumerate((cxa, cya, cza)) if c != 0]
        )
        E = wG[wq] + (4.5 * wq) * (rho * (cu * cu))
        O = (3.0 * wq) * (rho * cu)
        A = B = None
        if force is not None:
            cF = _csum(
                [
                    (c, force[i])
                    for i, c in enumerate((cxa, cya, cza))
                    if c != 0
                ]
            )
            A = (9.0 * wq) * (cu * cF) - uF3w[wq]
            B = (3.0 * wq) * cF
        for q, s in members:
            feq = E + O if s > 0 else E - O
            S = None if force is None else (A + B if s > 0 else A - B)
            emit(q, wq, feq, S, (s, cu))
    return outs


def fold_field(arr, k):
    """[..., X, Y, Z] -> [..., X/k, Y, k*Z]: pack k consecutive x-planes
    into the lane dimension (lane = h*Z + z for x = xh*k + h).  Fills the
    128-lane vector tile on domains with Z < 128 (64^3: 2x fewer padded
    lanes), at the price of carry handling in the streaming shifts."""
    if k == 1:
        return arr
    *lead, X, Y, Z = arr.shape
    a = arr.reshape(*lead, X // k, k, Y, Z)
    a = jnp.moveaxis(a, -3, -2)
    return a.reshape(*lead, X // k, Y, k * Z)


def unfold_field(arr, k):
    """Inverse of fold_field."""
    if k == 1:
        return arr
    *lead, Xh, Y, KZ = arr.shape
    a = arr.reshape(*lead, Xh, Y, k, KZ // k)
    a = jnp.moveaxis(a, -2, -3)
    return a.reshape(*lead, Xh * k, Y, KZ // k)


def _folded_pull(same, prev, cx, cz, Z, k):
    """Lane-space pull shift for folded layout.

    same: [rows, Y, k*Z] post-collision values of the out rows themselves;
    prev: same-shaped values of the x-neighbour rows (xh - cx), used only by
    carry lanes (h = 0 for cx = +1, h = k-1 for cx = -1).  The flat roll by
    cx*Z + cz already lands carry lanes on the right (k-1 or 0) half via the
    mod-kZ wrap — they just need the neighbour ROW's data; z-boundary lanes
    additionally need the roll re-aimed by -sign(cz)*Z so the z-wrap stays
    inside its own half."""
    KZ = k * Z

    def r(a, sh):
        sh %= KZ
        return pltpu.roll(a, shift=sh, axis=2) if sh else a

    s = cx * Z + cz

    def pulled(a):
        if a is None:
            return None
        if cz:
            lane_z = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2) % Z
            zmask = (lane_z == 0) if cz > 0 else (lane_z == Z - 1)
            return jnp.where(zmask, r(a, s - (Z if cz > 0 else -Z)), r(a, s))
        return r(a, s)

    same_p = pulled(same)
    if cx == 0:
        return same_p
    lane_h = jax.lax.broadcasted_iota(jnp.int32, same.shape, 2) // Z
    hmask = (lane_h == 0) if cx > 0 else (lane_h == k - 1)
    return jnp.where(hmask, pulled(prev), same_p)


def _kernel(tx, has_bc, omega_is_field, bc_density, fold, has_le,
            force_mode, has_flags, has_halos, *refs):
    # operand order (see stream_collide_pallas): f x3, [force x3 if field],
    # [flags x3], [le x3], [omega x3 if field], [bc x3], [halo rows x2 per
    # present field if has_halos], [omega SMEM if scalar], [force SMEM if
    # uniform], out
    cursor = [0]

    def take(n):
        r = refs[cursor[0] : cursor[0] + n]
        cursor[0] += n
        return r if n > 1 else r[0]

    f_lo, f_body, f_hi = take(3)
    force_lo = force_body = force_hi = None
    if force_mode == "field":
        force_lo, force_body, force_hi = take(3)
    flags_lo = flags_body = flags_hi = None
    if has_flags:
        flags_lo, flags_body, flags_hi = take(3)
    le_lo = le_body = le_hi = None
    if has_le:
        le_lo, le_body, le_hi = take(3)
    om_lo = om_body = om_hi = None
    if omega_is_field:
        om_lo, om_body, om_hi = take(3)
    bc_lo = bc_body = bc_hi = None
    if has_bc:
        bc_lo, bc_body, bc_hi = take(3)
    if has_halos:
        # sharded (non-periodic) mode: the modular x-wrap of the lo/hi
        # BlockSpecs is wrong exactly at the global edges of the local
        # shard; the first/last program substitutes the ppermute'd
        # neighbour rows passed as extra operands (the ICI analog of the
        # reference envelope exchange, core/hemoCellFields.cpp:363-372).
        first = pl.program_id(0) == 0
        last = pl.program_id(0) == pl.num_programs(0) - 1

        def sel(main_ref, halo_ref, cond):
            return jnp.where(cond, halo_ref[:], main_ref[:])

        hf_lo, hf_hi = take(2)
        f_lo = sel(f_lo, hf_lo, first)
        f_hi = sel(f_hi, hf_hi, last)
        if force_mode == "field":
            hfo_lo, hfo_hi = take(2)
            force_lo = sel(force_lo, hfo_lo, first)
            force_hi = sel(force_hi, hfo_hi, last)
        if has_flags:
            hfl_lo, hfl_hi = take(2)
            flags_lo = sel(flags_lo, hfl_lo, first)
            flags_hi = sel(flags_hi, hfl_hi, last)
        if has_le:
            hle_lo, hle_hi = take(2)
            le_lo = sel(le_lo, hle_lo, first)
            le_hi = sel(le_hi, hle_hi, last)
        if omega_is_field:
            hom_lo, hom_hi = take(2)
            om_lo = sel(om_lo, hom_lo, first)
            om_hi = sel(om_hi, hom_hi, last)
        if has_bc:
            hbc_lo, hbc_hi = take(2)
            bc_lo = sel(bc_lo, hbc_lo, first)
            bc_hi = sel(bc_hi, hbc_hi, last)
    if not omega_is_field:
        omega_ref = take(1)
    if force_mode == "smem":
        force_ref = take(1)
    out = take(1)

    if force_mode == "smem":
        force_u = (force_ref[0], force_ref[1], force_ref[2])
    else:
        force_u = None

    # collide each region in place — no extended-slab concatenate (that
    # copy of the whole 19-population slab through VMEM cost ~25% of the
    # kernel); the halo rows are collided separately and the X-shift pull
    # becomes two sliced stores at the seam.
    def region(f_r, force_r, flags_r, om_r, bc_r, qs=None):
        if force_mode == "field":
            frc = force_r[:]
        else:
            frc = force_u  # uniform tuple or None
        return _collide_local(
            f_r[:], frc,
            om_r, flags_r[:] if flags_r is not None else None,
            bc_r[:] if bc_r is not None else None,
            bc_density, qs=qs,
        )

    if omega_is_field:
        om_b, om_l, om_h = om_body[:], om_lo[:], om_hi[:]
    else:
        om_b = om_l = om_h = omega_ref[0]
    # halo rows only feed the pull for the directions crossing the slab
    # edge: cx=+1 pulls from the lo row, cx=-1 from the hi row — collide
    # just those 5 per halo row (the other 14 are dead work)
    qs_lo = frozenset(q for q in range(19) if int(_C[q, 0]) == 1)
    qs_hi = frozenset(q for q in range(19) if int(_C[q, 0]) == -1)
    post_b = region(f_body, force_body, flags_body, om_b, bc_body)
    post_l = region(f_lo, force_lo, flags_lo, om_l, bc_lo, qs=qs_lo)
    post_h = region(f_hi, force_hi, flags_hi, om_h, bc_hi, qs=qs_hi)

    if has_le:
        # Lees-Edwards: crossing populations re-enter through corrected
        # planes (x-shifted sample + Galilean eq shift, computed by the
        # caller); substitute them into the post-collision z-boundary
        # lanes BEFORE the pull, exactly like lees_edwards.le_stream_collide
        def le_sub(posts, le_ref):
            le = le_ref[:]  # [38, rows, Y]: top planes 0:19, bottom 19:38
            for q in range(19):
                cz = int(_C[q, 2])
                if cz == 0 or posts[q] is None:
                    continue
                Zl = posts[q].shape[2]
                lane_z = jax.lax.broadcasted_iota(
                    jnp.int32, posts[q].shape, 2
                )
                if cz == 1:
                    posts[q] = jnp.where(
                        lane_z == Zl - 1, le[q][:, :, None], posts[q]
                    )
                else:
                    posts[q] = jnp.where(
                        lane_z == 0, le[19 + q][:, :, None], posts[q]
                    )
            return posts

        post_b = le_sub(post_b, le_body)
        post_l = le_sub(post_l, le_lo)
        post_h = le_sub(post_h, le_hi)

    # pull: out[q, x] = post[q][x - cx]; Y/Z are full so periodic shift =
    # roll, applied per stored piece.
    for q in range(19):
        cx, cy, cz = int(_C[q, 0]), int(_C[q, 1]), int(_C[q, 2])

        if fold > 1:
            Zl = post_b[q].shape[2] // fold

            def cyroll(src):
                return (
                    pltpu.roll(src, shift=cy % src.shape[1], axis=1)
                    if cy else src
                )

            def fpull(same, prev):
                return cyroll(_folded_pull(same, prev, cx, cz, Zl, fold))

            if cx == 0:
                out[q] = fpull(post_b[q], None)
            elif cx == 1:
                out[q, 0:1] = fpull(post_b[q][0:1], post_l[q])
                if tx > 1:
                    out[q, 1:tx] = fpull(
                        post_b[q][1:tx], post_b[q][0 : tx - 1]
                    )
            else:
                if tx > 1:
                    out[q, 0 : tx - 1] = fpull(
                        post_b[q][0 : tx - 1], post_b[q][1:tx]
                    )
                out[q, tx - 1 : tx] = fpull(
                    post_b[q][tx - 1 : tx], post_h[q]
                )
            continue

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


def _pick_tx(X, Y, Z, c_in=27, vmem_budget=64 * 2 ** 20):
    """Largest divisor of X whose slab working set fits the VMEM budget.

    Larger tx amortises the 2 halo rows each program re-reads (and
    re-collides): f-traffic scales as (tx+2)/tx, so tx=1 is a 3x read
    amplification and tx=4 is 1.5x — the dominant lever on the HBM-bound
    roofline (docs/PERFORMANCE.md).  The model: in-blocks ((tx+2) rows of
    ``c_in`` channels) and the out block (tx rows, 19 ch) are double-
    buffered by the Mosaic pipeline; the 19 post-collision temporaries live
    once.  An on-chip sweep (scripts/probe_tx_sweep.py, v5e) located the
    hard compile failure at need(tx) ~ 105 MiB in this model's units
    (uniform tx=16 at 128^3 = 102 MiB compiles, field tx=16 = 111 MiB
    does not); the 64 MiB budget keeps ~40% margin for roll temporaries
    and Mosaic overhead while letting 128^3 shapes reach tx=8.

    Mosaic pads each block's trailing dims to the (8, 128) f32 tile, so the
    estimate uses the padded Y/Z — a 24-lane Z costs 128 lanes of VMEM.
    Returns 0 when even tx=1 cannot fit (huge Y*Z planes): callers fall
    back to the unfused jnp path.  ``c_in`` counts input channels per row:
    19 f + 3 force field + 1 flags + 1 omega field + 3 bc at worst.
    """
    yp = -(-Y // 8) * 8
    zp = -(-Z // 128) * 128
    row = yp * zp * 4

    def need(tx):
        return (2 * ((tx + 2) * c_in + tx * 19) + (tx + 2) * 19) * row

    best = 0
    for tx in range(1, X + 1):
        if X % tx == 0 and need(tx) < vmem_budget:
            best = tx
    if best == 0 and need(1) < 96 * 2 ** 20:
        # over the comfort budget but under the hard 100 MiB scoped-VMEM
        # limit: a single-row slab still beats the unfused jnp fallback
        # (e.g. 256^2 cross-sections in the weak-scaling shards)
        best = 1
    return best


@functools.partial(
    jax.jit, static_argnames=("tx", "interpret", "bc_density", "fold")
)
def stream_collide_pallas(
    f, force, omega, flags, bc_velocity=None, tx=None, interpret=None,
    bc_density=None, fold=1, le_planes=None, halos=None,
):
    """Drop-in fused replacement for lbm.stream_collide (single shard).

    With ``fold`` > 1 every field operand is in the fold_field layout
    [.., X/fold, Y, fold*Z] and the result is returned folded too — the
    caller keeps the state folded across steps (fold/unfold costs a full
    relayout pass, ~0.5 ms at 64^3).

    Fast paths: ``force`` may be a [3] array (spatially uniform body force,
    passed through SMEM — no [3,X,Y,Z] field traffic) or None (unforced);
    ``flags`` may be None (all-fluid periodic box: no flags traffic, no
    mask selects).  Both cut HBM traffic and VMEM, letting _pick_tx choose
    a taller slab.

    ``halos``: sharded mode — a dict with key 'f' (and 'force'/'flags'/'bc'
    when those operands are fields) mapping to ``(lo_row, hi_row)`` pairs
    (each shaped like one x-row of the operand).  The kernel then treats f
    as a non-periodic local shard whose x-neighbour rows at the global
    edges come from the given rows (ppermute'd from neighbour shards)
    instead of the periodic wrap.  Replaces the old concatenate-extend
    pattern: no [Q, X+2, ..] copy of f through HBM, and tx is no longer
    pinned to 1 by the odd extended row count."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Q, X, Y, Z = f.shape
    if force is not None and force.ndim == 1:
        force_mode = "smem"
    elif force is None:
        force_mode = "none"
    else:
        force_mode = "field"
    has_flags = flags is not None
    if not has_flags:
        assert bc_velocity is None and bc_density is None, (
            "velocity/pressure BCs need a flags field"
        )

    dtype = f.dtype
    omega_arr = jnp.asarray(omega, dtype)
    omega_is_field = omega_arr.ndim == 3
    has_bc = bc_velocity is not None
    has_le = le_planes is not None
    has_halos = halos is not None
    if has_halos:
        assert fold == 1, "halo mode supports the canonical (unfolded) layout"
        assert "f" in halos, "halos requires the 'f' (lo, hi) row pair"
        if omega_is_field:
            assert "omega" in halos, (
                "halo mode with an omega field needs the 'omega' row pair"
            )
        if has_le:
            assert "le" in halos, (
                "halo mode with Lees-Edwards needs the 'le' plane-row pair"
            )

    c_in = (19 + (3 if force_mode == "field" else 0) + (1 if has_flags else 0)
            + (1 if omega_is_field else 0) + (3 if has_bc else 0))
    if tx is None:
        tx = _pick_tx(X, Y, Z, c_in)
        if (
            tx <= 1
            and fold == 1
            and not has_le
            and not omega_is_field
        ):
            # giant (Y, Z) cross-section: single-row slabs re-read their 2
            # halo rows (3x f-traffic) or don't fit at all — the 2-D
            # (x, y)-tiled kernel cuts amplification to ~(1+2/t)^2
            # (halo mode passes through: x-edges substitute the neighbour
            # rows, y stays periodic)
            from .pallas_lbm_2d import pick_txy, stream_collide_pallas_2d

            txy = pick_txy(X, Y, Z, c_in)
            if txy[0] > 0 and (tx == 0 or
                               (txy[0] + 2) * (txy[1] + 2)
                               < 3.0 * txy[0] * txy[1]):
                return stream_collide_pallas_2d(
                    f, force, omega, flags, bc_velocity,
                    tx=txy[0], ty=txy[1], interpret=interpret,
                    bc_density=bc_density, halos=halos,
                )
    if tx == 0:
        # a single padded (Y, Z) plane row already overflows VMEM — run the
        # unfused jnp path (XLA tiles it through HBM) rather than OOM
        from . import lbm

        assert fold == 1, "folded layout requires the Pallas kernel"
        if has_halos:
            # halo mode via the extend-and-slice pattern the kernel avoids
            def ext(a, key, ax):
                lo, hi = halos[key]
                return jnp.concatenate([lo, a, hi], axis=ax)

            f = ext(f, "f", 1)
            if force_mode == "field":
                force = ext(force, "force", 1)
            if has_flags:
                flags = ext(flags, "flags", 0)
            if omega_is_field:
                omega = ext(omega_arr, "omega", 0)
            if has_bc:
                bc_velocity = ext(bc_velocity, "bc", 1)
            if has_le:
                le_planes = ext(le_planes, "le", 1)
            X = X + 2
        force_f = force
        if force_mode == "smem":
            force_f = jnp.broadcast_to(
                force[:, None, None, None], (3, X, Y, Z)
            )
        elif force_mode == "none":
            force_f = jnp.zeros((3, X, Y, Z), dtype)
        flags_f = flags if has_flags else jnp.zeros((X, Y, Z), jnp.uint8)
        if has_le:
            from . import lees_edwards

            post = lbm.collide(f, force_f, omega, flags_f)
            out = lees_edwards.stream_with_planes(post, le_planes)
        else:
            out = lbm.stream_collide(f, force_f, omega, flags_f,
                                     bc_velocity, bc_density)
        return out[:, 1:-1] if has_halos else out
    n = X // tx
    assert X % tx == 0, (X, tx)

    flags_i = flags.astype(jnp.int32) if has_flags else None
    if has_le:
        # LE shear box is fully periodic with scalar omega — the kernel
        # supports le only in that configuration
        assert not has_bc and not omega_is_field and bc_density is None \
            and fold == 1, "Lees-Edwards requires plain periodic config"
        assert le_planes.shape == (2 * Q, X, Y), le_planes.shape

    # --- specs: body block + 1-row halos with modular index maps ----------
    def body4(i):
        return (0, i, 0, 0)

    def lo4(i):
        return (0, (i * tx - 1) % X, 0, 0)

    def hi4(i):
        return (0, ((i + 1) * tx) % X, 0, 0)

    def body3(i):
        return (i, 0, 0)

    def lo3(i):
        return ((i * tx - 1) % X, 0, 0)

    def hi3(i):
        return (((i + 1) * tx) % X, 0, 0)

    V = pltpu.VMEM
    f_specs = [
        pl.BlockSpec((Q, 1, Y, Z), lo4, memory_space=V),
        pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V),
        pl.BlockSpec((Q, 1, Y, Z), hi4, memory_space=V),
    ]

    in_specs = list(f_specs)
    args = [f, f, f]
    if force_mode == "field":
        in_specs += [
            pl.BlockSpec((3, 1, Y, Z), lo4, memory_space=V),
            pl.BlockSpec((3, tx, Y, Z), body4, memory_space=V),
            pl.BlockSpec((3, 1, Y, Z), hi4, memory_space=V),
        ]
        args += [force, force, force]
    if has_flags:
        in_specs += [
            pl.BlockSpec((1, Y, Z), lo3, memory_space=V),
            pl.BlockSpec((tx, Y, Z), body3, memory_space=V),
            pl.BlockSpec((1, Y, Z), hi3, memory_space=V),
        ]
        args += [flags_i, flags_i, flags_i]

    if has_le:
        # [2Q, X, Y] channel-leading maps (x is the middle axis)
        def le_body(i):
            return (0, i, 0)

        def le_lo(i):
            return (0, (i * tx - 1) % X, 0)

        def le_hi(i):
            return (0, ((i + 1) * tx) % X, 0)

        in_specs += [
            pl.BlockSpec((2 * Q, 1, Y), le_lo, memory_space=V),
            pl.BlockSpec((2 * Q, tx, Y), le_body, memory_space=V),
            pl.BlockSpec((2 * Q, 1, Y), le_hi, memory_space=V),
        ]
        args += [le_planes, le_planes, le_planes]
    if omega_is_field:
        in_specs += [
            pl.BlockSpec((1, Y, Z), lo3, memory_space=V),
            pl.BlockSpec((tx, Y, Z), body3, memory_space=V),
            pl.BlockSpec((1, Y, Z), hi3, memory_space=V),
        ]
        args += [omega_arr, omega_arr, omega_arr]
    if has_bc:
        in_specs += [
            pl.BlockSpec((3, 1, Y, Z), lo4, memory_space=V),
            pl.BlockSpec((3, tx, Y, Z), body4, memory_space=V),
            pl.BlockSpec((3, 1, Y, Z), hi4, memory_space=V),
        ]
        args += [bc_velocity, bc_velocity, bc_velocity]
    if has_halos:
        def const4(i):
            return (0, 0, 0, 0)

        def const3(i):
            return (0, 0, 0)

        def add_halo(key, ch, spec_dims):
            lo, hi = halos[key]
            if spec_dims == 4:
                assert lo.shape == (ch, 1, Y, Z), (key, lo.shape)
                sp = pl.BlockSpec((ch, 1, Y, Z), const4, memory_space=V)
            elif spec_dims == "xy":
                # z-boundary plane rows (Lees-Edwards): [ch, 1, Y]
                assert lo.shape == (ch, 1, Y), (key, lo.shape)
                sp = pl.BlockSpec((ch, 1, Y), const3, memory_space=V)
            else:
                assert lo.shape == (1, Y, Z), (key, lo.shape)
                sp = pl.BlockSpec((1, Y, Z), const3, memory_space=V)
            in_specs.extend([sp, sp])
            return [lo, hi]

        args += add_halo("f", Q, 4)
        if force_mode == "field":
            args += add_halo("force", 3, 4)
        if has_flags:
            lo, hi = halos["flags"]
            halos = dict(halos)
            halos["flags"] = (lo.astype(jnp.int32), hi.astype(jnp.int32))
            args += add_halo("flags", 1, 3)
        if has_le:
            args += add_halo("le", 2 * Q, "xy")
        if omega_is_field:
            args += add_halo("omega", 1, 3)
        if has_bc:
            args += add_halo("bc", 3, 4)
    if not omega_is_field:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [omega_arr.reshape(1)]
    if force_mode == "smem":
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [jnp.asarray(force, dtype)]

    out_spec = pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V)

    kernel = functools.partial(
        _kernel, tx, has_bc, omega_is_field,
        float(bc_density) if bc_density is not None else None,
        int(fold), has_le, force_mode, has_flags, has_halos,
    )
    flops_per_node = 350  # rough BGK+Guo cost for the scheduler
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_node * X * Y * Z,
            bytes_accessed=(c_in + 19) * X * Y * Z * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
