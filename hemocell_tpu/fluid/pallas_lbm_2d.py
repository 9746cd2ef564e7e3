"""2-D (x,y)-tiled fused D3Q19 stream-collide Pallas kernel.

The 1-D slab kernel (pallas_lbm.py) holds full (Y, Z) cross-sections in
VMEM, so on large cross-sections (the reference's weak-scaling harness is
256^3 per rank, cases/performance_testing/configs/config_1.xml) it degrades
to tx=1 — a 3x halo-row read amplification — or falls back to the unfused
jnp path.  This kernel tiles the grid over (x, y): each program owns a
[tx, ty] tile of x-rows x y-columns (full Z), fetches the 8 surrounding
halo pieces (x-rows, y-columns, 4 corners — D3Q19 has diagonal xy movers),
collides all 9 regions and assembles the pulled output with static sliced
stores.  Read amplification drops to (tx+2)(ty+2)/(tx*ty) ~ 1.27 at 16x16.

Same math as pallas_lbm._collide_local (deviation populations, BGK + Guo +
bounce-back / velocity / pressure masks); z-streaming is a lane roll,
x/y-streaming is region selection (periodic via modular index maps).
Scalar omega only; no fold/Lees-Edwards/halo mode (those configs have
small cross-sections and use the 1-D kernel).

Reference equivalent: lattice->collideAndStream (core/hemoCell.cpp:317) on
MultiBlock 2-D/3-D block decompositions (core/hemoCell.cpp:438-571).
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

_XR = ("lo", "body", "hi")


def _parts(c, t):
    """Decompose the pull along one tiled axis into (out_slice, region,
    body_src_slice) pieces for lattice velocity component c."""
    if c == 0:
        return [(slice(0, t), "body", slice(0, t))]
    if c == 1:
        out = [(slice(0, 1), "lo", None)]
        if t > 1:
            out.append((slice(1, t), "body", slice(0, t - 1)))
        return out
    out = []
    if t > 1:
        out.append((slice(0, t - 1), "body", slice(1, t)))
    out.append((slice(t - 1, t), "hi", None))
    return out


def _kernel2d(tx, ty, has_bc, bc_density, force_mode, has_flags,
              has_halos, *refs):
    # operand order: f x9, [force x9 if field], [flags x9], [bc x9],
    # [halo pieces x6 per present field if has_halos], [omega SMEM],
    # [force SMEM if uniform], out.  Region order within each group:
    # (xr, yr) for xr in (lo, body, hi) for yr in (lo, body, hi); halo
    # pieces follow the same (xr in (lo, hi), yr) order.
    cursor = [0]

    def take9():
        r = {}
        for xr in _XR:
            for yr in _XR:
                r[(xr, yr)] = refs[cursor[0]]
                cursor[0] += 1
        return r

    def take6():
        r = {}
        for xr in ("lo", "hi"):
            for yr in _XR:
                r[(xr, yr)] = refs[cursor[0]]
                cursor[0] += 1
        return r

    f_r = take9()
    force_r = take9() if force_mode == "field" else None
    flags_r = take9() if has_flags else None
    bc_r = take9() if has_bc else None
    if has_halos:
        # sharded (non-periodic x) mode: the first/last x-program's lo/hi
        # pieces come from the ppermute'd neighbour row operands instead
        # of the periodic x-wrap (see pallas_lbm halo mode); y stays
        # periodic within the shard.
        first = pl.program_id(0) == 0
        last = pl.program_id(0) == pl.num_programs(0) - 1

        def sub(main, halo):
            for (xr, yr), h in halo.items():
                cond = first if xr == "lo" else last
                main[(xr, yr)] = jnp.where(cond, h[:], main[(xr, yr)][:])

        sub(f_r, take6())
        if force_mode == "field":
            sub(force_r, take6())
        if has_flags:
            sub(flags_r, take6())
        if has_bc:
            sub(bc_r, take6())
    omega_ref = refs[cursor[0]]
    cursor[0] += 1
    if force_mode == "smem":
        force_ref = refs[cursor[0]]
        cursor[0] += 1
        force_u = (force_ref[0], force_ref[1], force_ref[2])
    out = refs[-1]

    omega = omega_ref[0]

    # each region only feeds the pull for the directions that cross into
    # the body from its side: x-lo needs cx=+1, x-hi cx=-1, y likewise;
    # corners therefore collide exactly 1 population, edges 5, body 19
    def _match(r, c):
        return (c == 1 if r == "lo" else c == -1 if r == "hi" else True)

    post = {}
    for key in f_r:
        xr, yr = key
        qs = frozenset(
            q for q in range(19)
            if _match(xr, int(_C[q, 0])) and _match(yr, int(_C[q, 1]))
        )
        if force_mode == "field":
            frc = force_r[key][:]
        elif force_mode == "smem":
            frc = force_u
        else:
            frc = None
        post[key] = _collide_local(
            f_r[key][:], frc, omega,
            flags_r[key][:] if has_flags else None,
            bc_r[key][:] if has_bc else None,
            bc_density,
            qs=None if key == ("body", "body") else qs,
        )

    for q in range(19):
        cx, cy, cz = int(_C[q, 0]), int(_C[q, 1]), int(_C[q, 2])
        for xs_out, xr, xs_src in _parts(cx, tx):
            for ys_out, yr, ys_src in _parts(cy, ty):
                src = post[(xr, yr)][q]
                xsl = xs_src if xr == "body" else slice(0, 1)
                ysl = ys_src if yr == "body" else slice(0, 1)
                val = src[xsl, ysl, :]
                if cz:
                    val = pltpu.roll(val, shift=cz % val.shape[2], axis=2)
                out[q, xs_out, ys_out] = val


def pick_txy(X, Y, Z, c_in=27, vmem_budget=48 * 2 ** 20):
    """Pick a (tx, ty) tile whose working set fits VMEM, minimising the
    halo read amplification (tx+2)(ty+2)/(tx*ty).  Returns (0, 0) when no
    tile fits.  Model mirrors pallas_lbm._pick_tx: double-buffered ins
    ((tx+2)(ty+2) site-columns of ``c_in`` channels, y-extents padded to
    the 8-sublane tile) + out (tx*ty, 19 ch) + one set of 19 post
    temporaries."""
    zp = -(-Z // 128) * 128
    col = zp * 4

    def pad8(t):
        return -(-t // 8) * 8

    def sites_in(tx, ty):
        typ = pad8(ty)
        # body + 2 x-halo rows (ty cols) + 2 y-halo cols (tx rows, padded
        # to 8 sublanes each) + 4 corners (1x1 -> 8 sublanes)
        return (tx + 2) * typ + 2 * tx * pad8(1) + 2 * pad8(1)

    def need(tx, ty):
        s_in = sites_in(tx, ty)
        s_out = tx * pad8(ty)
        return (2 * (s_in * c_in + s_out * 19) + s_in * 19) * col

    best, best_amp = (0, 0), float("inf")
    xdivs = [t for t in range(1, X + 1) if X % t == 0 and t <= 64]
    ydivs = [t for t in range(1, Y + 1) if Y % t == 0 and t <= 64]
    for tx in xdivs:
        for ty in ydivs:
            if ty % 8 and ty != Y:
                continue  # unpadded sublane tiles only (or full Y)
            if need(tx, ty) >= vmem_budget:
                continue
            amp = (tx + 2) * (ty + 2) / (tx * ty)
            # prefer fewer, larger programs on ties
            if amp < best_amp - 1e-9 or (
                abs(amp - best_amp) < 1e-9 and tx * ty > best[0] * best[1]
            ):
                best, best_amp = (tx, ty), amp
    return best


@functools.partial(
    jax.jit, static_argnames=("tx", "ty", "interpret", "bc_density")
)
def stream_collide_pallas_2d(
    f, force, omega, flags, bc_velocity=None, tx=None, ty=None,
    interpret=None, bc_density=None, halos=None,
):
    """2-D tiled drop-in for pallas_lbm.stream_collide_pallas (periodic,
    canonical layout, scalar omega).  ``force`` follows the same fast
    paths: [3, X, Y, Z] field, [3] uniform (SMEM), or None.

    ``halos``: sharded mode, same contract as the 1-D kernel — a dict of
    (lo_row, hi_row) x-neighbour rows per field operand; x becomes
    non-periodic at the shard edges while y stays periodic."""
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
    has_bc = bc_velocity is not None
    has_halos = halos is not None
    if has_halos:
        assert "f" in halos, "halos requires the 'f' (lo, hi) row pair"
    dtype = f.dtype
    omega_arr = jnp.asarray(omega, dtype)
    assert omega_arr.ndim == 0, "2-D kernel supports scalar omega only"

    c_in = (19 + (3 if force_mode == "field" else 0)
            + (1 if has_flags else 0) + (3 if has_bc else 0))
    if tx is None or ty is None:
        ptx, pty = pick_txy(X, Y, Z, c_in)
        tx = ptx if tx is None else tx
        ty = pty if ty is None else ty
    assert tx > 0 and ty > 0, "no (tx, ty) tile fits VMEM"
    assert X % tx == 0 and Y % ty == 0, (X, tx, Y, ty)
    nx, ny = X // tx, Y // ty

    flags_i = flags.astype(jnp.int32) if has_flags else None

    # --- 9-region specs with periodic modular index maps ----------------
    def maps(lead):
        """index maps for (xr, yr) regions; ``lead`` extra leading dim."""
        def mk(xr, yr):
            def m(i, j):
                xi = {"lo": lambda: (i * tx - 1) % X,
                      "body": lambda: i,
                      "hi": lambda: ((i + 1) * tx) % X}[xr]()
                yj = {"lo": lambda: (j * ty - 1) % Y,
                      "body": lambda: j,
                      "hi": lambda: ((j + 1) * ty) % Y}[yr]()
                return ((0, xi, yj, 0) if lead else (xi, yj, 0))
            return m
        return mk

    V = pltpu.VMEM

    def add9(arr, ch):
        lead = ch is not None
        mk = maps(lead)
        specs, args = [], []
        for xr in _XR:
            for yr in _XR:
                bx = tx if xr == "body" else 1
                by = ty if yr == "body" else 1
                shape = ((ch, bx, by, Z) if lead else (bx, by, Z))
                specs.append(pl.BlockSpec(shape, mk(xr, yr),
                                          memory_space=V))
                args.append(arr)
        return specs, args

    in_specs, args = add9(f, Q)
    if force_mode == "field":
        s, a = add9(force, 3)
        in_specs += s
        args += a
    if has_flags:
        s, a = add9(flags_i, None)
        in_specs += s
        args += a
    if has_bc:
        s, a = add9(bc_velocity, 3)
        in_specs += s
        args += a
    if has_halos:
        # 6 pieces per field from the two [*, 1, Y, Z] neighbour rows:
        # (lo|hi) x (y-lo, y-body, y-hi), y indexed with the same modular
        # maps as the main operand's y regions
        def add6(pair, ch):
            lead = ch is not None

            def mk(yr):
                def m(i, j):
                    yj = {"lo": lambda: (j * ty - 1) % Y,
                          "body": lambda: j,
                          "hi": lambda: ((j + 1) * ty) % Y}[yr]()
                    return ((0, 0, yj, 0) if lead else (0, yj, 0))
                return m

            specs, ops = [], []
            for row in pair:
                for yr in _XR:
                    by = ty if yr == "body" else 1
                    shape = ((ch, 1, by, Z) if lead else (1, by, Z))
                    specs.append(
                        pl.BlockSpec(shape, mk(yr), memory_space=V)
                    )
                    ops.append(row)
            return specs, ops

        s, a = add6(halos["f"], Q)
        in_specs += s
        args += a
        if force_mode == "field":
            s, a = add6(halos["force"], 3)
            in_specs += s
            args += a
        if has_flags:
            flo, fhi = halos["flags"]
            s, a = add6((flo.astype(jnp.int32), fhi.astype(jnp.int32)),
                        None)
            in_specs += s
            args += a
        if has_bc:
            s, a = add6(halos["bc"], 3)
            in_specs += s
            args += a
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(omega_arr.reshape(1))
    if force_mode == "smem":
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(force, dtype))

    def out_map(i, j):
        return (0, i, j, 0)

    kernel = functools.partial(
        _kernel2d, tx, ty, has_bc,
        float(bc_density) if bc_density is not None else None,
        force_mode, has_flags, has_halos,
    )
    return pl.pallas_call(
        kernel,
        grid=(nx, ny),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Q, tx, ty, Z), out_map, memory_space=V),
        out_shape=jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=350 * X * Y * Z,
            bytes_accessed=(c_in + 19) * X * Y * Z * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
