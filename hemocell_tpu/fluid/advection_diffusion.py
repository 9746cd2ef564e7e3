"""CEPAC scalar advection-diffusion lattice.

TPU-native equivalent of the reference's optional CEPAC field — a second
D3Q19 lattice with ``AdvectionDiffusionBGKdynamics`` one-way coupled to the
fluid velocity (reference: core/hemoCellFields.cpp:113-139 createCEPACfield,
iterated at core/hemoCell.cpp:320-325), used for the platelet-activation
chemical in the solidification cases (cases/CEPAC).

Advection-diffusion D3Q19 BGK:
    g_eq_i = w_i * C * (1 + 3 c_i . u)           (linear equilibrium)
    g' = g - (1/tau_AD) (g - g_eq)               tau_AD = 3 D + 0.5
Dirichlet concentration nodes (``addTemperatureBoundary`` +
``setBoundaryDensity`` in the reference) are realised with a mask + value
field: g := g_eq(C_bc, u) at those nodes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import d3q19
from .lbm import stream


def ad_equilibrium(conc, u):
    """g_eq[i] = w_i C (1 + 3 c.u); conc [X,Y,Z], u [3,X,Y,Z]."""
    c = jnp.asarray(d3q19.C, u.dtype)
    w = jnp.asarray(d3q19.W, u.dtype)
    cu = jnp.tensordot(c, u, axes=([1], [0]))
    w_b = w.reshape((19,) + (1,) * 3)
    return w_b * conc[None] * (1.0 + 3.0 * cu)


def concentration(g):
    return jnp.sum(g, axis=0)


def ad_collide(g, u, tau_ad, dirichlet_mask=None, dirichlet_value=None):
    conc = concentration(g)
    geq = ad_equilibrium(conc, u)
    out = g - (1.0 / tau_ad) * (g - geq)
    if dirichlet_mask is not None:
        geq_bc = ad_equilibrium(dirichlet_value, u)
        out = jnp.where(dirichlet_mask[None] > 0, geq_bc, out)
    return out


def ad_stream_collide(g, u, tau_ad, dirichlet_mask=None, dirichlet_value=None):
    """One CEPAC step (collide then stream), mirroring
    ``CEPACfield->collideAndStream()``."""
    return stream(ad_collide(g, u, tau_ad, dirichlet_mask, dirichlet_value))


def _ad_kernel(tx, tau_ad, has_bc, *refs):
    """Fused AD collide+stream over one X-slab (same halo-row scheme as
    pallas_lbm._kernel, far simpler collide)."""
    if has_bc:
        (g_lo, g_body, g_hi, u_lo, u_body, u_hi,
         m_lo, m_body, m_hi, v_lo, v_body, v_hi, out) = refs
    else:
        (g_lo, g_body, g_hi, u_lo, u_body, u_hi, out) = refs
        m_lo = m_body = m_hi = v_lo = v_body = v_hi = None

    inv_tau = 1.0 / tau_ad

    def region(g_r, u_r, m_r, v_r):
        g = g_r[:]
        u = u_r[:]
        conc = g[0]
        for q in range(1, 19):
            conc = conc + g[q]
        # hoist the Dirichlet operand reads out of the 19-population loop
        # (one block load each instead of 19)
        vbc = v_r[:] if m_r is not None else None
        mbc = (m_r[:] > 0) if m_r is not None else None
        outs = []
        for q in range(19):
            cx, cy, cz = (int(v) for v in d3q19.C[q])
            wq = float(d3q19.W[q])
            cu = None
            for i, c in enumerate((cx, cy, cz)):
                if c:
                    t = u[i] if c > 0 else -u[i]
                    cu = t if cu is None else cu + t
            geq = wq * conc if cu is None else wq * conc * (1.0 + 3.0 * cu)
            o = g[q] - inv_tau * (g[q] - geq)
            if m_r is not None:
                geq_bc = (
                    wq * vbc if cu is None
                    else wq * vbc * (1.0 + 3.0 * cu)
                )
                o = jnp.where(mbc, geq_bc, o)
            outs.append(o)
        return outs

    post_b = region(g_body, u_body, m_body, v_body)
    post_l = region(g_lo, u_lo, m_lo, v_lo)
    post_h = region(g_hi, u_hi, m_hi, v_hi)

    for q in range(19):
        cx, cy, cz = (int(v) for v in d3q19.C[q])

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


@functools.partial(jax.jit, static_argnames=("tau_ad", "tx", "interpret"))
def ad_stream_collide_pallas(g, u, tau_ad, dirichlet_mask=None,
                             dirichlet_value=None, tx=None, interpret=None):
    """Fused-kernel CEPAC step — bit-compatible with ad_stream_collide
    (same formulas, f32); falls back to the jnp path when a (Y, Z) plane
    row exceeds VMEM."""
    from .pallas_lbm import _pick_tx

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Q, X, Y, Z = g.shape
    if tx is None:
        tx = _pick_tx(X, Y, Z)
    if tx == 0:
        return ad_stream_collide(g, u, tau_ad, dirichlet_mask,
                                 dirichlet_value)
    n = X // tx
    has_bc = dirichlet_mask is not None

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
    in_specs = [
        pl.BlockSpec((Q, 1, Y, Z), lo4, memory_space=V),
        pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V),
        pl.BlockSpec((Q, 1, Y, Z), hi4, memory_space=V),
        pl.BlockSpec((3, 1, Y, Z), lo4, memory_space=V),
        pl.BlockSpec((3, tx, Y, Z), body4, memory_space=V),
        pl.BlockSpec((3, 1, Y, Z), hi4, memory_space=V),
    ]
    args = [g, g, g, u, u, u]
    if has_bc:
        m = dirichlet_mask.astype(jnp.int32)
        v = jnp.asarray(dirichlet_value, g.dtype)
        in_specs += [
            pl.BlockSpec((1, Y, Z), lo3, memory_space=V),
            pl.BlockSpec((tx, Y, Z), body3, memory_space=V),
            pl.BlockSpec((1, Y, Z), hi3, memory_space=V),
            pl.BlockSpec((1, Y, Z), lo3, memory_space=V),
            pl.BlockSpec((tx, Y, Z), body3, memory_space=V),
            pl.BlockSpec((1, Y, Z), hi3, memory_space=V),
        ]
        args += [m, m, m, v, v, v]

    kernel = functools.partial(_ad_kernel, tx, float(tau_ad), has_bc)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Q, tx, Y, Z), body4, memory_space=V),
        out_shape=jax.ShapeDtypeStruct((Q, X, Y, Z), g.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=150 * X * Y * Z,
            bytes_accessed=(19 * 2 + 3) * X * Y * Z * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def ad_initial_state(shape, conc0=0.0, dtype=jnp.float32):
    conc = jnp.full(shape, conc0, dtype=dtype)
    u = jnp.zeros((3,) + shape, dtype=dtype)
    return ad_equilibrium(conc, u)


def tau_from_diffusivity(d_lbm: float) -> float:
    """tau_AD = 3 D + 0.5 (cases/CEPAC/CEPAC.cpp:56)."""
    return 3.0 * d_lbm + 0.5
