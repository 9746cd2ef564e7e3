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

import jax.numpy as jnp

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


def ad_initial_state(shape, conc0=0.0, dtype=jnp.float32):
    conc = jnp.full(shape, conc0, dtype=dtype)
    u = jnp.zeros((3,) + shape, dtype=dtype)
    return ad_equilibrium(conc, u)


def tau_from_diffusivity(d_lbm: float) -> float:
    """tau_AD = 3 D + 0.5 (cases/CEPAC/CEPAC.cpp:56)."""
    return 3.0 * d_lbm + 0.5
