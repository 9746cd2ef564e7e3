"""Lattice-Boltzmann fluid solver: BGK collision with Guo forcing, bounce-back
walls, prescribed-velocity nodes, periodic streaming.

TPU-native replacement for the Palabos ``GuoExternalForceBGKdynamics`` +
``collideAndStream`` hot loop (reference: core/hemoCell.cpp:317 and the
Palabos engine).  Design:

  * populations ``f: [19, X, Y, Z]`` (direction-major), one dense array per
    (sub)domain; sparse MultiBlock decomposition is replaced by GSPMD
    sharding of these dense arrays over a device mesh.
  * per-node dynamics objects are replaced by a ``flags`` uint8 field
    (0 fluid / 1 bounce-back wall / 2 velocity node) and masked ``where``
    branches inside a single fused collision, plus an optional per-node
    ``omega`` field (interior viscosity, reference: helper/interiorViscosity).
  * streaming is 19 static periodic rolls (push scheme); XLA lowers the
    shifts on a sharded array to ICI halo exchanges automatically.
  * Guo forcing: u = (sum_i c_i f_i + F/2)/rho used in the equilibrium, and
    a source term S_i = (1 - omega/2) w_i [3(c-u) + 9(c.u)c] . F.
  * **Deviation storage**: the ``f`` arrays hold ``h_i = f_i - w_i`` — the
    population minus its lattice weight (Palabos stores the same ``fBar``).
    At f32 this is essential: raw populations sit at O(w) ~ 0.05 where one
    ulp is ~4e-9, so weak Guo forcing (e.g. the stenosis case's 2.6e-8 lu
    pressure gradient) rounds away entirely; deviations sit near 0 with
    ~1e-12 resolution.  The algebra is unchanged except rho = 1 + sum h and
    the equilibrium loses its constant w term (``equilibrium_dev``);
    streaming, bounce-back and the Guo source are w-shift invariant.

Everything here is shape-static and jit/vmap/shard_map friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import FLAG_FLUID, FLAG_PRESSURE, FLAG_VELOCITY, FLAG_WALL
from . import d3q19


def _consts(dtype):
    c = jnp.asarray(d3q19.C, dtype=dtype)
    w = jnp.asarray(d3q19.W, dtype=dtype)
    return c, w


def equilibrium(rho, u, dtype=None):
    """f_eq[i] = w_i rho (1 + 3 c.u + 4.5 (c.u)^2 - 1.5 u.u).

    rho: [...], u: [3, ...] -> f_eq: [19, ...]
    """
    dtype = dtype or u.dtype
    c, w = _consts(dtype)
    cu = jnp.tensordot(c, u, axes=([1], [0]))  # [19, ...]
    usq = jnp.sum(u * u, axis=0)  # [...]
    shape = (19,) + (1,) * (u.ndim - 1)
    w_b = w.reshape(shape)
    return w_b * rho[None] * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * usq[None])


def equilibrium_dev(rho, u, dtype=None):
    """Deviation equilibrium ``feq_i - w_i`` for h-storage:
    w_i [(rho - 1) + rho (3 c.u + 4.5 (c.u)^2 - 1.5 u.u)].
    """
    dtype = dtype or u.dtype
    c, w = _consts(dtype)
    cu = jnp.tensordot(c, u, axes=([1], [0]))  # [19, ...]
    usq = jnp.sum(u * u, axis=0)  # [...]
    shape = (19,) + (1,) * (u.ndim - 1)
    w_b = w.reshape(shape)
    drho = rho - 1.0
    return w_b * (
        drho[None] + rho[None] * (3.0 * cu + 4.5 * cu * cu - 1.5 * usq[None])
    )


def macroscopic(f, force=None):
    """Density and Guo-corrected velocity from deviation populations.

    f: [19, X, Y, Z] holding h = f - w; force: [3, X, Y, Z] or None.
    Returns rho [X,Y,Z], u [3,X,Y,Z] with u including the +F/2 shift
    (the velocity the reference interpolates to particles).
    """
    c, _ = _consts(f.dtype)
    rho = 1.0 + jnp.sum(f, axis=0)
    mom = jnp.tensordot(c.T, f, axes=([1], [0]))  # [3, X, Y, Z]
    if force is not None:
        mom = mom + 0.5 * force
    u = mom / rho[None]
    return rho, u


def collide(f, force, omega, flags, bc_velocity=None, bc_density=None):
    """Fused BGK+Guo collision with masked bounce-back / velocity nodes.

    f:      [19, X, Y, Z] pre-collision populations
    force:  [3, X, Y, Z] external body + IBM force density
    omega:  scalar or [X, Y, Z] relaxation frequency
    flags:  uint8 [X, Y, Z]
    bc_velocity: [3, X, Y, Z] prescribed velocity (used at FLAG_VELOCITY)
    bc_density: scalar target density at FLAG_PRESSURE nodes (anti-bounce-
        back fixed-density outlet — the TPU-native replacement for the
        reference's Zou-He ``addPressureBoundary`` outlets, e.g.
        cases/preinlet_shear/preinlet_shear.cpp:113-115, setBoundaryDensity
        1.0 at cases/injured_vessel outlets)
    """
    dtype = f.dtype
    c, w = _consts(dtype)
    rho, u = macroscopic(f, force)
    feq = equilibrium_dev(rho, u)

    om = jnp.asarray(omega, dtype)
    if om.ndim == 0:
        om_b = om
    else:
        om_b = om[None]

    # Guo source: S_i = (1 - om/2) w_i [3(c - u) + 9 (c.u) c] . F
    cu = jnp.tensordot(c, u, axes=([1], [0]))  # [19,X,Y,Z]
    cF = jnp.tensordot(c, force, axes=([1], [0]))  # [19,X,Y,Z]
    uF = jnp.sum(u * force, axis=0)  # [X,Y,Z]
    w_b = w.reshape((19,) + (1,) * 3)
    S = w_b * (3.0 * (cF - uF[None]) + 9.0 * cu * cF)
    f_bgk = f - om_b * (f - feq) + (1.0 - 0.5 * om_b) * S

    # bounce-back: swap populations, no relaxation (Palabos BounceBack)
    f_bb = f[jnp.asarray(d3q19.OPP)]

    out = jnp.where((flags == FLAG_WALL)[None], f_bb, f_bgk)

    if bc_velocity is not None:
        # prescribed-velocity node: moving bounce-back (second-order, wall
        # plane half-way to the neighbouring fluid node):
        #   f'_i = f_opp(i) + 6 w_i (c_i . u_wall)
        cu_w = jnp.tensordot(c, bc_velocity.astype(dtype), axes=([1], [0]))
        f_mb = f_bb + 6.0 * w_b * cu_w
        out = jnp.where((flags == FLAG_VELOCITY)[None], f_mb, out)

    if bc_density is not None:
        # fixed-density node, second order: keep the node's post-collision
        # NON-EQUILIBRIUM part and shift only the equilibrium to the target
        # density —  f' = f_bgk + w (rho0 - rho)(1 + 3c.u + 4.5(c.u)^2
        # - 1.5u^2)  =  feq(rho0, u) + f^neq.  Density lands on rho0
        # exactly (the polynomial sums to 1), velocity is preserved, and
        # outlet-adjacent stress matches the reference's Zou-He
        # ``addPressureBoundary`` at second order.  (Anti-bounce-back with
        # the local u was tried and is unstable next to velocity inlets;
        # the earlier pure-equilibrium variant discarded f^neq and was only
        # first-order in the stress.)
        rho0 = jnp.asarray(bc_density, dtype)
        usq = jnp.sum(u * u, axis=0)[None]
        f_pr = f_bgk + w_b * (rho0 - rho[None]) * (
            1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * usq
        )
        out = jnp.where((flags == FLAG_PRESSURE)[None], f_pr, out)
    return out


def stream(f):
    """Push-scheme periodic streaming: population i moves along C[i]."""
    outs = []
    for i in range(19):
        cx, cy, cz = (int(v) for v in d3q19.C[i])
        fi = f[i]
        if cx or cy or cz:
            fi = jnp.roll(fi, shift=(cx, cy, cz), axis=(0, 1, 2))
        outs.append(fi)
    return jnp.stack(outs, axis=0)


def stream_collide(f, force, omega, flags, bc_velocity=None,
                   bc_density=None):
    """One full LBM step (collide then stream), the reference's
    ``lattice->collideAndStream()``."""
    return stream(collide(f, force, omega, flags, bc_velocity, bc_density))


def initial_state(shape, rho0=1.0, u0=(0.0, 0.0, 0.0), dtype=jnp.float32):
    """Equilibrium deviation populations at uniform rho/velocity
    (exactly zero for the rho=1 rest state).

    shape: (X, Y, Z)
    """
    rho = jnp.full(shape, rho0, dtype=dtype)
    u = jnp.stack(
        [jnp.full(shape, v, dtype=dtype) for v in u0], axis=0
    )
    return equilibrium_dev(rho, u)


def strain_rate_tensor(f, force, omega):
    """Strain-rate tensor from the non-equilibrium stress (Pi_neq):
    S_ab = -(3 omega / 2 rho) Pi_neq_ab  (same closed form the reference
    uses for shear outputs and Tresca solidification,
    core/hemoCellParticleField.cpp:951-1070).

    Returns [6, X, Y, Z] with Voigt order xx, yy, zz, xy, xz, yz.
    """
    dtype = f.dtype
    c, _ = _consts(dtype)
    rho, u = macroscopic(f, force)
    feq = equilibrium_dev(rho, u)
    fneq = f - feq
    pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    comps = []
    for a, b in pairs:
        cab = (c[:, a] * c[:, b]).reshape((19, 1, 1, 1))
        comps.append(jnp.sum(cab * fneq, axis=0))
    pi_neq = jnp.stack(comps, axis=0)
    om = jnp.asarray(omega, dtype)
    om_b = om if om.ndim == 0 else om[None]
    return -1.5 * om_b * pi_neq / rho[None]


def shear_rate_magnitude(f, force, omega):
    """gamma_dot = sqrt(2 S:S)."""
    s = strain_rate_tensor(f, force, omega)
    sq = (
        s[0] ** 2 + s[1] ** 2 + s[2] ** 2
        + 2.0 * (s[3] ** 2 + s[4] ** 2 + s[5] ** 2)
    )
    return jnp.sqrt(2.0 * sq)
