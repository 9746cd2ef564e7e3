"""D3Q19 fluid kernel tests: conservation, Poiseuille, Couette, strain rate.

These are the kernel-level unit tests the reference lacks (SURVEY.md §4);
analytic oracles instead of full-simulation thresholds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_VELOCITY, FLAG_WALL
from hemocell_tpu.fluid import d3q19, lbm

jax.config.update("jax_enable_x64", True)

DT = jnp.float64


def test_lattice_constants():
    # isotropy: sum w c_a c_b = cs^2 delta_ab
    for a in range(3):
        for b in range(3):
            s = float(np.sum(d3q19.W * d3q19.C[:, a] * d3q19.C[:, b]))
            expect = 1.0 / 3.0 if a == b else 0.0
            np.testing.assert_allclose(s, expect, atol=1e-14)
    assert float(np.sum(d3q19.W)) == pytest.approx(1.0)


def test_equilibrium_macroscopic_roundtrip():
    shape = (4, 5, 6)
    rho = jnp.full(shape, 1.05, DT)
    u = jnp.stack([
        jnp.full(shape, 0.02, DT),
        jnp.full(shape, -0.01, DT),
        jnp.full(shape, 0.005, DT),
    ])
    f = lbm.equilibrium_dev(rho, u)
    rho2, u2 = lbm.macroscopic(f)
    np.testing.assert_allclose(np.asarray(rho2), np.asarray(rho), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-12)


def test_collision_conserves_mass_momentum():
    key = jax.random.PRNGKey(0)
    shape = (4, 4, 4)
    rho = 1.0 + 0.01 * jax.random.normal(key, shape, DT)
    u = 0.01 * jax.random.normal(key, (3,) + shape, DT)
    f = lbm.equilibrium_dev(rho, u)
    # perturb off equilibrium
    f = f * (1.0 + 0.01 * jax.random.normal(key, f.shape, DT))
    force = jnp.zeros((3,) + shape, DT)
    flags = jnp.zeros(shape, jnp.uint8)
    f2 = lbm.collide(f, force, 1.0, flags)
    rho1, u1 = lbm.macroscopic(f)
    rho2, u2 = lbm.macroscopic(f2)
    np.testing.assert_allclose(np.asarray(rho2), np.asarray(rho1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rho2[None] * u2), np.asarray(rho1[None] * u1), atol=1e-13
    )


def test_guo_force_momentum_input():
    # with force F, momentum after collide+stream grows by F per step
    shape = (4, 4, 4)
    f = lbm.initial_state(shape, dtype=DT)
    F = 1e-5
    force = jnp.zeros((3,) + shape, DT).at[0].set(F)
    flags = jnp.zeros(shape, jnp.uint8)
    nsteps = 10
    for _ in range(nsteps):
        f = lbm.stream_collide(f, force, 1.0, flags)
    rho, u = lbm.macroscopic(f, force)
    # uniform acceleration: Sum f c grows by F per step, and the Guo
    # half-force shift adds F/2 -> u = (n + 1/2) F / rho
    np.testing.assert_allclose(float(u[0].mean()), (nsteps + 0.5) * F, rtol=1e-6)


def test_poiseuille_profile():
    """Body-force-driven channel flow between bounce-back walls."""
    H = 16  # fluid layers
    ny = H + 2
    shape = (4, ny, 4)
    tau = 1.0
    nu = (tau - 0.5) / 3.0
    F = 1e-6
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags = jnp.asarray(flags)
    force = jnp.zeros((3,) + shape, DT).at[0].set(F)
    f = lbm.initial_state(shape, dtype=DT)

    @jax.jit
    def run(f, n):
        def body(_, f):
            return lbm.stream_collide(f, force, 1.0 / tau, flags)
        return jax.lax.fori_loop(0, n, body, f)

    f = run(f, 4000)
    _, u = lbm.macroscopic(f, force)
    ux = np.asarray(u[0][0, :, 0])
    # full-way bounce-back: walls at y=0.5 and y=ny-1.5
    y = np.arange(ny) - 0.5
    Heff = ny - 2.0
    analytic = F / (2 * nu) * y * (Heff - y)
    fluid = slice(1, ny - 1)
    np.testing.assert_allclose(ux[fluid], analytic[fluid], rtol=0.02)
    # wall nodes carry no meaningful velocity; just check umax magnitude
    umax = F * Heff**2 / (8 * nu)
    np.testing.assert_allclose(ux.max(), umax, rtol=0.02)


def test_couette_profile_and_strain_rate():
    """Moving top plate via velocity nodes -> linear profile."""
    ny = 18
    shape = (4, ny, 4)
    U = 0.02
    tau = 0.8
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_VELOCITY
    flags[:, -1, :] = FLAG_VELOCITY
    flags = jnp.asarray(flags)
    bc_u = np.zeros((3,) + shape)
    bc_u[0, :, -1, :] = U
    bc_u = jnp.asarray(bc_u)
    force = jnp.zeros((3,) + shape, DT)
    f = lbm.initial_state(shape, dtype=DT)

    @jax.jit
    def run(f, n):
        def body(_, f):
            return lbm.stream_collide(f, force, 1.0 / tau, flags, bc_u)
        return jax.lax.fori_loop(0, n, body, f)

    f = run(f, 6000)
    _, u = lbm.macroscopic(f, force)
    ux = np.asarray(u[0][0, :, 0])
    # moving bounce-back: plates at y=0.5 and y=ny-1.5, gap H=ny-2
    y = np.arange(ny)
    analytic = U * (y - 0.5) / (ny - 2)
    fluid = slice(1, ny - 1)
    np.testing.assert_allclose(ux[fluid], analytic[fluid], atol=U * 0.02)

    # strain rate: S_xy = gamma/2
    gamma = U / (ny - 2)
    s = lbm.strain_rate_tensor(f, force, 1.0 / tau)
    s_xy = np.asarray(s[3][0, 3:-3, 0])
    np.testing.assert_allclose(s_xy, gamma / 2, rtol=0.05)
    g = lbm.shear_rate_magnitude(f, force, 1.0 / tau)
    np.testing.assert_allclose(np.asarray(g[0, 3:-3, 0]), gamma, rtol=0.05)


def test_bounce_back_mass_conservation():
    """Closed box with walls on all sides: total mass constant."""
    shape = (10, 10, 10)
    flags = np.zeros(shape, np.uint8)
    flags[0], flags[-1] = FLAG_WALL, FLAG_WALL
    flags[:, 0], flags[:, -1] = FLAG_WALL, FLAG_WALL
    flags[:, :, 0], flags[:, :, -1] = FLAG_WALL, FLAG_WALL
    flags = jnp.asarray(flags)
    key = jax.random.PRNGKey(1)
    rho = 1.0 + 0.05 * jax.random.normal(key, shape, DT)
    u = 0.02 * jax.random.normal(key, (3,) + shape, DT)
    f = lbm.equilibrium_dev(rho, u)
    force = jnp.zeros((3,) + shape, DT)
    m0 = float(jnp.sum(f))
    for _ in range(50):
        f = lbm.stream_collide(f, force, 1.0, flags)
    np.testing.assert_allclose(float(jnp.sum(f)), m0, rtol=1e-12)
