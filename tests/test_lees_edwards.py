"""Lees-Edwards sheared periodic boundary: a uniform shear profile through
the z-wrap must be a steady state (the oracle for the sheared-copy
interpolation + Galilean shift)."""

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.lees_edwards import le_stream_collide

jax.config.update("jax_enable_x64", True)


def test_uniform_shear_steady():
    X, Y, Z = 16, 8, 16
    gamma = 1e-3  # du_x/dz per lu
    z = jnp.arange(Z, dtype=jnp.float64)
    ux = gamma * (z - (Z - 1) / 2.0)
    u = jnp.zeros((3, X, Y, Z), jnp.float64)
    u = u.at[0].set(jnp.broadcast_to(ux, (X, Y, Z)))
    rho = jnp.ones((X, Y, Z), jnp.float64)
    f = lbm.equilibrium_dev(rho, u)
    force = jnp.zeros((3, X, Y, Z), jnp.float64)
    u_rel = gamma * Z  # relative image velocity

    displacement = 0.0
    for n in range(200):
        f = le_stream_collide(f, force, 1.0, displacement, u_rel)
        displacement += u_rel

    _, u_out = lbm.macroscopic(f, force)
    prof = np.asarray(u_out[0].mean(axis=(0, 1)))
    expect = np.asarray(ux)
    np.testing.assert_allclose(prof, expect, atol=gamma * 0.2)
    # mass conserved
    np.testing.assert_allclose(float(jnp.sum(f)), 0.0, atol=1e-10)  # dev storage: sum h = 0 at rho=1


def test_le_reduces_to_periodic_at_zero_shear():
    X, Y, Z = 8, 8, 8
    key = jax.random.PRNGKey(0)
    rho = 1.0 + 0.01 * jax.random.normal(key, (X, Y, Z), jnp.float64)
    u = 0.01 * jax.random.normal(key, (3, X, Y, Z), jnp.float64)
    f = lbm.equilibrium_dev(rho, u)
    force = jnp.zeros((3, X, Y, Z), jnp.float64)
    flags = jnp.zeros((X, Y, Z), jnp.uint8)
    a = le_stream_collide(f, force, 0.9, 0.0, 0.0)
    b = lbm.stream_collide(f, force, 0.9, flags)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-14)


def test_le_pallas_matches_jnp():
    """The fused-kernel LE path (corrected planes substituted inside the
    Pallas stream-collide) is numerically identical to le_stream_collide."""
    from hemocell_tpu.fluid.lees_edwards import le_stream_collide_pallas

    X, Y, Z = 16, 8, 8
    key = jax.random.PRNGKey(1)
    f = jax.random.uniform(key, (19, X, Y, Z), jnp.float32, -1e-3, 1e-3)
    force = jnp.zeros((3, X, Y, Z), jnp.float32).at[0].set(1e-6)
    omega, U = 1.1, 0.02
    a = b = f
    disp = 0.0
    for _ in range(5):
        a = le_stream_collide(a, force, omega, disp, U)
        b = le_stream_collide_pallas(b, force, omega, disp, U,
                                     interpret=True)
        disp += U
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_le_pallas_omega_field_falls_back():
    """LE + interior viscosity (spatially varying omega): the fused kernel
    takes a scalar omega only; the wrapper must fall back to the jnp path
    instead of crashing at trace time."""
    import jax.numpy as jnp
    import numpy as np

    from hemocell_tpu.fluid.lees_edwards import (
        le_stream_collide, le_stream_collide_pallas)

    rng = np.random.default_rng(3)
    X = Y = Z = 8
    f = jnp.asarray(rng.normal(0, 1e-3, (19, X, Y, Z)), jnp.float32)
    force = jnp.zeros((3, X, Y, Z), jnp.float32)
    omega = jnp.full((X, Y, Z), 1.1, jnp.float32).at[:, :, :4].set(0.9)
    disp = jnp.asarray(1.37, jnp.float32)
    out_p = le_stream_collide_pallas(f, force, omega, disp, 0.02)
    out_j = le_stream_collide(f, force, omega, disp, 0.02)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_j))
