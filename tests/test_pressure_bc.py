"""Fixed-density pressure outlet nodes (second-order non-equilibrium-
retaining density Dirichlet: f' = feq(rho0, u) + f_neq).

Reference counterpart: Zou-He pressure boundaries
(cases/preinlet_shear/preinlet_shear.cpp:113-115 ``addPressureBoundary0P`` +
``setBoundaryDensity`` 1.0; same pattern in cases/injured_vessel).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.config.defaults import FLAG_PRESSURE, FLAG_VELOCITY, FLAG_WALL
from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.pallas_lbm import stream_collide_pallas

DT = jnp.float64


def test_rest_state_is_fixed_point():
    shape = (8, 6, 10)
    flags = np.zeros(shape, np.uint8)
    flags[-1] = FLAG_PRESSURE
    flags = jnp.asarray(flags)
    f = lbm.initial_state(shape, dtype=DT)
    force = jnp.zeros((3,) + shape, DT)
    out = lbm.stream_collide(f, force, 1.0, flags, bc_density=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-14)


def test_density_relaxes_to_outlet_value():
    shape = (8, 6, 10)
    flags = np.zeros(shape, np.uint8)
    flags[-1] = FLAG_PRESSURE
    flags = jnp.asarray(flags)
    f = lbm.initial_state(shape, rho0=1.02, dtype=DT)
    force = jnp.zeros((3,) + shape, DT)
    rho_start = float(jnp.mean(1.0 + jnp.sum(f, 0)))
    for _ in range(400):
        f = lbm.stream_collide(f, force, 1.0, flags, bc_density=1.0)
    interior = 1.0 + jnp.sum(f, 0)[:-1]
    rho_end = float(jnp.mean(interior))
    assert rho_start > 1.019
    # the outlet drains the over-pressure
    assert abs(rho_end - 1.0) < 0.002, rho_end


def test_inlet_outlet_channel_flow_develops():
    # velocity inlet at x=0, pressure outlet at x=-1, bounce-back z walls:
    # a through-flow develops and mass does not blow up
    shape = (24, 4, 12)
    u_in = 0.02
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    flags[0] = FLAG_VELOCITY
    flags[-1] = FLAG_PRESSURE
    flags = jnp.asarray(flags)
    bc = np.zeros((3,) + shape)
    bc[0, 0] = u_in
    bc = jnp.asarray(bc, DT)
    f = lbm.initial_state(shape, dtype=DT)
    force = jnp.zeros((3,) + shape, DT)
    for _ in range(600):
        f = lbm.stream_collide(f, force, 1.0, flags, bc, bc_density=1.0)
    rho, u = lbm.macroscopic(f, force)
    mid = np.asarray(u[0][shape[0] // 2, :, 1:-1])
    assert mid.mean() > 0.5 * u_in, mid.mean()
    assert np.isfinite(np.asarray(f)).all()
    # interior density stays near the outlet value (boundary-node "rho" is
    # not a density — velocity nodes hold moving-BB populations)
    assert float(jnp.abs(rho[1:-1, :, 1:-1] - 1.0).max()) < 0.1


def test_pallas_matches_jnp():
    shape = (8, 8, 128)
    key = jax.random.PRNGKey(3)
    rho = 1.0 + 0.02 * jax.random.normal(key, shape, jnp.float32)
    u = 0.02 * jax.random.normal(key, (3,) + shape, jnp.float32)
    f = lbm.equilibrium_dev(rho, u).astype(jnp.float32)
    force = jnp.zeros((3,) + shape, jnp.float32)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[-1] = FLAG_PRESSURE
    flags = jnp.asarray(flags)
    bc = jnp.zeros((3,) + shape, jnp.float32)
    a = lbm.stream_collide(f, force, 1.0, flags, bc, bc_density=1.0)
    b = stream_collide_pallas(
        f, force, 1.0, flags, bc, tx=4, interpret=True, bc_density=1.0
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_outlet_is_second_order():
    """The scheme is f' = feq(rho0, u) + f_neq: density lands on rho0
    EXACTLY after collision, and the node's non-equilibrium part (stress)
    is retained rather than discarded (the old first-order variant)."""
    rng = np.random.default_rng(11)
    shape = (4, 4, 8)
    flags = np.zeros(shape, np.uint8)
    flags[-1] = FLAG_PRESSURE
    flags = jnp.asarray(flags)
    # a perturbed state carrying genuine non-equilibrium
    f = jnp.asarray(rng.normal(0, 1e-3, (19,) + shape), DT)
    force = jnp.zeros((3,) + shape, DT)
    rho0 = 1.002
    # omega != 1: at omega=1 BGK fully relaxes f_neq and the two schemes
    # coincide trivially
    out = lbm.collide(f, force, 0.8, flags, bc_density=rho0)
    # exact density at every outlet node (deviation storage: rho = 1+sum)
    rho_out = 1.0 + np.asarray(out[:, -1]).sum(axis=0)
    np.testing.assert_allclose(rho_out, rho0, atol=1e-12)
    # non-equilibrium retained: out differs from the pure equilibrium at
    # (rho0, u) by the post-collision f_neq, which is nonzero here
    rho, u = lbm.macroscopic(f, force)
    feq0 = lbm.equilibrium_dev(jnp.full_like(rho, rho0), u)
    dneq = np.abs(np.asarray(out[:, -1]) - np.asarray(feq0[:, -1])).max()
    assert dneq > 1e-6, "outlet discarded the non-equilibrium part"
