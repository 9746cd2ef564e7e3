"""Fused Pallas stream-collide kernel vs the jnp reference implementation
(interpret mode on the CPU test mesh; the same kernel compiles natively on
TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu.config.defaults import FLAG_VELOCITY, FLAG_WALL
from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.pallas_lbm import stream_collide_pallas


def _setup(shape=(8, 8, 128)):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rho = 1.0 + 0.02 * jax.random.normal(k1, shape, jnp.float32)
    u = 0.02 * jax.random.normal(k2, (3,) + shape, jnp.float32)
    f = lbm.equilibrium_dev(rho, u).astype(jnp.float32)
    f = f * (1 + 0.01 * jax.random.normal(k3, f.shape, jnp.float32))
    force = (1e-5 * jax.random.normal(k4, (3,) + shape)).astype(jnp.float32)
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags[:, :, 0] = FLAG_VELOCITY
    bc = (0.01 * jax.random.normal(k4, (3,) + shape)).astype(jnp.float32)
    return f, force, jnp.asarray(flags), bc


@pytest.mark.parametrize("tx", [1, 2, 4])
def test_matches_reference(tx):
    f, force, flags, bc = _setup()
    ref = lbm.stream_collide(f, force, 0.9, flags, bc)
    out = stream_collide_pallas(f, force, 0.9, flags, bc, tx=tx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-7)


def test_omega_field():
    f, force, flags, _ = _setup()
    om = jnp.full(f.shape[1:], 0.85, jnp.float32)
    ref = lbm.stream_collide(f, force, om, flags, None)
    out = stream_collide_pallas(f, force, om, flags, None, tx=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-7)


def test_no_bc():
    f, force, flags, _ = _setup()
    ref = lbm.stream_collide(f, force, 1.0, flags, None)
    out = stream_collide_pallas(f, force, 1.0, flags, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-7)


def test_mass_conservation_periodic():
    shape = (8, 8, 128)
    f, force, flags, _ = _setup(shape)
    flags = jnp.zeros(shape, jnp.uint8)
    force = jnp.zeros((3,) + shape, jnp.float32)
    out = f
    for _ in range(5):
        out = stream_collide_pallas(out, force, 1.0, flags, None, tx=4)
    # dev storage: sum(f) is the deviation mass (total mass - N); compare
    # with an absolute tolerance scaled to the true conserved mass N
    np.testing.assert_allclose(
        float(jnp.sum(out)), float(jnp.sum(f)),
        atol=1e-6 * f[0].size
    )


def test_uniform_force_smem_modes():
    """Uniform [3] force (SMEM), force=None, and flags=None fast paths all
    bit-match the field-operand reference path (fewer HBM channels; see
    docs/PERFORMANCE.md roofline)."""
    f, _, flags, _ = _setup()
    shape = f.shape[1:]
    bf = jnp.asarray([1e-5, 2e-5, -1e-5], jnp.float32)
    force_field = jnp.broadcast_to(bf[:, None, None, None], (3,) + shape)
    ref = lbm.stream_collide(f, force_field, 1.1, flags)

    out = stream_collide_pallas(f, bf, 1.1, flags, tx=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-7)

    # all-fluid periodic box: no flags operand at all
    flags0 = jnp.zeros(shape, jnp.uint8)
    ref0 = lbm.stream_collide(f, force_field, 1.1, flags0)
    out0 = stream_collide_pallas(f, bf, 1.1, None, tx=4)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=2e-7)

    # unforced
    refn = lbm.stream_collide(f, jnp.zeros_like(force_field), 1.1, flags0)
    outn = stream_collide_pallas(f, None, 1.1, None, tx=4)
    np.testing.assert_allclose(np.asarray(outn), np.asarray(refn), atol=2e-7)


def test_uniform_force_folded():
    from hemocell_tpu.fluid.pallas_lbm import fold_field, unfold_field

    f, _, _, _ = _setup((16, 8, 8))
    shape = f.shape[1:]
    bf = jnp.asarray([1e-5, 0.0, -2e-5], jnp.float32)
    force_field = jnp.broadcast_to(bf[:, None, None, None], (3,) + shape)
    ref = lbm.stream_collide(
        f, force_field, 1.05, jnp.zeros(shape, jnp.uint8)
    )
    k = 2
    out = unfold_field(
        stream_collide_pallas(fold_field(f, k), bf, 1.05, None, tx=4, fold=k),
        k,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-7)
