"""2-D (x,y)-tiled fused fluid kernel (fluid/pallas_lbm_2d.py).

Covers all operand modes against the jnp reference in interpret mode, the
VMEM-model tile picker, and the auto-dispatch from the 1-D kernel on
giant cross-sections (the reference weak-scaling shape class,
cases/performance_testing/configs/config_1.xml is 256^3 per rank).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.config.defaults import (
    FLAG_PRESSURE,
    FLAG_VELOCITY,
    FLAG_WALL,
)
from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.pallas_lbm import _pick_tx, stream_collide_pallas
from hemocell_tpu.fluid.pallas_lbm_2d import (
    pick_txy,
    stream_collide_pallas_2d,
)

ATOL = 1e-8  # f32 rounding between jnp and kernel graphs


def _rand(shape, key=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    rho = 1.0 + 0.02 * jax.random.normal(k1, shape, jnp.float32)
    u = 0.02 * jax.random.normal(k2, (3,) + shape, jnp.float32)
    f = lbm.equilibrium_dev(rho, u)
    force = 1e-5 * jax.random.normal(k3, (3,) + shape, jnp.float32)
    return f, force


def test_2d_matches_jnp_all_tilings():
    shape = (16, 16, 16)
    f, force = _rand(shape)
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags = jnp.asarray(flags)
    ref = lbm.stream_collide(f, force, 0.9, flags)
    for tx, ty in [(1, 1), (4, 4), (8, 8), (16, 8), (2, 16), (16, 16)]:
        out = stream_collide_pallas_2d(
            f, force, 0.9, flags, tx=tx, ty=ty, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=ATOL)


def test_2d_uniform_force_and_unforced():
    shape = (16, 16, 16)
    f, _ = _rand(shape, key=1)
    bf = jnp.asarray([1e-5, 0.0, 0.0], jnp.float32)
    ref = lbm.stream_collide(
        f, jnp.broadcast_to(bf[:, None, None, None], (3,) + shape),
        0.8, jnp.zeros(shape, jnp.uint8),
    )
    out = stream_collide_pallas_2d(f, bf, 0.8, None, tx=4, ty=8,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=ATOL)
    ref0 = lbm.stream_collide(
        f, jnp.zeros((3,) + shape, jnp.float32), 0.8,
        jnp.zeros(shape, jnp.uint8),
    )
    out0 = stream_collide_pallas_2d(f, None, 0.8, None, tx=8, ty=4,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               rtol=0, atol=ATOL)


def test_2d_velocity_and_pressure_bc():
    shape = (16, 16, 16)
    f, force = _rand(shape, key=2)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_VELOCITY
    flags[0] = FLAG_PRESSURE
    flags = jnp.asarray(flags)
    bc = jnp.zeros((3,) + shape, jnp.float32).at[1, :, :, -1].set(0.01)
    ref = lbm.stream_collide(f, force, 0.9, flags, bc, bc_density=1.0)
    out = stream_collide_pallas_2d(f, force, 0.9, flags, bc, tx=4, ty=4,
                                   bc_density=1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=ATOL)


def test_pick_txy_model():
    # 256^3 no-flags: a fat tile fits and beats 1-D single-row slabs
    tx, ty = pick_txy(256, 256, 256, 19)
    assert tx >= 8 and ty >= 8
    amp = (tx + 2) * (ty + 2) / (tx * ty)
    assert amp < 2.0
    # 1-D model degrades to relaxed single-row on the same shape
    assert _pick_tx(256, 256, 256, 19) <= 1
    # tiny domains always fit
    assert pick_txy(8, 8, 8, 27)[0] > 0


def test_auto_dispatch_giant_cross_section():
    """stream_collide_pallas silently delegates to the 2-D kernel when
    single-row slabs would be the 1-D pick."""
    shape = (2, 256, 384)  # row = 384 KiB -> _pick_tx == 1 (relaxed)
    assert _pick_tx(*shape, c_in=19) <= 1
    f, _ = _rand(shape, key=3)
    bf = jnp.asarray([1e-5, 0.0, 0.0], jnp.float32)
    ref = lbm.stream_collide(
        f, jnp.broadcast_to(bf[:, None, None, None], (3,) + shape),
        0.9, jnp.zeros(shape, jnp.uint8),
    )
    out = stream_collide_pallas(f, bf, 0.9, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=ATOL)
