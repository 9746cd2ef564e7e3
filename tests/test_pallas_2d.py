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


def _split_rows(arr, n, axis=1):
    X = arr.shape[axis]
    Xl = X // n
    shards, halos = [], []
    for i in range(n):
        def sl(a, b):
            s = [slice(None)] * arr.ndim
            s[axis] = slice(a, b)
            return arr[tuple(s)]
        shards.append(sl(i * Xl, (i + 1) * Xl))
        halos.append((sl((i * Xl - 1) % X, (i * Xl - 1) % X + 1),
                      sl(((i + 1) * Xl) % X, ((i + 1) * Xl) % X + 1)))
    return shards, halos


def test_2d_halo_mode_matches_periodic():
    """x-halo rows as operands (sharded weak-scaling config: 2-D tiles
    within a shard, ppermute rows between shards)."""
    shape = (16, 16, 16)
    f, force = _rand(shape, key=4)
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags = jnp.asarray(flags)
    ref = stream_collide_pallas_2d(f, force, 0.9, flags, tx=4, ty=8,
                                   interpret=True)
    f_sh, f_h = _split_rows(f, 2)
    fo_sh, fo_h = _split_rows(force, 2)
    fl_sh, fl_h = _split_rows(flags, 2, axis=0)
    outs = []
    for i in range(2):
        outs.append(stream_collide_pallas_2d(
            f_sh[i], fo_sh[i], 0.9, fl_sh[i], tx=4, ty=8, interpret=True,
            halos={"f": f_h[i], "force": fo_h[i], "flags": fl_h[i]},
        ))
    out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=ATOL)


def test_2d_halo_mode_uniform_force():
    shape = (16, 16, 16)
    f, _ = _rand(shape, key=5)
    bf = jnp.asarray([1e-5, 0.0, 0.0], jnp.float32)
    ref = stream_collide_pallas_2d(f, bf, 0.85, None, tx=8, ty=8,
                                   interpret=True)
    f_sh, f_h = _split_rows(f, 4)
    outs = [
        stream_collide_pallas_2d(
            f_sh[i], bf, 0.85, None, tx=4, ty=8, interpret=True,
            halos={"f": f_h[i]},
        )
        for i in range(4)
    ]
    out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=ATOL)


def test_1d_dispatch_forwards_halos():
    """stream_collide_pallas with halos routes to the 2-D kernel when the
    1-D pick degrades to a single row (giant cross-section shard)."""
    shape = (4, 256, 384)
    assert _pick_tx(*shape, c_in=19) <= 1
    f, _ = _rand(shape, key=6)
    bf = jnp.asarray([1e-5, 0.0, 0.0], jnp.float32)
    # periodic global reference on the concatenated domain
    big = jnp.concatenate([f, f], axis=1)  # two identical shards
    ref = lbm.stream_collide(
        big, jnp.broadcast_to(bf[:, None, None, None],
                              (3, 8, 256, 384)),
        0.9, jnp.zeros((8, 256, 384), jnp.uint8),
    )
    out = stream_collide_pallas(
        f, bf, 0.9, None, interpret=True,
        halos={"f": (f[:, -1:], f[:, :1])},
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, :4]),
                               rtol=0, atol=ATOL)
