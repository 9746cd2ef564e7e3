"""Halo-operand mode of the fused fluid kernel (sharded, non-periodic x).

The sharded paths used to concatenate ppermute'd halo rows into a
[Q, Xl+2, Y, Z] extended block (a full extra copy of f through HBM) and run
the kernel with tx=1.  The halo mode passes the neighbour rows as 1-row
kernel operands instead; the first/last program substitutes them for the
(wrong) periodic-wrap rows.  Reference analog: the envelope exchange around
collideAndStream (core/hemoCellFields.cpp:363-372).

These tests run the Pallas kernel in interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_VELOCITY, FLAG_WALL
from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.pallas_lbm import stream_collide_pallas


def _rand_state(shape, key=0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    rho = 1.0 + 0.02 * jax.random.normal(k1, shape, dtype)
    u = 0.02 * jax.random.normal(k2, (3,) + shape, dtype)
    f = lbm.equilibrium_dev(rho, u)
    force = 1e-5 * jax.random.normal(k3, (3,) + shape, dtype)
    return f, force


def _split_with_halos(arr, n, axis=1):
    """Split a global periodic array into n x-shards + their halo rows."""
    X = arr.shape[axis]
    Xl = X // n
    shards, halos = [], []
    for i in range(n):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(i * Xl, (i + 1) * Xl)
        shards.append(arr[tuple(sl)])
        lo = [slice(None)] * arr.ndim
        lo[axis] = slice((i * Xl - 1) % X, (i * Xl - 1) % X + 1)
        hi = [slice(None)] * arr.ndim
        hi[axis] = slice(((i + 1) * Xl) % X, ((i + 1) * Xl) % X + 1)
        halos.append((arr[tuple(lo)], arr[tuple(hi)]))
    return shards, halos


def _run_sharded(f, force, omega, flags, bc=None, n=2, tx=None):
    """Emulate an n-shard run with the halo-mode kernel; reassemble."""
    f_sh, f_h = _split_with_halos(f, n)
    outs = []
    for i in range(n):
        halos = {"f": f_h[i]}
        kw = {}
        if force is not None and force.ndim > 1:
            fo_sh, fo_h = _split_with_halos(force, n)
            force_i = fo_sh[i]
            halos["force"] = fo_h[i]
        else:
            force_i = force
        flags_i = None
        if flags is not None:
            fl_sh, fl_h = _split_with_halos(flags, n, axis=0)
            flags_i = fl_sh[i]
            halos["flags"] = fl_h[i]
        bc_i = None
        if bc is not None:
            bc_sh, bc_h = _split_with_halos(bc, n)
            bc_i = bc_sh[i]
            halos["bc"] = bc_h[i]
        outs.append(
            stream_collide_pallas(
                f_sh[i], force_i, omega, flags_i, bc_i,
                tx=tx, interpret=True, halos=halos,
            )
        )
    return jnp.concatenate(outs, axis=1)


def test_halo_mode_matches_periodic_field_force():
    shape = (16, 8, 16)
    f, force = _rand_state(shape)
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags = jnp.asarray(flags)
    # oracle: the same kernel run periodically on the global domain —
    # the halo mode only changes where edge programs read their x-halo
    # rows from.  Tolerance is ~f32 ulp: interpret-mode XLA contracts
    # FMAs differently across graph variants (the halo select), so
    # bitwise equality is not expected; wrong streaming would be ~1e-3.
    ref = stream_collide_pallas(f, force, 0.9, flags, interpret=True)
    for n in (2, 4):
        out = _run_sharded(f, force, 0.9, flags, n=n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-8)


def test_halo_mode_matches_uniform_force_no_flags():
    # SMEM force + no flags: the fast path the coupled shard step uses
    shape = (16, 8, 16)
    f, _ = _rand_state(shape, key=1)
    bf = jnp.asarray([1e-5, 0.0, 0.0], jnp.float32)
    ref = stream_collide_pallas(f, bf, 0.8, None, interpret=True)
    out = _run_sharded(f, bf, 0.8, None, n=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-8)


def test_halo_mode_matches_velocity_bc():
    shape = (16, 8, 16)
    f, force = _rand_state(shape, key=2)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_VELOCITY
    flags = jnp.asarray(flags)
    bc = jnp.zeros((3,) + shape, jnp.float32).at[1, :, :, -1].set(0.01)
    ref = stream_collide_pallas(f, force, 0.9, flags, bc,
                                interpret=True)
    out = _run_sharded(f, force, 0.9, flags, bc=bc, n=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-8)


def test_halo_mode_respects_explicit_tx():
    shape = (16, 8, 16)
    f, force = _rand_state(shape, key=3)
    flags = jnp.zeros(shape, jnp.uint8)
    for tx in (1, 2, 4, 8):
        ref = stream_collide_pallas(f, force, 0.95, flags, tx=tx,
                                    interpret=True)
        out = _run_sharded(f, force, 0.95, flags, n=2, tx=tx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-8)


def test_halo_mode_arbitrary_neighbour_rows():
    """Halo rows need not come from a periodic wrap: feed rows of a larger
    global domain and check the interior solution matches a global step."""
    shape = (24, 8, 16)
    f, force = _rand_state(shape, key=4)
    flags = jnp.zeros(shape, jnp.uint8)
    ref = stream_collide_pallas(f, force, 0.9, flags, interpret=True)
    # run only the middle third [8:16] as a "shard" with true neighbours
    halos = {
        "f": (f[:, 7:8], f[:, 16:17]),
        "force": (force[:, 7:8], force[:, 16:17]),
        "flags": (flags[7:8], flags[16:17]),
    }
    out = stream_collide_pallas(
        f[:, 8:16], force[:, 8:16], 0.9, flags[8:16],
        interpret=True, halos=halos,
    )
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref[:, 8:16]), rtol=0, atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shardmap_coupled_step_pallas_fluid():
    """The coupled shard_map step with the Pallas fluid kernel (halo mode)
    matches the single-device runner."""
    from hemocell_tpu.dynamics import build_runner
    from hemocell_tpu.parallel.sharded_step import build_shardmap_runner
    from hemocell_tpu.parallel.sharding import make_mesh, shard_state
    from hemocell_tpu.presets import rbc_suspension

    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        particle_every=2, material_every=4,
    )
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 4
    )
    mesh = make_mesh(8, axes=("x",))
    out = build_shardmap_runner(cfg, mesh, use_pallas=True, interpret=True)(
        shard_state(state, mesh), 4
    )
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7)
    for co, cr in zip(out.cells, ref.cells):
        assert np.allclose(np.asarray(co.pos), np.asarray(cr.pos),
                           rtol=0, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fluid_only_sharded_pallas():
    """make_sharded_stream_collide with use_pallas=True (halo-mode kernel
    under shard_map) matches the jnp reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hemocell_tpu.fluid.sharded_pallas import make_sharded_stream_collide
    from hemocell_tpu.parallel import make_mesh

    shape = (32, 8, 16)
    f, force = _rand_state(shape, key=5)
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags = jnp.asarray(flags)
    mesh = make_mesh(8, axes=("x",))
    step = make_sharded_stream_collide(mesh, flags, use_pallas=True)
    fs = jax.device_put(f, NamedSharding(mesh, P(None, "x", None, None)))
    fos = jax.device_put(force, NamedSharding(mesh, P(None, "x", None, None)))
    out = fs
    ref = f
    for _ in range(3):
        out = step(out, fos, 0.9)
        ref = lbm.stream_collide(ref, force, 0.9, flags)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
