"""Multi-device sharding tests on the virtual 8-device CPU mesh:
the sharded coupled step compiles, runs, and bit-matches the single-device
result (the TPU analog of the reference's rank-count-invariance CI oracle,
scripts/ci/pipeflow_sanity.sh:26-33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.parallel import (
    build_sharded_runner,
    make_mesh,
    shard_state,
)
from hemocell_tpu.presets import rbc_suspension

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup():
    return rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0.0, 0.0),
        particle_every=1, material_every=1,
    )


def test_sharded_step_runs():
    cfg, state, _ = _setup()
    mesh = make_mesh(8, axes=("x",))
    sstate = shard_state(state, mesh)
    run = build_sharded_runner(cfg, mesh)
    out = run(sstate, 3)
    jax.block_until_ready(out)
    assert int(out.it) == 3
    assert bool(jnp.isfinite(out.f).all())


def test_shard_count_invariance():
    """Physics identical on 1 vs 8 shards (determinism oracle)."""
    cfg, state, _ = _setup()
    run1 = build_runner(cfg)
    ref = run1(state, 5)

    mesh = make_mesh(8, axes=("x",))
    sstate = shard_state(state, mesh)
    run8 = build_sharded_runner(cfg, mesh)
    out = run8(sstate, 5)

    np.testing.assert_allclose(
        np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.cells[0].pos), np.asarray(ref.cells[0].pos),
        rtol=0, atol=1e-5,
    )


def test_mesh_2d():
    cfg, state, _ = _setup()
    mesh = make_mesh(8, axes=("x", "y"))
    assert mesh.shape["x"] == 2 and mesh.shape["y"] == 4
    sstate = shard_state(state, mesh)
    run = build_sharded_runner(cfg, mesh)
    out = run(sstate, 1)
    jax.block_until_ready(out)
    assert int(out.it) == 1


def test_mesh_2d_invariance():
    """Physics identical on 1 device vs a 2x4 ('x','y') mesh, with walls
    crossing the y-sharded axis (halo correctness on the second mesh
    axis)."""
    import dataclasses

    cfg, state, _ = _setup()
    flags = np.zeros(tuple(int(s) for s in cfg.shape), np.uint8)
    flags[:, :, 0] = 1  # FLAG_WALL planes normal to z
    flags[:, :, -1] = 1
    cfg = dataclasses.replace(cfg, flags=jnp.asarray(flags))

    ref = build_runner(cfg)(state, 5)
    mesh = make_mesh(8, axes=("x", "y"))
    out = build_sharded_runner(cfg, mesh)(shard_state(state, mesh), 5)
    np.testing.assert_allclose(
        np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.cells[0].pos), np.asarray(ref.cells[0].pos),
        rtol=0, atol=1e-5,
    )
    assert np.array_equal(
        np.asarray(out.cells[0].alive), np.asarray(ref.cells[0].alive)
    )
