"""Owner-computes particle sharding (parallel/owner_step.py) vs the
single-device step.

The owner runner keeps per-shard fixed-capacity cell tables (the TPU
analog of the reference's per-block particle fields,
core/hemoCellFields.cpp:70-111) and exchanges envelope deposits /
migrating cells with ppermutes.  Like the replicated shard_map step, the
oracle is shard-count invariance (reference CI: mpirun -n 2 vs -n 4
logfile diffs) — equality to f32 reduction order, since the per-shard
window sums change the addition grouping."""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.parallel.owner_step import (
    build_owner_runner,
    owner_supported,
    suggest_envelope,
)
from hemocell_tpu.parallel.sharding import make_mesh, shard_state
from hemocell_tpu.presets import rbc_suspension

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _build(shape=(64, 24, 24), n_cells=3, u0=0.0, walls=False,
           resort_every=1, **kw):
    cfg, state, _ = rbc_suspension(
        shape=shape, n_cells=n_cells, body_force=(1e-6, 0.0, 0.0),
        particle_every=2, material_every=4, repulsion=False,
        resort_every=resort_every, **kw,
    )
    if walls:
        flags = np.zeros(shape, np.uint8)
        flags[:, 0, :] = FLAG_WALL
        flags[:, -1, :] = FLAG_WALL
        cfg = dataclasses.replace(cfg, flags=jnp.asarray(flags))
    if u0:
        from hemocell_tpu.dynamics import initial_sim_state

        state = initial_sim_state(cfg, state.cells, u0=(u0, 0.0, 0.0))
    return cfg, state


def _compare(cfg, state, n=6, n_shards=4):
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, n
    )
    env = suggest_envelope(state.cells, resort_every=cfg.resort_every)
    mesh = make_mesh(n_shards)
    run = build_owner_runner(cfg, mesh, envelope=env)
    out = run(shard_state(state, mesh), n)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7), "fluid mismatch"
    for co, cr in zip(out.cells, ref.cells):
        assert np.allclose(np.asarray(co.pos), np.asarray(cr.pos),
                           rtol=0, atol=1e-5), "pos mismatch"
        assert np.allclose(np.asarray(co.vel), np.asarray(cr.vel),
                           rtol=0, atol=1e-7), "vel mismatch"
        assert np.array_equal(np.asarray(co.alive), np.asarray(cr.alive))
        if co.restime is not None:
            assert np.array_equal(np.asarray(co.restime),
                                  np.asarray(cr.restime))
    assert int(out.ibm_overflow) == 0
    return out


def test_periodic_suspension_matches():
    cfg, state = _build()
    assert owner_supported(cfg, 3)
    _compare(cfg, state)


def test_walled_channel_matches():
    cfg, state = _build(walls=True)
    _compare(cfg, state)


def test_migration_across_shards():
    # a uniform initial flow pushes cells across slab boundaries;
    # resort_every=1 exercises the migration buffers every step
    cfg, state = _build(u0=0.04, resort_every=1)
    out = _compare(cfg, state, n=8)
    assert int(out.ibm_overflow) == 0


def test_shard_count_invariance():
    cfg, state = _build()
    env = suggest_envelope(state.cells)
    o2 = build_owner_runner(cfg, make_mesh(2), envelope=env)(
        shard_state(state, make_mesh(2)), 4
    )
    o4 = build_owner_runner(cfg, make_mesh(4), envelope=env)(
        shard_state(state, make_mesh(4)), 4
    )
    assert np.allclose(np.asarray(o2.f), np.asarray(o4.f),
                       rtol=1e-6, atol=1e-7)
    for c2, c4 in zip(o2.cells, o4.cells):
        assert np.allclose(np.asarray(c2.pos), np.asarray(c4.pos),
                           rtol=0, atol=1e-5)


def test_unsupported_gating():
    cfg, _ = _build()
    assert not owner_supported(
        dataclasses.replace(cfg, repulsion_constant=1.0), 3
    )
    assert not owner_supported(
        dataclasses.replace(cfg, lees_edwards_velocity=0.1), 3
    )
    assert not owner_supported(cfg, 0)
