"""Device-count invariance for the features that ride the GSPMD runner.

The shard_map fast path rejects Lees-Edwards, solidify and interior
viscosity (parallel/sharded_step.shardmap_supported) — those run through
build_sharded_runner; CEPAC and pressure outlets gained shard_map fast
paths in r04 but stay covered here on the GSPMD runner too (GSPMD
auto-partitioning with the exact scatter IBM pinned).  The reference CI's
distributed-correctness oracle is rank-count invariance
(scripts/ci/pipeflow_sanity.sh:26-33: bitwise-identical physics for
mpirun -n 2 vs -n 4) — these tests are the same oracle for 1 vs 8 virtual
devices on each GSPMD-only feature."""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hemocell_tpu.config.defaults import FLAG_PRESSURE, FLAG_WALL
from hemocell_tpu.dynamics import build_runner, initial_sim_state
from hemocell_tpu.parallel import (
    build_sharded_runner,
    make_mesh,
    shard_state,
    shardmap_supported,
)
from hemocell_tpu.presets import rbc_suspension

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _invariance(cfg, state, n=5, axes=("x",), atol=1e-12):
    """single-device (same numerics: scatter IBM, jnp fluid) vs GSPMD."""
    ref_cfg = dataclasses.replace(cfg, spread_mode="scatter",
                                  use_pallas=False)
    ref = build_runner(ref_cfg)(state, n)
    mesh = make_mesh(8, axes=axes)
    out = build_sharded_runner(cfg, mesh)(shard_state(state, mesh), n)
    np.testing.assert_allclose(np.asarray(out.f), np.asarray(ref.f),
                               rtol=0, atol=atol)
    for co, cr in zip(out.cells, ref.cells):
        np.testing.assert_allclose(np.asarray(co.pos), np.asarray(cr.pos),
                                   rtol=0, atol=atol)
        np.testing.assert_array_equal(np.asarray(co.alive),
                                      np.asarray(cr.alive))
    if ref.cepac is not None:
        np.testing.assert_allclose(np.asarray(out.cepac),
                                   np.asarray(ref.cepac), rtol=0, atol=atol)
    if ref.flags_state is not None:
        np.testing.assert_array_equal(np.asarray(out.flags_state),
                                      np.asarray(ref.flags_state))
    if ref.omega_field is not None:
        np.testing.assert_allclose(np.asarray(out.omega_field),
                                   np.asarray(ref.omega_field),
                                   rtol=0, atol=atol)
    return out, ref


def _base(**kw):
    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        repulsion=False, dtype=jnp.float64, **kw,
    )
    return cfg, state


def test_lees_edwards_invariance():
    cfg, state = _base()
    cfg = dataclasses.replace(cfg, lees_edwards_velocity=1e-3,
                              body_force=None)
    # r04: LE gained a 1-D shard_map fast path (test_shardmap_step.py);
    # this test keeps pinning the GSPMD runner below.  Walled LE boxes
    # and 2-D meshes still reject:
    assert shardmap_supported(cfg)
    assert not shardmap_supported(cfg, make_mesh(8, axes=("x", "y")))
    state = initial_sim_state(cfg, list(state.cells))
    _invariance(cfg, state)


def test_cepac_invariance():
    cfg, state = _base()
    cfg = dataclasses.replace(cfg, cepac_tau=0.6)
    # r04: CEPAC gained a shard_map fast path; this test keeps pinning the
    # GSPMD runner (build_sharded_runner below), the shard_map variant
    # lives in test_shardmap_step.py
    assert shardmap_supported(cfg)
    state = initial_sim_state(cfg, list(state.cells), cepac0=0.5)
    _invariance(cfg, state)


def test_interior_viscosity_invariance():
    cfg, state = _base()
    types = [dataclasses.replace(cfg.types[0], omega_interior=0.4,
                                 interior_box=12)]
    cfg = dataclasses.replace(cfg, types=types, interior_every=2,
                              interior_entire_every=4)
    # r04: interior viscosity gained a 1-D shard_map fast path; r05
    # extended it to 2-D meshes — the GSPMD runner below is built
    # explicitly (_invariance calls build_sharded_runner), so this stays
    # a GSPMD-tier test regardless of the fast path's coverage
    assert shardmap_supported(cfg)
    assert shardmap_supported(cfg, make_mesh(8, axes=("x", "y")))
    state = initial_sim_state(cfg, list(state.cells))
    _invariance(cfg, state)


def test_solidify_invariance():
    from hemocell_tpu.cells.state import make_cell_state
    from hemocell_tpu.dynamics import StepConfig, TypeConfig
    from hemocell_tpu.mechanics import (
        MODEL_REGISTRY,
        MaterialConstants,
        material_dict,
        topology_device_arrays,
    )
    from hemocell_tpu.mesh import build_topology, ellipsoid_from_sphere

    mesh_t = ellipsoid_from_sphere(2.5, 0.435, 66)
    topo = build_topology(mesh_t)
    shape = (32, 16, 16)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    tc = TypeConfig(
        name="PLT", model_fn=MODEL_REGISTRY["PltSimpleModel"],
        topo=topology_device_arrays(topo, dtype=jnp.float64),
        material=material_dict(MaterialConstants(
            k_volume=0.5, k_area=0.5, k_link=0.5, k_bend=0.2)),
        solidify=True, distance_threshold=2.0, shear_threshold=-1.0,
        interior_box=12,
    )
    cfg = StepConfig(
        shape=shape, flags=jnp.asarray(flags), omega=1.0, types=[tc],
        solidify_every=2, dtype=jnp.float64, use_pallas=False,
    )
    # r05: solidify rides 1-D AND 2-D shard_map meshes; this test keeps
    # exercising the explicitly-built GSPMD runner as the fallback tier
    assert shardmap_supported(cfg, make_mesh(8, axes=("x", "y")))
    cells = make_cell_state(
        (mesh_t.vertices + np.array([12.0, 8.0, 3.6]))[None],
        dtype=jnp.float64,
    )
    state = initial_sim_state(cfg, [cells])
    out, ref = _invariance(cfg, state, n=4)
    # the feature actually fired: some nodes solidified identically
    assert (np.asarray(ref.flags_state) != flags).any()


def test_pressure_outlet_invariance():
    cfg, state = _base()
    flags = np.zeros((32, 16, 16), np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    flags[-1, 1:-1, 1:-1] = FLAG_PRESSURE
    cfg = dataclasses.replace(cfg, flags=jnp.asarray(flags),
                              bc_density=1.0)
    # r04: pressure outlets gained a shard_map fast path (node-local
    # density Dirichlet); GSPMD stays pinned here
    assert shardmap_supported(cfg)
    state = initial_sim_state(cfg, list(state.cells))
    _invariance(cfg, state)


def test_cepac_invariance_2d_mesh():
    """GSPMD tier on a 2-D (x,y) mesh — the decomposition class the
    reference covers with arbitrary block grids (core/hemoCell.cpp:438-571)."""
    cfg, state = _base()
    cfg = dataclasses.replace(cfg, cepac_tau=0.6)
    state = initial_sim_state(cfg, list(state.cells), cepac0=0.5)
    _invariance(cfg, state, axes=("x", "y"))
