"""Explicit shard_map coupled step vs the single-device step.

The shard_map step (parallel/sharded_step.py) must reproduce the
single-device dynamics exactly: spreading's halo-row ppermute replaces the
reference's particle-envelope exchange (core/hemoCellFields.cpp:363-499),
so shard-count invariance is the same oracle the reference CI checks with
mpirun -n 2 vs -n 4 logfile diffs."""

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
from hemocell_tpu.parallel.sharded_step import (
    build_shardmap_runner,
    shardmap_supported,
)
from hemocell_tpu.parallel.sharding import make_mesh, shard_state
from hemocell_tpu.presets import rbc_suspension

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _compare(cfg, state, n=5, axes=("x",)):
    # the shard-local vertex windows change f32 reduction order, so
    # equality is to rounding (amplified by cancellation in the tiny
    # transverse velocity components), not bitwise
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, n
    )
    mesh = make_mesh(8, axes=axes)
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), n)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7)
    for co, cr in zip(out.cells, ref.cells):
        assert np.allclose(np.asarray(co.pos), np.asarray(cr.pos),
                           rtol=0, atol=1e-6)
        assert np.allclose(np.asarray(co.vel), np.asarray(cr.vel),
                           rtol=0, atol=1e-8)
        assert np.array_equal(np.asarray(co.alive), np.asarray(cr.alive))


def test_periodic_suspension_matches():
    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        particle_every=2, material_every=4, repulsion=True,
    )
    assert shardmap_supported(cfg)
    _compare(cfg, state)


def test_walled_channel_matches():
    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        repulsion=False,
    )
    flags = np.zeros((32, 16, 16), np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    cfg = dataclasses.replace(cfg, flags=jnp.asarray(flags))
    _compare(cfg, state)


def test_periodic_suspension_matches_2d_mesh():
    """2-D ("x","y") mesh: lattice decomposed over X and Y, IBM ownership
    by (x-slab, y-range), corner halos ride the two-hop exchange — must
    match single-device exactly (ref: arbitrary block decompositions,
    core/hemoCell.cpp:438-571)."""
    cfg, state, _ = rbc_suspension(
        shape=(32, 32, 16), n_cells=3, body_force=(1e-6, 0, 0),
        particle_every=2, material_every=4, repulsion=True, seed=3,
    )
    assert shardmap_supported(cfg)
    _compare(cfg, state, axes=("x", "y"))  # 2x4 mesh


def test_walled_channel_matches_2d_mesh():
    """Walls + 2-D mesh: boundary renormalisation and boundary-contact
    deletion across both sharded axes."""
    cfg, state, _ = rbc_suspension(
        shape=(32, 32, 16), n_cells=3, body_force=(1e-6, 0, 0),
        repulsion=False, seed=5,
    )
    flags = np.zeros((32, 32, 16), np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    cfg = dataclasses.replace(cfg, flags=jnp.asarray(flags))
    _compare(cfg, state, axes=("x", "y"))


def test_unsupported_features_detected():
    cfg, _, _ = rbc_suspension(shape=(16, 16, 16), n_cells=1)
    # r04: LE gained a 1-D shard_map fast path — but walled boxes and 2-D
    # meshes still reject
    assert shardmap_supported(
        dataclasses.replace(cfg, lees_edwards_velocity=0.01)
    )
    assert not shardmap_supported(
        dataclasses.replace(cfg, lees_edwards_velocity=0.01),
        make_mesh(8, axes=("x", "y")),
    )
    flags_w = np.zeros((16, 16, 16), np.uint8)
    flags_w[:, :, 0] = FLAG_WALL
    assert not shardmap_supported(
        dataclasses.replace(cfg, lees_edwards_velocity=0.01, flags=flags_w)
    )
    # r04: solidify gained a 1-D shard_map fast path; r05 widened it to
    # 2-D meshes and the CEPAC / interior-viscosity combos — only the LE
    # combos stay on GSPMD
    assert shardmap_supported(dataclasses.replace(cfg, solidify_every=2))
    # r05: solidify and interior viscosity ride 2-D meshes too
    assert shardmap_supported(
        dataclasses.replace(cfg, solidify_every=2),
        make_mesh(8, axes=("x", "y")),
    )
    assert shardmap_supported(
        dataclasses.replace(cfg, interior_every=2),
        make_mesh(8, axes=("x", "y")),
    )
    assert shardmap_supported(
        dataclasses.replace(cfg, solidify_every=2, cepac_tau=0.6)
    )
    assert shardmap_supported(
        dataclasses.replace(cfg, solidify_every=2, interior_every=2)
    )
    assert not shardmap_supported(
        dataclasses.replace(
            cfg, solidify_every=2, lees_edwards_velocity=0.01
        )
    )
    # r04: CEPAC gained a shard_map fast path
    assert shardmap_supported(dataclasses.replace(cfg, cepac_tau=0.6))


def test_shardmap_overflow_carried():
    """Over-pack one shard's slab windows: the shard_map step must carry
    the IBM overflow counter (psum across shards) instead of discarding it
    — the silent-corruption hazard the facade guard watches
    (hemocell.py _check_overflow)."""
    from hemocell_tpu.cells.state import make_cell_state, place_cells
    from hemocell_tpu.dynamics import (
        StepConfig, TypeConfig, initial_sim_state,
    )
    from hemocell_tpu.mechanics import MODEL_REGISTRY, topology_device_arrays
    from hemocell_tpu.mesh import build_topology, rbc_from_sphere
    from hemocell_tpu.presets import default_params, rbc_material

    params = default_params()
    mesh_c = rbc_from_sphere(1.2, 120)
    topo = build_topology(mesh_c)
    n_cells = 24
    centers = [(16.0, 8.0, 8.0)] * n_cells  # all on shard 4 of 8
    cells = place_cells(
        mesh_c.vertices, np.asarray(centers, np.float64),
        np.zeros((n_cells, 3)),
    )
    tc = TypeConfig(
        name="RBC", model_fn=MODEL_REGISTRY["NoOp"],
        topo=topology_device_arrays(topo),
        material=rbc_material(params, mesh_c.num_triangles),
    )
    cfg = StepConfig(
        shape=(32, 16, 16), flags=jnp.zeros((32, 16, 16), jnp.uint8),
        omega=1.0, types=[tc], particle_every=1, f_limit=params.f_limit,
        dtype=jnp.float32, spread_mode="pallas",
    )
    state = initial_sim_state(cfg, [make_cell_state(cells)])
    mesh = make_mesh(8, axes=("x",))
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 2)
    assert int(np.asarray(out.ibm_overflow)) > 0


def test_shardmap_no_spurious_overflow():
    """Distributed runs park other shards' vertices in the halo-row slab;
    those zero-payload drops must NOT count as overflow (a spurious trip
    would permanently demote every distributed run to scatter)."""
    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        repulsion=False,
    )
    mesh = make_mesh(8, axes=("x",))
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 3)
    assert int(np.asarray(out.ibm_overflow)) == 0


def test_distribute_overflow_fallback(tmp_path):
    """Under distribute(), a non-zero counter must flip the facade to the
    scatter path AND the rebuilt distributed runner must avoid the Pallas
    slab kernels (shardmap_supported rejects spread_mode='scatter')."""
    from hemocell_tpu import HemoCell
    from hemocell_tpu.dynamics import StepConfig

    assert not shardmap_supported(
        dataclasses.replace(
            rbc_suspension(shape=(16, 16, 16), n_cells=1)[0],
            spread_mode="scatter",
        )
    )

    cfgdir = tmp_path / "case"
    os.makedirs(cfgdir, exist_ok=True)
    (cfgdir / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx>
        <dt>1e-7</dt><kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    hc = HemoCell(str(cfgdir / "config.xml"))
    hc.initialize_lattice(shape=(32, 16, 16))
    hc.set_body_force((1e-6, 0.0, 0.0))
    hc.distribute(8)
    hc.iterate(1)
    hc._state = hc._state._replace(ibm_overflow=jnp.asarray(5, jnp.int32))
    hc.iterate(1)  # ships the non-zero counter asynchronously
    with pytest.warns(UserWarning, match="overflow"):
        hc.iterate(1)
    assert hc.spread_mode == "scatter"
    hc.iterate(1)  # rebuilt distributed runner (GSPMD/scatter) still runs
    hc.block()


def test_facade_distribute(tmp_path):
    """HemoCell.distribute runs the same physics as single-device."""
    from hemocell_tpu import HemoCell

    def build():
        cfgdir = tmp_path / "case"
        os.makedirs(cfgdir, exist_ok=True)
        (cfgdir / "config.xml").write_text(
            """<?xml version="1.0" ?><hemocell>
            <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx>
            <dt>1e-7</dt><kBT>4.100531391e-21</kBT></domain>
            <sim><tmax>10</tmax></sim></hemocell>"""
        )
        hc = HemoCell(str(cfgdir / "config.xml"))
        flags = np.zeros((32, 16, 16), np.uint8)
        flags[:, :, 0] = FLAG_WALL
        flags[:, :, -1] = FLAG_WALL
        hc.initialize_lattice(flags=flags)
        hc.set_body_force((1e-6, 0.0, 0.0))
        return hc

    ref = build()
    ref.iterate(4)
    ref.block()

    hc = build()
    hc.distribute(8)
    hc.iterate(4)
    hc.block()
    assert np.allclose(
        np.asarray(hc.state.f), np.asarray(ref.state.f), rtol=0, atol=1e-7
    )


def test_pressure_outlet_shardmap():
    """r04: pressure outlets (node-local density Dirichlet) ride the
    shard_map fast path (reference: Zou-He outlets under any block
    decomposition, core/hemoCell.cpp:438-571)."""
    from hemocell_tpu.config.defaults import FLAG_PRESSURE
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        repulsion=False,
    )
    flags = np.zeros((32, 16, 16), np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    flags[-1, 1:-1, 1:-1] = FLAG_PRESSURE
    cfg = dataclasses.replace(cfg, flags=jnp.asarray(flags), bc_density=1.0)
    assert shardmap_supported(cfg)
    state = initial_sim_state(cfg, list(state.cells))
    _compare(cfg, state)


def test_cepac_shardmap():
    """r04: the CEPAC advection-diffusion lattice rides the shard_map fast
    path — same two-hop ghost extension as the fluid (reference: second
    D3Q19 lattice under the same decomposition,
    core/hemoCellFields.cpp:113-139)."""
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        repulsion=False,
    )
    mask = np.zeros((32, 16, 16), np.uint8)
    mask[0] = 1
    cfg = dataclasses.replace(
        cfg, cepac_tau=0.6,
        cepac_dirichlet_mask=jnp.asarray(mask),
        cepac_dirichlet_value=jnp.full((32, 16, 16), 2.0, jnp.float32),
    )
    assert shardmap_supported(cfg)
    state = initial_sim_state(cfg, list(state.cells), cepac0=0.5)
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 5
    )
    mesh = make_mesh(8)
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 5)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7)
    assert np.allclose(np.asarray(out.cepac), np.asarray(ref.cepac),
                       rtol=1e-6, atol=1e-7)


def test_cepac_shardmap_2d():
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 16), n_cells=1, body_force=(1e-6, 0, 0),
        repulsion=False,
    )
    cfg = dataclasses.replace(cfg, cepac_tau=0.6)
    state = initial_sim_state(cfg, list(state.cells), cepac0=0.5)
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 4
    )
    mesh = make_mesh(8, axes=("x", "y"))
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 4)
    assert np.allclose(np.asarray(out.cepac), np.asarray(ref.cepac),
                       rtol=1e-6, atol=1e-7)


def test_interior_viscosity_shardmap():
    """r04: interior viscosity rides the 1-D shard_map fast path — the
    omega-field updates run slab-locally (out-of-slab scatters drop) and
    the fluid kernel takes omega halo rows (reference: dynamics swap under
    any decomposition, helper/interiorViscosity.cpp:181-203)."""
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        repulsion=False,
    )
    types = [dataclasses.replace(cfg.types[0], omega_interior=0.4,
                                 interior_box=12)]
    cfg = dataclasses.replace(cfg, types=types, interior_every=2,
                              interior_entire_every=4)
    assert shardmap_supported(cfg)
    state = initial_sim_state(cfg, list(state.cells))
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 5
    )
    mesh = make_mesh(8)
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 5)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.omega_field),
                               np.asarray(ref.omega_field), rtol=0, atol=0)
    # the feature fired: interior omega present somewhere
    assert (np.asarray(ref.omega_field) == np.float32(0.4)).any()


def test_lees_edwards_shardmap():
    """r04: Lees-Edwards rides the 1-D shard_map fast path — the two
    corrected wrap planes are built from an x-all_gather of the local
    boundary-plane pair and fed to the kernel as plane operands + halo
    rows (the distributed analog of the reference's single-core LE data
    processors, helper/leesEdwardsBC.h:57-383)."""
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, body_force=None,
        particle_every=2, material_every=4, repulsion=False,
    )
    cfg = dataclasses.replace(cfg, lees_edwards_velocity=1e-3)
    assert shardmap_supported(cfg)
    # LE stays 1-D: the corrected wrap planes are all_gather'd along x
    # only (a 2-D mesh would need a second gather axis)
    assert not shardmap_supported(cfg, make_mesh(8, axes=("x", "y")))
    state = initial_sim_state(cfg, list(state.cells))
    _compare(cfg, state, n=6)


def test_lees_edwards_shardmap_displacement_carried():
    """The accumulated LE displacement advances identically under the
    sharded step (it drives the wrap-plane x-sample and the particle
    image mapping)."""
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=1, body_force=None, repulsion=False,
    )
    cfg = dataclasses.replace(cfg, lees_edwards_velocity=2e-3)
    state = initial_sim_state(cfg, list(state.cells))
    mesh = make_mesh(8)
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 7)
    np.testing.assert_allclose(float(out.le_displacement), 7 * 2e-3,
                               rtol=1e-6)


def test_solidify_shardmap():
    """r04: solidify rides the 1-D shard_map fast path — mutable flags +
    binding mask are carried as x-sharded state, phase A hardens interiors
    slab-locally, phase B's 27-neighbour binding/Tresca test reads one
    ppermute ghost row per side and psums per-cell hits (reference:
    pltSimpleModel.cpp:211-248, hemoCellParticleField.cpp:1018-1070 under
    any decomposition)."""
    from hemocell_tpu.cells.state import make_cell_state
    from hemocell_tpu.dynamics import StepConfig, TypeConfig, \
        initial_sim_state
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
        topo=topology_device_arrays(topo),
        material=material_dict(MaterialConstants(
            k_volume=0.5, k_area=0.5, k_link=0.5, k_bend=0.2)),
        solidify=True, distance_threshold=2.0, shear_threshold=-1.0,
        interior_box=12,
    )
    cfg = StepConfig(
        shape=shape, flags=jnp.asarray(flags), omega=1.0, types=[tc],
        solidify_every=2,
    )
    assert shardmap_supported(cfg)
    assert shardmap_supported(cfg, make_mesh(8, axes=("x", "y")))  # r05
    cells = make_cell_state(
        (mesh_t.vertices + np.array([12.0, 8.0, 3.6]))[None],
    )
    state = initial_sim_state(cfg, [cells])

    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 4
    )
    mesh = make_mesh(8)
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 4)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.flags_state),
                                  np.asarray(ref.flags_state))
    np.testing.assert_array_equal(np.asarray(out.binding_mask),
                                  np.asarray(ref.binding_mask))
    for co, cr in zip(out.cells, ref.cells):
        np.testing.assert_array_equal(np.asarray(co.alive),
                                      np.asarray(cr.alive))
        np.testing.assert_array_equal(np.asarray(co.solidify),
                                      np.asarray(cr.solidify))
    # the feature fired identically: some nodes solidified
    assert (np.asarray(ref.flags_state) != flags).any()


def test_solidify_cepac_interior_combo_shardmap():
    """r05: the solidify + CEPAC + interior-viscosity COMBINATION rides
    the 1-D shard_map fast path (previously a GSPMD cliff — VERDICT r04
    weak #2): each phase is independent in the local step, so the combo
    must match the single-device step like each feature alone."""
    from hemocell_tpu.cells.state import make_cell_state
    from hemocell_tpu.dynamics import StepConfig, TypeConfig, \
        initial_sim_state
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
        topo=topology_device_arrays(topo),
        material=material_dict(MaterialConstants(
            k_volume=0.5, k_area=0.5, k_link=0.5, k_bend=0.2)),
        solidify=True, distance_threshold=2.0, shear_threshold=-1.0,
        interior_box=12, omega_interior=0.6,
    )
    cfg = StepConfig(
        shape=shape, flags=jnp.asarray(flags), omega=1.0, types=[tc],
        solidify_every=2, cepac_tau=0.62, interior_every=2,
        interior_entire_every=4,
    )
    assert shardmap_supported(cfg)
    cells = make_cell_state(
        (mesh_t.vertices + np.array([12.0, 8.0, 3.6]))[None],
    )
    g0 = np.zeros(shape, np.float32)
    g0[12:20, 4:12, 4:12] = 1.0
    state = initial_sim_state(cfg, [cells], cepac0=jnp.asarray(g0))

    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 4
    )
    mesh = make_mesh(8)
    out = build_shardmap_runner(cfg, mesh)(shard_state(state, mesh), 4)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.flags_state),
                                  np.asarray(ref.flags_state))
    assert np.allclose(np.asarray(out.cepac), np.asarray(ref.cepac),
                       rtol=1e-6, atol=1e-8)
    assert np.allclose(np.asarray(out.omega_field),
                       np.asarray(ref.omega_field), rtol=0, atol=1e-6)
    assert (np.asarray(ref.flags_state) != flags).any()


def test_solidify_2d_mesh_shardmap():
    """r05: solidify rides 2-D ("x","y") meshes — tile-local phase A
    (x/y-restricted interior_mask), two-hop corner ghosts for the
    binding/Tresca neighbourhood in phase B."""
    from hemocell_tpu.cells.state import make_cell_state
    from hemocell_tpu.dynamics import StepConfig, TypeConfig, \
        initial_sim_state
    from hemocell_tpu.mechanics import (
        MODEL_REGISTRY,
        MaterialConstants,
        material_dict,
        topology_device_arrays,
    )
    from hemocell_tpu.mesh import build_topology, ellipsoid_from_sphere

    mesh_t = ellipsoid_from_sphere(2.5, 0.435, 66)
    topo = build_topology(mesh_t)
    shape = (32, 32, 16)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL
    tc = TypeConfig(
        name="PLT", model_fn=MODEL_REGISTRY["PltSimpleModel"],
        topo=topology_device_arrays(topo),
        material=material_dict(MaterialConstants(
            k_volume=0.5, k_area=0.5, k_link=0.5, k_bend=0.2)),
        solidify=True, distance_threshold=2.0, shear_threshold=-1.0,
        interior_box=12, omega_interior=0.6,
    )
    cfg = StepConfig(
        shape=shape, flags=jnp.asarray(flags), omega=1.0, types=[tc],
        solidify_every=2, interior_every=2, interior_entire_every=4,
    )
    mesh2 = make_mesh(8, axes=("x", "y"))
    assert shardmap_supported(cfg, mesh2)
    # place the platelet straddling an interior (x,y) tile corner so the
    # hardening scatter and ghost reads genuinely cross both axes
    nx2, ny2 = int(mesh2.shape["x"]), int(mesh2.shape["y"])
    cx, cy = 32 // nx2, 32 // ny2
    cells = make_cell_state(
        (mesh_t.vertices + np.array([float(cx), float(cy), 3.6]))[None],
    )
    state = initial_sim_state(cfg, [cells])

    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 4
    )
    out = build_shardmap_runner(cfg, mesh2)(shard_state(state, mesh2), 4)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.flags_state),
                                  np.asarray(ref.flags_state))
    np.testing.assert_array_equal(np.asarray(out.binding_mask),
                                  np.asarray(ref.binding_mask))
    assert np.allclose(np.asarray(out.omega_field),
                       np.asarray(ref.omega_field), rtol=0, atol=1e-6)
    for co, cr in zip(out.cells, ref.cells):
        np.testing.assert_array_equal(np.asarray(co.alive),
                                      np.asarray(cr.alive))
        np.testing.assert_array_equal(np.asarray(co.solidify),
                                      np.asarray(cr.solidify))
    assert (np.asarray(ref.flags_state) != flags).any()
