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


def test_deformed_cells_halo_deposits():
    """Inflated cells produce nonzero membrane forces from step 0 that
    spread across slab boundaries — guards the envelope halo-add
    directions (equilibrium-placed cells spread ~zero force, which made
    the original tests vacuous for the deposit halo; the r05 direction
    fix was caught by exactly this pattern)."""
    cfg, state = _build()
    cs = state.cells[0]
    p = np.asarray(cs.pos)
    cm = p.mean(axis=1, keepdims=True)
    p = cm + (p - cm) * 1.12
    state = state._replace(cells=(cs._replace(pos=jnp.asarray(p)),))
    # the spread force must actually be nonzero or this test is vacuous
    from hemocell_tpu.dynamics import build_runner as _br

    ref = _br(dataclasses.replace(cfg, spread_mode="pallas"))(state, 1)
    assert np.abs(np.asarray(ref.cells[0].force)).max() > 1e-6
    _compare(cfg, state, n=4)
    _compare(cfg, state, n=4, n_shards=2)


def test_unsupported_gating():
    cfg, _ = _build()
    # v2 covers repulsion / interior viscosity / CEPAC / BC overrides
    assert owner_supported(
        dataclasses.replace(cfg, repulsion_constant=1.0), 3
    )
    assert owner_supported(dataclasses.replace(cfg, cepac_tau=0.6), 3)
    assert owner_supported(dataclasses.replace(cfg, interior_every=4), 3)
    # genuinely unsupported combos remain gated
    assert not owner_supported(
        dataclasses.replace(cfg, lees_edwards_velocity=0.1), 3
    )
    assert not owner_supported(
        dataclasses.replace(cfg, solidify_every=10), 3
    )
    assert not owner_supported(
        dataclasses.replace(cfg, spread_mode="scatter"), 3
    )
    # r05: Adams-Bashforth rides the owner tables (vel_prev column)
    assert owner_supported(
        dataclasses.replace(cfg, material_integration=2), 3
    )
    assert not owner_supported(cfg, 0)


def test_intercell_repulsion_matches():
    # translate cell 1 so its closest vertex pair with cell 0 sits at
    # 0.4 lu — inside a cutoff that respects the 27-bin neighbour-search
    # design envelope (cutoff <= 1 lu; beyond it candidate coverage is
    # implementation-defined and the Pallas/jnp paths may differ)
    cfg, state = _build()
    cs = state.cells[0]
    p = np.array(np.asarray(cs.pos))
    diff = p[0][:, None, :] - p[1][None, :, :]
    dist = np.linalg.norm(diff, axis=-1)
    i, j = np.unravel_index(dist.argmin(), dist.shape)
    p[1] = p[1] - (dist[i, j] - 0.4) * (p[1][j] - p[0][i]) / dist[i, j]
    state = state._replace(cells=(cs._replace(pos=jnp.asarray(p)),))
    cfg = dataclasses.replace(
        cfg, repulsion_constant=5e-4, repulsion_cutoff=1.0,
        repulsion_every=2,
    )
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 6
    )
    # the pair force must actually be nonzero or this test is vacuous
    fr = np.concatenate(
        [np.asarray(c.force_repulsion).ravel() for c in ref.cells]
    )
    assert np.abs(fr).max() > 0.0
    _compare(cfg, state, n=6)
    _compare(cfg, state, n=6, n_shards=2)  # nx==2 single-copy dedup


def test_boundary_repulsion_matches():
    from hemocell_tpu.cells.repulsion import boundary_neighbor_mask

    cfg, state = _build(walls=True)
    bmask = boundary_neighbor_mask(np.asarray(cfg.flags))
    cfg = dataclasses.replace(
        cfg, boundary_repulsion_constant=5e-4,
        boundary_repulsion_cutoff=1.5, boundary_repulsion_every=2,
        boundary_mask=jnp.asarray(bmask),
    )
    _compare(cfg, state, n=6)


def test_interior_viscosity_matches():
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state = _build()
    tc = dataclasses.replace(
        cfg.types[0], omega_interior=0.5, interior_box=20
    )
    cfg = dataclasses.replace(
        cfg, types=[tc], interior_every=2, interior_entire_every=4
    )
    state = initial_sim_state(cfg, state.cells)
    out = _compare(cfg, state, n=6)
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 6
    )
    assert np.allclose(
        np.asarray(out.omega_field), np.asarray(ref.omega_field),
        rtol=0, atol=1e-6,
    )
    # the interior omega must actually differ somewhere
    assert (np.asarray(ref.omega_field) == 0.5).any()


def test_cepac_matches():
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state = _build()
    cfg = dataclasses.replace(cfg, cepac_tau=0.62)
    g0 = np.zeros(cfg.shape, np.float32)
    g0[28:36, 8:16, 8:16] = 1.0
    state = initial_sim_state(cfg, state.cells, cepac0=jnp.asarray(g0))
    out = _compare(cfg, state, n=6)
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 6
    )
    assert np.allclose(
        np.asarray(out.cepac), np.asarray(ref.cepac),
        rtol=1e-6, atol=1e-8,
    )


def test_velocity_bc_matches():
    cfg, state = _build(shear_velocity=0.01)
    _compare(cfg, state, n=6)


def test_facade_auto_selects_owner(tmp_path):
    """distribute() picks the owner-computes path by default whenever it
    covers the configuration — including repulsion (v2) — and falls back
    to the replicated step when forced or unsupported."""
    from hemocell_tpu import HemoCell

    (tmp_path / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx>
        <dt>1e-7</dt><kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    (tmp_path / "RBC.xml").write_text(
        (os.path.join(os.path.dirname(__file__), "..") and open(
            os.path.join(
                os.path.dirname(__file__), "..", "tools", "cell_templates",
                "RBC_template.xml",
            )
        ).read())
    )
    (tmp_path / "RBC.pos").write_text(
        "2\n12.0 6.0 6.0 0 0 0\n36.0 6.0 6.0 0 0 0\n"
    )

    def build():
        hc = HemoCell(str(tmp_path / "config.xml"))
        hc.initialize_lattice(shape=(128, 24, 24))
        hc.add_cell_type("RBC", "RbcHighOrderModel")
        hc.load_particles()
        hc.set_body_force((1e-6, 0.0, 0.0))
        hc.enable_repulsion(constant=5e-4, cutoff=1.0, every=2)
        return hc

    hc = build()
    hc.distribute(4)
    hc.iterate(2)
    hc.block()
    assert hc._distributed_mode == "owner"

    # forced replicated path still works and is honoured
    hc2 = build()
    hc2.distribute(4, particle_sharding="replicated")
    hc2.iterate(2)
    hc2.block()
    assert hc2._distributed_mode in ("shardmap", "gspmd")
    assert np.allclose(
        np.asarray(hc.state.f), np.asarray(hc2.state.f),
        rtol=1e-6, atol=1e-7,
    )


def test_pipeflow30_owner_sharded_matches():
    """The NORTH-STAR case (periodic pipe, packCells init, RBC+PLT,
    repulsion, walls, timescales) auto-selects the owner-computes runner
    under distribute(8) and matches the single-device step (VERDICT r04
    #1 'Done' criterion).  ~60 s on the virtual CPU mesh."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                     "cases"))
    from pipeflow30 import build_pipeflow30

    hc = build_pipeflow30(workdir=None)
    hc.iterate(2)
    hc.block()
    ref = hc.state

    hc2 = build_pipeflow30(workdir=None)
    hc2.distribute(8)
    hc2.iterate(2)
    hc2.block()
    assert hc2._distributed_mode == "owner"
    assert int(hc2.state.ibm_overflow) == 0
    assert float(jnp.max(jnp.abs(hc2.state.f - ref.f))) < 1e-7
    for a, b in zip(hc2.state.cells, ref.cells):
        assert float(jnp.max(jnp.abs(a.pos - b.pos))) < 1e-5
        assert np.array_equal(np.asarray(a.alive), np.asarray(b.alive))


def _compare_2d(cfg, state, n=4):
    """Owner runner on a 2-D ("x","y") mesh vs the single-device step."""
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, n
    )
    env = suggest_envelope(state.cells, resort_every=cfg.resort_every)
    mesh = make_mesh(8, axes=("x", "y"))
    run = build_owner_runner(cfg, mesh, envelope=env)
    out = run(shard_state(state, mesh), n)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7), "fluid mismatch"
    for co, cr in zip(out.cells, ref.cells):
        assert np.allclose(np.asarray(co.pos), np.asarray(cr.pos),
                           rtol=0, atol=1e-5), "pos mismatch"
        assert np.array_equal(np.asarray(co.alive), np.asarray(cr.alive))
    assert int(out.ibm_overflow) == 0
    return out


def test_owner_2d_mesh_matches():
    """2-D ("x","y") owner tables: per-tile ownership, two-hop corner
    halos for deposits/velocities, 3x3 neighbour tables.  Deformed cells
    make the deposit halo non-vacuous (see
    test_deformed_cells_halo_deposits)."""
    cfg, state = _build(shape=(48, 48, 16), n_cells=4)
    cs = state.cells[0]
    p = np.asarray(cs.pos)
    cm = p.mean(axis=1, keepdims=True)
    p = cm + (p - cm) * 1.12
    state = state._replace(cells=(cs._replace(pos=jnp.asarray(p)),))
    _compare_2d(cfg, state, n=4)


def test_owner_2d_walls_and_migration():
    """Walls + a diagonal initial flow: cells drift across BOTH tile
    axes (two-phase migration; corner migrants ride two hops)."""
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state = _build(shape=(48, 48, 16), n_cells=4, resort_every=1)
    flags = np.zeros((48, 48, 16), np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    cfg = dataclasses.replace(cfg, flags=jnp.asarray(flags))
    state = initial_sim_state(cfg, state.cells, u0=(0.03, 0.02, 0.0))
    _compare_2d(cfg, state, n=8)


def test_owner_2d_repulsion_matches():
    """Inter-cell repulsion on the 2-D mesh: the ±y exchange of the
    x-union must deliver corner-neighbour cells to the pair search."""
    cfg, state = _build(shape=(48, 48, 16), n_cells=4)
    cs = state.cells[0]
    p = np.array(np.asarray(cs.pos))
    diff = p[0][:, None, :] - p[1][None, :, :]
    dist = np.linalg.norm(diff, axis=-1)
    i, j = np.unravel_index(dist.argmin(), dist.shape)
    p[1] = p[1] - (dist[i, j] - 0.4) * (p[1][j] - p[0][i]) / dist[i, j]
    state = state._replace(cells=(cs._replace(pos=jnp.asarray(p)),))
    cfg = dataclasses.replace(
        cfg, repulsion_constant=5e-4, repulsion_cutoff=1.0,
        repulsion_every=2,
    )
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 4
    )
    fr = np.concatenate(
        [np.asarray(c.force_repulsion).ravel() for c in ref.cells]
    )
    assert np.abs(fr).max() > 0.0
    _compare_2d(cfg, state, n=4)


def test_facade_auto_selects_owner_2d(tmp_path):
    """distribute() with a 2-D mesh picks the owner runner when both tile
    axes satisfy the envelope bounds."""
    from hemocell_tpu import HemoCell
    from hemocell_tpu.parallel.sharding import make_mesh

    (tmp_path / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx>
        <dt>1e-7</dt><kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    (tmp_path / "RBC.xml").write_text(open(os.path.join(
        os.path.dirname(__file__), "..", "tools", "cell_templates",
        "RBC_template.xml")).read())
    (tmp_path / "RBC.pos").write_text(
        "2\n12.0 12.0 6.0 0 0 0\n30.0 20.0 6.0 0 0 0\n"
    )
    hc = HemoCell(str(tmp_path / "config.xml"))
    hc.initialize_lattice(shape=(96, 96, 24))
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.set_body_force((1e-6, 0.0, 0.0))
    hc.distribute(mesh=make_mesh(8, axes=("x", "y")))
    hc.iterate(2)
    hc.block()
    assert hc._distributed_mode == "owner"
    assert int(hc.state.ibm_overflow) == 0


def test_adams_bashforth_matches():
    """material_integration=2 (pos += 1.5v - 0.5v_prev,
    hemoCellParticle.h:197-200): vel_prev is an owner-table column that
    migrates with its cell."""
    from hemocell_tpu.cells.state import make_cell_state
    from hemocell_tpu.dynamics import initial_sim_state

    cfg, state = _build(u0=0.03)
    cfg = dataclasses.replace(cfg, material_integration=2)
    cells_ab = make_cell_state(
        np.asarray(state.cells[0].pos), adams_bashforth=True
    )
    state = initial_sim_state(cfg, [cells_ab], u0=(0.03, 0.0, 0.0))
    out = _compare(cfg, state, n=6)
    ref = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 6
    )
    assert np.allclose(
        np.asarray(out.cells[0].vel_prev),
        np.asarray(ref.cells[0].vel_prev), rtol=0, atol=1e-7,
    )
