"""IBM slab-window overflow: the Pallas spread kernels have a static
per-slab window capacity; vertices past it are dropped in-kernel.  The plan
counts them (`IbmPlanT.overflow`), the step carries a running max in
`SimState.ibm_overflow`, and `HemoCell.iterate` must detect a non-zero
counter and fall back to the exact scatter path (VERDICT r1: silent
physics corruption is never acceptable)."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hemocell_tpu.cells.state import make_cell_state, place_cells
from hemocell_tpu.dynamics import (
    StepConfig,
    TypeConfig,
    build_runner,
    initial_sim_state,
)
from hemocell_tpu.mechanics import MODEL_REGISTRY, topology_device_arrays
from hemocell_tpu.mesh import build_topology, rbc_from_sphere
from hemocell_tpu.presets import default_params, rbc_material


def _packed_cfg(n_cells=24, shape=(32, 16, 16)):
    """Tiny cells all stacked at the same x -> slab occupancy far above
    slab_capacity's 4x-mean headroom."""
    params = default_params()
    mesh = rbc_from_sphere(1.2, 120)  # ~1.2 lu radius: spans ~3 slabs
    topo = build_topology(mesh)
    centers = [(16.0, 8.0, 8.0)] * n_cells
    cells = place_cells(
        mesh.vertices, np.asarray(centers, np.float64),
        np.zeros((n_cells, 3)),
    )
    tc = TypeConfig(
        name="RBC", model_fn=MODEL_REGISTRY["NoOp"],
        topo=topology_device_arrays(topo),
        material=rbc_material(params, mesh.num_triangles),
    )
    cfg = StepConfig(
        shape=shape, flags=jnp.zeros(shape, jnp.uint8), omega=1.0,
        types=[tc], particle_every=1, f_limit=params.f_limit,
        dtype=jnp.float32, spread_mode="pallas",
    )
    return cfg, initial_sim_state(cfg, [make_cell_state(cells)])


def test_overflow_counter_propagates():
    cfg, state = _packed_cfg()
    out = build_runner(cfg)(state, 2)
    assert int(np.asarray(out.ibm_overflow)) > 0


def test_no_overflow_on_spread_cells():
    """Well-distributed cells: counter stays zero."""
    params = default_params()
    mesh = rbc_from_sphere(1.2, 120)
    topo = build_topology(mesh)
    centers = [(4.0 + 8.0 * i, 8.0, 8.0) for i in range(4)]
    cells = place_cells(
        mesh.vertices, np.asarray(centers, np.float64), np.zeros((4, 3))
    )
    tc = TypeConfig(
        name="RBC", model_fn=MODEL_REGISTRY["NoOp"],
        topo=topology_device_arrays(topo),
        material=rbc_material(params, mesh.num_triangles),
    )
    cfg = StepConfig(
        shape=(32, 16, 16), flags=jnp.zeros((32, 16, 16), jnp.uint8),
        omega=1.0, types=[tc], particle_every=1, f_limit=params.f_limit,
        dtype=jnp.float32, spread_mode="pallas",
    )
    state = initial_sim_state(cfg, [make_cell_state(cells)])
    out = build_runner(cfg)(state, 2)
    assert int(np.asarray(out.ibm_overflow)) == 0


def test_iterate_falls_back_to_scatter(tmp_path):
    """A non-zero counter after a runner call flips the facade to the
    scatter path and warns."""
    from hemocell_tpu import HemoCell

    cfgdir = tmp_path / "case"
    os.makedirs(cfgdir, exist_ok=True)
    (cfgdir / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx><dt>1e-7</dt>
        <kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    hc = HemoCell(str(cfgdir / "config.xml"))
    hc.initialize_lattice(shape=(16, 16, 16))
    hc.iterate(1)
    # inject a fake overflow (as if a packed slab overflowed in-kernel);
    # the guard is deferred by one iterate call (async device->host fetch),
    # so the warning fires on the call AFTER the counter turns non-zero
    hc._state = hc._state._replace(ibm_overflow=jnp.asarray(7, jnp.int32))
    hc.iterate(1)  # ships the non-zero counter asynchronously
    with pytest.warns(UserWarning, match="overflow"):
        # the opportunistic check fires here if the async fetch already
        # landed; block() is the deterministic sync backstop (r04: the
        # guard no longer blocks inside chained iterate() calls)
        hc.iterate(1)
        hc.block()
    assert hc.spread_mode == "scatter"
    assert int(np.asarray(hc._state.ibm_overflow)) == 0
    hc.iterate(1)  # rebuild with scatter path still runs

    # flush_overflow_guard checks the CURRENT state synchronously
    hc2 = HemoCell(str(cfgdir / "config.xml"))
    hc2.initialize_lattice(shape=(16, 16, 16))
    hc2.spread_mode = None
    hc2.iterate(1)
    hc2._state = hc2._state._replace(ibm_overflow=jnp.asarray(3, jnp.int32))
    with pytest.warns(UserWarning, match="overflow"):
        hc2.flush_overflow_guard()
    assert hc2.spread_mode == "scatter"


def test_profile_phases_smoke(tmp_path):
    """profile_phases emits the reference-style per-phase table
    (helper/profiler.cpp:138-180) with a positive total and the
    collideAndStream phase present."""
    from hemocell_tpu import HemoCell
    from test_integration import CONFIG_XML, RBC_XML

    (tmp_path / "config.xml").write_text(CONFIG_XML)
    (tmp_path / "RBC.xml").write_text(RBC_XML)
    (tmp_path / "RBC.pos").write_text("1\n12.0 6 6 0 0 0\n")
    hc = HemoCell(str(tmp_path / "config.xml"))
    hc.initialize_lattice(shape=(48, 24, 24))
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    assert hc.cell_states[0].pos.shape[0] == 1
    res = hc.profile_phases(n=2, repeats=1)
    assert res["total (iterate)"] > 0
    for key in ("collideAndStream", "spreadParticleForce",
                "interpolateFluidVelocity", "applyConstitutiveModel",
                "other (advance/integrate/machinery)"):
        assert key in res and res[key] >= 0


def test_overflow_recovers_to_pallas_then_scatter(tmp_path):
    """r05: first overflow REBUILDS the Pallas windows from current
    occupancy with an escalated margin (no permanent scatter
    degradation); only repeated overflow falls back to scatter."""
    from hemocell_tpu import HemoCell

    cfgdir = tmp_path / "case"
    os.makedirs(cfgdir, exist_ok=True)
    (cfgdir / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx><dt>1e-7</dt>
        <kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    (cfgdir / "RBC.xml").write_text(open(os.path.join(
        os.path.dirname(__file__), "..", "tools", "cell_templates",
        "RBC_template.xml")).read())
    (cfgdir / "RBC.pos").write_text("1\n12.0 6.0 6.0 0 0 0\n")
    hc = HemoCell(str(cfgdir / "config.xml"))
    hc.initialize_lattice(shape=(48, 24, 24))
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.iterate(1)
    cap0 = hc._step_cfg.ibm_capacity

    def inject_and_trip():
        hc._state = hc._state._replace(
            ibm_overflow=jnp.asarray(9, jnp.int32))
        hc.iterate(1)
        with pytest.warns(UserWarning, match="overflow"):
            hc.iterate(1)
            hc.block()

    inject_and_trip()
    assert getattr(hc, 'spread_mode', None) is None  # recovered, still Pallas
    assert hc._overflow_recoveries == 1
    hc.iterate(2)  # rebuilt runner executes
    hc.block()
    assert hc._step_cfg.ibm_capacity >= cap0  # escalated margin

    inject_and_trip()
    assert getattr(hc, 'spread_mode', None) is None
    assert hc._overflow_recoveries == 2

    inject_and_trip()  # third strike: permanent scatter fallback
    assert hc.spread_mode == "scatter"
    hc.iterate(1)
    hc.block()
