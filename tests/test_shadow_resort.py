"""Amortised-resort IBM shadow (StepConfig.resort_every > 1) must match the
per-step-sort path: the sorted layout persists while positions drift, with
widened kernel windows + two edge programs absorbing up to one slab of
drift (including across the periodic x-boundary)."""

import dataclasses
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hemocell_tpu.dynamics import build_runner, shadow_active
from hemocell_tpu.presets import rbc_suspension


def _compare(n_steps, **kw):
    cfg, state, _ = rbc_suspension(spread_mode="pallas", **kw)
    assert shadow_active(dataclasses.replace(cfg, resort_every=8))
    ref = build_runner(cfg)(state, n_steps)
    out = build_runner(dataclasses.replace(cfg, resort_every=8))(
        state, n_steps
    )
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7)
    for co, cr in zip(out.cells, ref.cells):
        assert np.allclose(np.asarray(co.pos), np.asarray(cr.pos),
                           rtol=0, atol=1e-6)
        assert np.allclose(np.asarray(co.vel), np.asarray(cr.vel),
                           rtol=0, atol=1e-8)
        assert not np.isnan(np.asarray(co.pos)).any()


def test_shadow_matches_per_step_sort():
    _compare(
        20, shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        particle_every=2, material_every=4, repulsion=False,
    )


def test_shadow_with_repulsion():
    _compare(
        12, shape=(32, 16, 16), n_cells=2, body_force=(1e-6, 0, 0),
        particle_every=2, material_every=4, repulsion=True,
    )


def test_shadow_boundary_crossing():
    """A cell straddling x=0 keeps exchanging vertices across the periodic
    boundary — the virtual slab -1 / X programs must catch them."""
    import math

    from hemocell_tpu.cells.state import make_cell_state, place_cells
    from hemocell_tpu.presets import default_params, rbc_material
    from hemocell_tpu.mesh import build_topology, rbc_from_sphere
    from hemocell_tpu.dynamics import StepConfig, TypeConfig, \
        initial_sim_state
    from hemocell_tpu.mechanics import MODEL_REGISTRY, topology_device_arrays

    params = default_params()
    mesh = rbc_from_sphere(3.91e-6 / params.dx, 600)
    topo = build_topology(mesh)
    shape = (32, 16, 16)
    centers = np.array([[0.5, 8.0, 8.0]])  # straddles x=0
    cells = place_cells(mesh.vertices, centers, np.zeros((1, 3)))
    tc = TypeConfig(
        name="RBC", model_fn=MODEL_REGISTRY["RbcHighOrderModel"],
        topo=topology_device_arrays(topo),
        material=rbc_material(params, mesh.num_triangles),
        material_every=4,
    )
    cfg = StepConfig(
        shape=shape, flags=jnp.zeros(shape, jnp.uint8), omega=1.0 / 1.1,
        types=[tc], body_force=jnp.asarray([1e-6, 0.0, 0.0]),
        particle_every=2, f_limit=1e30, dtype=jnp.float32,
        spread_mode="pallas",
    )
    state = initial_sim_state(cfg, [make_cell_state(cells)])
    ref = build_runner(cfg)(state, 20)
    out = build_runner(dataclasses.replace(cfg, resort_every=8))(state, 20)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7)
    assert np.allclose(
        np.asarray(out.cells[0].pos), np.asarray(ref.cells[0].pos),
        rtol=0, atol=1e-6,
    )
