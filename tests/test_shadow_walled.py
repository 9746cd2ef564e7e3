"""Walled-domain IBM shadow: with boundaries present the amortised-resort
path must renormalise in-kernel (mask-aware spread + [u*m, m] interp) and
match the per-step-sort pallas path bit-for-bit modulo f32 roundoff.

Reference semantics: boundary-aware phi2 weight renormalisation,
core/immersedBoundaryMethod.h:62-138."""

import dataclasses
import math
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.cells.state import make_cell_state, place_cells
from hemocell_tpu.dynamics import (
    StepConfig,
    TypeConfig,
    build_runner,
    initial_sim_state,
    shadow_active,
)
from hemocell_tpu.mechanics import MODEL_REGISTRY, topology_device_arrays
from hemocell_tpu.mesh import build_topology, rbc_from_sphere
from hemocell_tpu.presets import default_params, rbc_material


def _tube_cfg(shape=(32, 16, 16), centers=((16.0, 8.0, 8.0),),
              boundary_repulsion=False, **kw):
    """Small periodic-x tube: cylindrical FLAG_WALL shell in the y/z
    cross-section, body-force driven."""
    params = default_params()
    mesh = rbc_from_sphere(3.91e-6 / params.dx, 600)
    topo = build_topology(mesh)

    X, Y, Z = shape
    yy, zz = np.meshgrid(np.arange(Y), np.arange(Z), indexing="ij")
    r2 = (yy - (Y - 1) / 2) ** 2 + (zz - (Z - 1) / 2) ** 2
    wall2d = r2 > ((Y - 2) / 2) ** 2
    flags = np.where(wall2d[None, :, :], FLAG_WALL, 0).astype(np.uint8)
    flags = np.broadcast_to(flags, shape).copy()

    cells = place_cells(
        mesh.vertices, np.asarray(centers, np.float64),
        np.zeros((len(centers), 3)),
    )
    tc = TypeConfig(
        name="RBC", model_fn=MODEL_REGISTRY["RbcHighOrderModel"],
        topo=topology_device_arrays(topo),
        material=rbc_material(params, mesh.num_triangles),
        material_every=4,
    )
    extra = {}
    if boundary_repulsion:
        from hemocell_tpu.cells.repulsion import boundary_neighbor_mask

        bmask = boundary_neighbor_mask(flags)
        extra = dict(
            boundary_repulsion_constant=1e-21 / params.df,
            boundary_repulsion_cutoff=0.7,
            boundary_repulsion_every=2,
            boundary_mask=jnp.asarray(bmask),
        )
    cfg = StepConfig(
        shape=shape, flags=jnp.asarray(flags), omega=1.0 / params.tau,
        types=[tc], body_force=jnp.asarray([2e-6, 0.0, 0.0]),
        particle_every=2, f_limit=params.f_limit, dtype=jnp.float32,
        spread_mode="pallas", **extra, **kw,
    )
    state = initial_sim_state(cfg, [make_cell_state(cells)])
    return cfg, state


def _compare(cfg, state, n_steps):
    assert shadow_active(dataclasses.replace(cfg, resort_every=8))
    ref = build_runner(cfg)(state, n_steps)
    out = build_runner(dataclasses.replace(cfg, resort_every=8))(
        state, n_steps
    )
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-6, atol=1e-7)
    for co, cr in zip(out.cells, ref.cells):
        assert np.array_equal(np.asarray(co.alive), np.asarray(cr.alive))
        assert np.allclose(np.asarray(co.pos), np.asarray(cr.pos),
                           rtol=0, atol=1e-6)
        assert np.allclose(np.asarray(co.vel), np.asarray(cr.vel),
                           rtol=0, atol=1e-8)
        assert not np.isnan(np.asarray(co.pos)).any()


def test_walled_shadow_matches_per_step_sort():
    cfg, state = _tube_cfg()
    _compare(cfg, state, 20)


def test_walled_shadow_near_wall_cell():
    """A cell close to the wall exercises the renormalisation (weight
    totals < 1) and wall-contact deletion masks."""
    cfg, state = _tube_cfg(centers=((8.0, 8.0, 11.0),),
                           boundary_repulsion=True)
    _compare(cfg, state, 16)


def test_walled_shadow_matches_scatter():
    """Cross-path oracle: walled shadow vs the jnp scatter reference."""
    cfg, state = _tube_cfg()
    ref = build_runner(
        dataclasses.replace(cfg, spread_mode="scatter", use_pallas=False)
    )(state, 12)
    out = build_runner(dataclasses.replace(cfg, resort_every=8))(state, 12)
    assert np.allclose(np.asarray(out.f), np.asarray(ref.f),
                       rtol=1e-5, atol=1e-6)
    assert np.allclose(
        np.asarray(out.cells[0].pos), np.asarray(ref.cells[0].pos),
        rtol=0, atol=1e-5,
    )


def test_fused_wall_hit_deletes():
    """r05: the wall-contact verdict is computed IN the fused spread pass
    (one step deferred vs the reference's post-advance schedule — see
    _spread_renorm_hit_kernel).  A cell whose vertices overlap the wall
    shell must still be deleted through the shadow path, within one step
    of the per-step-sort path's deletion."""
    # center the cell just off-axis so its rim pokes into the wall shell
    cfg, state = _tube_cfg(centers=((16.0, 8.0, 12.5),))
    ref = build_runner(cfg)(state, 3)
    out = build_runner(dataclasses.replace(cfg, resort_every=8))(state, 3)
    ref_alive = bool(np.asarray(ref.cells[0].alive)[0])
    out_alive = bool(np.asarray(out.cells[0].alive)[0])
    assert not ref_alive, "test is vacuous: reference path did not delete"
    assert not out_alive, "fused wall-hit verdict failed to delete"
    # restime froze within one step of the reference's
    assert abs(int(np.asarray(out.cells[0].restime)[0])
               - int(np.asarray(ref.cells[0].restime)[0])) <= 1
