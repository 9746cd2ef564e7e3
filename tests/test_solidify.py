"""Solidify mechanics: a platelet near a binding site under (trivially
satisfied) shear thresholds is tagged, then hardened into bounce-back nodes
and removed — the reference pipeline pltSimpleModel::solidifyMechanics +
solidifyCells (pltSimpleModel.cpp:211-248,
core/hemoCellParticleField.cpp:1018-1070)."""

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.dynamics import (
    StepConfig,
    TypeConfig,
    build_runner,
    initial_sim_state,
)
from hemocell_tpu.cells.state import make_cell_state
from hemocell_tpu.mechanics import (
    MODEL_REGISTRY,
    MaterialConstants,
    material_dict,
    topology_device_arrays,
)
from hemocell_tpu.mesh import build_topology, ellipsoid_from_sphere
from hemocell_tpu.fluid.tresca import symmetric3x3_eigenvalues


def test_symmetric_eigenvalues():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 3))
    A = (A + A.T) / 2
    s = jnp.asarray(
        [A[0, 0], A[1, 1], A[2, 2], A[0, 1], A[0, 2], A[1, 2]], jnp.float64
    ).reshape(6, 1)
    l0, l1, l2 = symmetric3x3_eigenvalues(s)
    expect = np.sort(np.linalg.eigvalsh(A))
    got = np.sort([float(l0[0]), float(l1[0]), float(l2[0])])
    np.testing.assert_allclose(got, expect, atol=1e-10)


def _plt_setup(solidify_every=2):
    mesh = ellipsoid_from_sphere(2.5, 0.435, 66)
    topo = build_topology(mesh)
    shape = (24, 24, 24)
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = FLAG_WALL  # binding sites on the floor
    mat = material_dict(
        MaterialConstants(k_volume=0.5, k_area=0.5, k_link=0.5, k_bend=0.2)
    )
    tc = TypeConfig(
        name="PLT",
        model_fn=MODEL_REGISTRY["PltSimpleModel"],
        topo=topology_device_arrays(topo, dtype=jnp.float64),
        material=mat,
        solidify=True,
        distance_threshold=2.0,
        shear_threshold=-1.0,  # always satisfied: tests the pipeline
        interior_box=12,
    )
    cfg = StepConfig(
        shape=shape,
        flags=jnp.asarray(flags),
        omega=1.0,
        types=[tc],
        solidify_every=solidify_every,
        dtype=jnp.float64,
        use_pallas=False,
    )
    # platelet hovering just above the floor binding sites (the template's
    # flat axis is y; its z half-extent is the full 2.5 radius)
    cells = make_cell_state(
        (mesh.vertices + np.array([12.0, 12.0, 3.6]))[None], dtype=jnp.float64
    )
    state = initial_sim_state(cfg, [cells])
    return cfg, state


def test_solidify_pipeline():
    cfg, state = _plt_setup(solidify_every=2)
    run = build_runner(cfg)
    wall0 = int((np.asarray(state.flags_state) == FLAG_WALL).sum())
    assert bool(state.binding_mask.any())

    # first solidify step (it=0): no cell tagged yet -> tag now
    state = run(state, 1)
    assert bool(state.cells[0].solidify[0])
    assert bool(state.cells[0].alive[0])

    # second solidify step (it=2): tagged cell hardens and is removed
    state = run(state, 2)
    assert not bool(state.cells[0].alive[0])
    wall1 = int((np.asarray(state.flags_state) == FLAG_WALL).sum())
    assert wall1 > wall0  # interior converted to bounce-back
    # binding sites grew into the solidified region (platelet centre)
    b = np.asarray(state.binding_mask)
    assert b[12, 12, 4] or b[12, 12, 3]


def test_solidify_threshold_blocks():
    cfg, state = _plt_setup(solidify_every=2)
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        types=[dataclasses.replace(cfg.types[0], shear_threshold=1e12)],
    )
    run = build_runner(cfg)
    state = run(state, 4)
    assert not bool(state.cells[0].solidify[0])
    assert bool(state.cells[0].alive[0])
