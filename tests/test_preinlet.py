"""PreInlet coupling: velocity-plane forwarding and periodic-image particle
re-injection (reference: helper/preInlet.{h,cpp})."""

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.config.defaults import FLAG_VELOCITY, FLAG_WALL
from hemocell_tpu.cells.state import make_cell_state
from hemocell_tpu.dynamics import StepConfig, TypeConfig, initial_sim_state
from hemocell_tpu.mechanics import (
    MODEL_REGISTRY,
    MaterialConstants,
    material_dict,
    topology_device_arrays,
)
from hemocell_tpu.mesh import build_topology, icosphere
from hemocell_tpu.utils.preinlet import (
    PreInletState,
    initial_crossings,
    make_coupled_stepper,
)


def _type(dtype=jnp.float64):
    mesh = icosphere(80).scaled(2.0)
    topo = build_topology(mesh)
    return mesh, TypeConfig(
        name="cell",
        model_fn=MODEL_REGISTRY["RbcHighOrderModel"],
        topo=topology_device_arrays(topo, dtype=dtype),
        # physical-scale LU coefficients (kBT_lbm ~ 1e-5); order-0.1 values
        # make the membrane feedback loop explode
        material=material_dict(
            MaterialConstants(
                k_volume=2e-5, k_area=1.5e-5, k_link=1e-5, k_bend=1e-5
            )
        ),
    )


def test_preinlet_coupling():
    shape = (24, 12, 12)
    dtype = jnp.float64
    mesh, tc = _type(dtype)

    walls = np.zeros(shape, np.uint8)
    walls[:, 0, :] = FLAG_WALL
    walls[:, -1, :] = FLAG_WALL

    pre_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(walls), omega=1.0, types=[tc],
        body_force=jnp.asarray([1e-5, 0, 0], dtype), dtype=dtype,
        use_pallas=False,
    )
    mflags = walls.copy()
    mflags[0, 1:-1, :] = FLAG_VELOCITY
    main_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(mflags), omega=1.0, types=[tc],
        dtype=dtype, use_pallas=False,
    )

    # preinlet: one cell moving with the flow; main: empty with 2 spare slots
    pre_cells = make_cell_state(
        (mesh.vertices + np.array([20.0, 6.0, 6.0]))[None], dtype=dtype
    )
    # spare slots keep the template shape, parked outside the domain
    far = mesh.vertices[None] + np.array([-100.0, 6.0, 6.0])
    far = np.repeat(far, 2, axis=0)
    main_cells = make_cell_state(far, dtype=dtype)
    main_cells = main_cells._replace(alive=jnp.zeros(2, bool))

    pre_state = initial_sim_state(pre_cfg, [pre_cells])
    main_state = initial_sim_state(main_cfg, [main_cells])
    main_state = main_state._replace(
        bc_state=jnp.zeros((3,) + shape, dtype)
    )

    stepper = make_coupled_stepper(pre_cfg, main_cfg)
    st = PreInletState(
        pre=pre_state,
        main=main_state,
        body_force=jnp.asarray(1e-5, dtype),
        crossings=initial_crossings(pre_state, shape[0]),
    )

    for _ in range(10):
        st = stepper(st)
    jax.block_until_ready(st)

    # velocity plane forwarded: the main inlet BC equals the preinlet's
    # outlet velocity profile (nonzero after 10 driven steps)
    bc = np.asarray(st.main.bc_state[0, 0, :, :])
    assert np.abs(bc).max() > 0
    # the main fluid responded
    zero = jnp.zeros((3,) + shape, dtype)
    from hemocell_tpu.fluid import lbm

    _, u_main = lbm.macroscopic(st.main.f, zero)
    assert float(jnp.abs(u_main[0]).max()) > 0

    # force a crossing: teleport the preinlet cell past the boundary
    pc = st.pre.cells[0]
    st = st._replace(
        pre=st.pre._replace(
            cells=(pc._replace(pos=pc.pos + jnp.asarray([10.0, 0, 0], dtype)),)
        )
    )
    st2 = stepper(st)
    assert int(st2.main.cells[0].alive.sum()) == 1
    # injected near the main inlet (wrapped coordinates)
    inj = int(np.argmax(np.asarray(st2.main.cells[0].alive)))
    cx = float(st2.main.cells[0].pos[inj, :, 0].mean())
    assert -8.0 < cx < 16.0
    # no double injection for the same image
    st3 = stepper(st2)
    assert int(st3.main.cells[0].alive.sum()) == 1


def test_preinlet_multi_injection():
    """Dense preinlet: >=3 cells crossing in ONE step are all transferred
    (reference ships the full crossing set each iteration,
    helper/preInlet.cpp:254-352); a full receiver defers, not drops."""
    shape = (24, 12, 12)
    dtype = jnp.float64
    mesh, tc = _type(dtype)

    walls = np.zeros(shape, np.uint8)
    walls[:, 0, :] = FLAG_WALL
    walls[:, -1, :] = FLAG_WALL
    pre_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(walls), omega=1.0, types=[tc],
        body_force=jnp.asarray([1e-5, 0, 0], dtype), dtype=dtype,
        use_pallas=False,
    )
    mflags = walls.copy()
    mflags[0, 1:-1, :] = FLAG_VELOCITY
    main_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(mflags), omega=1.0, types=[tc],
        dtype=dtype, use_pallas=False,
    )

    # 4 preinlet cells at distinct y/z-ish spots, all near the outlet
    centers = np.array([
        [20.0, 4.0, 6.0], [20.5, 8.0, 6.0],
        [21.0, 6.0, 4.0], [21.5, 6.0, 8.0],
    ])
    pre_cells = make_cell_state(
        mesh.vertices[None] + centers[:, None, :], dtype=dtype
    )
    far = np.repeat(
        mesh.vertices[None] + np.array([-100.0, 6.0, 6.0]), 3, axis=0
    )
    main_cells = make_cell_state(far, dtype=dtype)._replace(
        alive=jnp.zeros(3, bool)
    )

    pre_state = initial_sim_state(pre_cfg, [pre_cells])
    main_state = initial_sim_state(
        main_cfg, [main_cells]
    )._replace(bc_state=jnp.zeros((3,) + shape, dtype))

    stepper = make_coupled_stepper(pre_cfg, main_cfg)
    st = PreInletState(
        pre=pre_state, main=main_state,
        body_force=jnp.asarray(1e-5, dtype),
        crossings=initial_crossings(pre_state, shape[0]),
    )
    st = stepper(st)
    # teleport ALL FOUR preinlet cells across the periodic boundary at once
    # (+10 puts the mapped images safely inside the main domain, clear of
    # the inlet velocity plane that wall-contact deletion guards)
    pc = st.pre.cells[0]
    st = st._replace(
        pre=st.pre._replace(
            cells=(pc._replace(
                pos=pc.pos + jnp.asarray([10.0, 0, 0], dtype)
            ),)
        )
    )
    st2 = stepper(st)
    # only 3 receiver slots: exactly 3 injected this step
    assert int(st2.main.cells[0].alive.sum()) == 3
    # all injected cells sit near the main inlet
    alive = np.asarray(st2.main.cells[0].alive)
    cx = np.asarray(st2.main.cells[0].pos[..., 0].mean(axis=1))[alive]
    assert np.all((-8.0 < cx) & (cx < 30.0))
    # the 4th crossing was DEFERRED (watermark not advanced): freeing a
    # slot lets it inject on a later step
    mc = st2.main.cells[0]
    st2 = st2._replace(
        main=st2.main._replace(
            cells=(mc._replace(alive=mc.alive.at[0].set(False)),)
        )
    )
    st3 = stepper(st2)
    assert int(st3.main.cells[0].alive.sum()) == 3  # 2 kept + deferred one


def test_auto_preinlet_from_boundary():
    from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_VELOCITY
    from hemocell_tpu.utils.preinlet import (
        auto_preinlet_from_boundary,
        preinlet_from_slice,
    )

    flags = np.zeros((16, 8, 8), np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags[0] = FLAG_WALL  # solid cap: auto must walk inward to x=1

    pre, mask, marked, xf = auto_preinlet_from_boundary(flags, length=12)
    assert xf == 1
    assert pre.shape == (12, 8, 8)
    # preinlet cross-section replicates the slice's wall pattern
    assert (pre[:, 0, :] == FLAG_WALL).all()
    assert (pre[:, 3, :] == FLAG_FLUID).all()
    assert mask.shape == (8, 8) and mask.sum() == 6 * 8
    # main face fluid nodes re-tagged as the coupling velocity plane
    assert (marked[1][mask] == FLAG_VELOCITY).all()
    assert (marked[2] == flags[2]).all()

    pre2, mask2 = preinlet_from_slice(flags, 5, 4)
    assert pre2.shape == (4, 8, 8)
    np.testing.assert_array_equal(pre2[0], flags[5])
    assert (mask2 == (flags[5] == FLAG_FLUID)).all()


def test_preinlet_checkpoint_resume(tmp_path):
    """A coupled preinlet run checkpointed mid-flight resumes
    BIT-IDENTICALLY (reference: PRE_* checkpoint variants,
    core/hemoCellFields.cpp:312-318; .old double-buffer :290-303)."""
    from hemocell_tpu.io import (
        load_preinlet_checkpoint,
        save_preinlet_checkpoint,
    )

    shape = (24, 12, 12)
    dtype = jnp.float64
    mesh, tc = _type(dtype)

    walls = np.zeros(shape, np.uint8)
    walls[:, 0, :] = FLAG_WALL
    walls[:, -1, :] = FLAG_WALL
    pre_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(walls), omega=1.0, types=[tc],
        body_force=jnp.asarray([1e-5, 0, 0], dtype), dtype=dtype,
        use_pallas=False,
    )
    mflags = walls.copy()
    mflags[0, 1:-1, :] = FLAG_VELOCITY
    main_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(mflags), omega=1.0, types=[tc],
        dtype=dtype, use_pallas=False,
    )
    pre_cells = make_cell_state(
        (mesh.vertices + np.array([20.0, 6.0, 6.0]))[None], dtype=dtype
    )
    far = mesh.vertices[None] + np.array([-100.0, 6.0, 6.0])
    main_cells = make_cell_state(np.repeat(far, 2, axis=0), dtype=dtype)
    main_cells = main_cells._replace(alive=jnp.zeros(2, bool))
    pre_state = initial_sim_state(pre_cfg, [pre_cells])
    main_state = initial_sim_state(main_cfg, [main_cells])
    main_state = main_state._replace(bc_state=jnp.zeros((3,) + shape, dtype))

    stepper = make_coupled_stepper(pre_cfg, main_cfg,
                                   target_mean_velocity=1e-3)
    st = PreInletState(
        pre=pre_state, main=main_state,
        body_force=jnp.asarray(1e-5, dtype),
        crossings=initial_crossings(pre_state, shape[0]),
    )
    for _ in range(5):
        st = stepper(st)
    jax.block_until_ready(st)

    save_preinlet_checkpoint(str(tmp_path), st, meta={"note": "mid"})
    # second save exercises the .old double buffer
    save_preinlet_checkpoint(str(tmp_path), st)
    assert (tmp_path / "checkpoint_preinlet.npz").exists()
    assert (tmp_path / "checkpoint_preinlet.npz.old").exists()

    loaded, meta = load_preinlet_checkpoint(str(tmp_path))
    assert int(loaded.pre.it) == int(st.pre.it) == 5

    cont_a, cont_b = st, loaded
    for _ in range(5):
        cont_a = stepper(cont_a)
        cont_b = stepper(cont_b)
    jax.block_until_ready((cont_a, cont_b))

    np.testing.assert_array_equal(np.asarray(cont_a.pre.f),
                                  np.asarray(cont_b.pre.f))
    np.testing.assert_array_equal(np.asarray(cont_a.main.f),
                                  np.asarray(cont_b.main.f))
    np.testing.assert_array_equal(np.asarray(cont_a.body_force),
                                  np.asarray(cont_b.body_force))
    for ca, cb in zip(cont_a.main.cells, cont_b.main.cells):
        np.testing.assert_array_equal(np.asarray(ca.pos), np.asarray(cb.pos))
        np.testing.assert_array_equal(np.asarray(ca.alive),
                                      np.asarray(cb.alive))
    for xa, xb in zip(cont_a.crossings, cont_b.crossings):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_preinlet_distributed_matches():
    """Distributed coupled runner (main sharded over a 1-D mesh, preinlet
    replicated) vs the single-device coupled stepper — the reference's
    rank-split (core/hemoCell.cpp:475-571) as one SPMD program.  Needs 8
    virtual devices."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 (virtual) devices")
    import dataclasses

    from hemocell_tpu.parallel.sharding import make_mesh
    from hemocell_tpu.utils.preinlet import (
        build_coupled_shardmap_runner,
        shard_preinlet_state,
    )

    shape = (32, 12, 12)
    dtype = jnp.float32
    mesh_t, tc = _type(dtype)

    walls = np.zeros(shape, np.uint8)
    walls[:, 0, :] = FLAG_WALL
    walls[:, -1, :] = FLAG_WALL
    pre_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(walls), omega=1.0, types=[tc],
        body_force=jnp.asarray([1e-5, 0, 0], dtype), dtype=dtype,
        use_pallas=False,
    )
    mflags = walls.copy()
    mflags[0, 1:-1, :] = FLAG_VELOCITY
    main_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(mflags), omega=1.0, types=[tc],
        dtype=dtype, use_pallas=False,
    )

    pre_cells = make_cell_state(
        (mesh_t.vertices + np.array([26.0, 6.0, 6.0]))[None], dtype=dtype
    )
    far = np.repeat(
        mesh_t.vertices[None] + np.array([-100.0, 6.0, 6.0]), 2, axis=0
    )
    main_cells = make_cell_state(far, dtype=dtype)
    main_cells = main_cells._replace(alive=jnp.zeros(2, bool))

    pre_state = initial_sim_state(pre_cfg, [pre_cells])
    main_state = initial_sim_state(main_cfg, [main_cells])
    main_state = main_state._replace(bc_state=jnp.zeros((3,) + shape, dtype))
    st0 = PreInletState(
        pre=pre_state, main=main_state,
        body_force=jnp.asarray(1e-5, dtype),
        crossings=initial_crossings(pre_state, shape[0]),
    )

    stepper = make_coupled_stepper(pre_cfg, main_cfg,
                                   target_mean_velocity=1e-3)
    ref = st0
    for _ in range(6):
        ref = stepper(ref)
    jax.block_until_ready(ref)

    mesh = make_mesh(4)
    run = build_coupled_shardmap_runner(
        pre_cfg, main_cfg, mesh, target_mean_velocity=1e-3,
    )
    out = run(shard_preinlet_state(st0, mesh), 6)
    jax.block_until_ready(out)

    np.testing.assert_allclose(np.asarray(out.pre.f), np.asarray(ref.pre.f),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.main.f),
                               np.asarray(ref.main.f), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.body_force),
                               np.asarray(ref.body_force), rtol=1e-6)
    for co, cr in zip(out.main.cells, ref.main.cells):
        np.testing.assert_allclose(np.asarray(co.pos), np.asarray(cr.pos),
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(co.alive),
                                      np.asarray(cr.alive))

    # force a crossing and check the injection lands identically
    pc = ref.pre.cells[0]
    bump = jnp.asarray([10.0, 0, 0], dtype)
    ref2 = stepper(ref._replace(pre=ref.pre._replace(
        cells=(pc._replace(pos=pc.pos + bump),))))
    po = out.pre.cells[0]
    out2 = run(out._replace(pre=out.pre._replace(
        cells=(po._replace(pos=po.pos + bump),))), 1)
    assert int(np.asarray(ref2.main.cells[0].alive).sum()) == 1
    assert int(np.asarray(out2.main.cells[0].alive).sum()) == 1
    np.testing.assert_allclose(np.asarray(out2.main.cells[0].pos),
                               np.asarray(ref2.main.cells[0].pos),
                               rtol=0, atol=1e-5)


def test_distributed_pulsatile_matches():
    """Pulsatile drive (AR2_pulsatile machinery: normalized waveform
    scaling the adaptive body force, helper/preInlet.cpp:802-911) through
    the DISTRIBUTED coupled runner matches the single-device stepper —
    the code path cases/preinlet_vessel.py --distribute uses."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 (virtual) devices")

    from hemocell_tpu.parallel.sharding import make_mesh
    from hemocell_tpu.utils.preinlet import (
        build_coupled_shardmap_runner,
        shard_preinlet_state,
    )

    shape = (32, 12, 12)
    dtype = jnp.float32
    mesh_t, tc = _type(dtype)
    walls = np.zeros(shape, np.uint8)
    walls[:, 0, :] = FLAG_WALL
    walls[:, -1, :] = FLAG_WALL
    pre_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(walls), omega=1.0, types=[tc],
        body_force=jnp.asarray([1e-5, 0, 0], dtype), dtype=dtype,
        use_pallas=False,
    )
    mflags = walls.copy()
    mflags[0, 1:-1, :] = FLAG_VELOCITY
    main_cfg = StepConfig(
        shape=shape, flags=jnp.asarray(mflags), omega=1.0, types=[tc],
        dtype=dtype, use_pallas=False,
    )
    pre_cells = make_cell_state(
        (mesh_t.vertices + np.array([16.0, 6.0, 6.0]))[None], dtype=dtype
    )
    pre_state = initial_sim_state(pre_cfg, [pre_cells])
    far = np.repeat(
        mesh_t.vertices[None] + np.array([-100.0, 6.0, 6.0]), 2, axis=0
    )
    main_cells = make_cell_state(far, dtype=dtype)
    main_cells = main_cells._replace(alive=jnp.zeros(2, bool))
    main_state = initial_sim_state(main_cfg, [main_cells])
    main_state = main_state._replace(bc_state=jnp.zeros((3,) + shape, dtype))
    st0 = PreInletState(
        pre=pre_state, main=main_state,
        body_force=jnp.asarray(1e-5, dtype),
        crossings=initial_crossings(pre_state, shape[0]),
    )
    pulse = jnp.asarray([0.6, 1.4, 1.0, 0.8, 1.2], jnp.float32)

    stepper = make_coupled_stepper(
        pre_cfg, main_cfg, target_mean_velocity=1e-3,
        pulse_profile=pulse, pulse_period_steps=5,
    )
    ref = st0
    for _ in range(7):
        ref = stepper(ref)
    jax.block_until_ready(ref)

    mesh = make_mesh(4)
    run = build_coupled_shardmap_runner(
        pre_cfg, main_cfg, mesh, target_mean_velocity=1e-3,
        pulse_profile=pulse, pulse_period_steps=5,
    )
    out = run(shard_preinlet_state(st0, mesh), 7)
    jax.block_until_ready(out)
    np.testing.assert_allclose(np.asarray(out.main.f),
                               np.asarray(ref.main.f), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.body_force),
                               np.asarray(ref.body_force), rtol=1e-6)
