"""Repulsion off-step persistence.

The reference recomputes repulsion at the repulsion timescale but KEEPS the
last value on the particle and spreads it every iteration
(core/hemoCell.cpp:307-314; force_repulsion is zeroed only inside the
recompute, core/hemoCellParticleField.cpp:703).  Off-steps must therefore
carry the previous force, not zeros.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.presets import rbc_suspension


def _dense_cfg(repulsion_every, **kw):
    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=4, repulsion=True, spread_mode="scatter",
        **kw,
    )
    cfg = dataclasses.replace(cfg, repulsion_every=repulsion_every)
    return cfg, state


def test_force_repulsion_carried_on_off_steps():
    cfg, state = _dense_cfg(repulsion_every=2)
    run = build_runner(cfg)
    s1 = run(state, 1)  # it=0 -> recompute
    f1 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s1.cells]))
    assert np.abs(f1).max() > 0, "cells must overlap for this test"
    s2 = run(s1, 1)  # it=1 -> off-step: carried, NOT zeros
    f2 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s2.cells]))
    np.testing.assert_array_equal(f2, f1)
    s3 = run(s2, 1)  # it=2 -> recompute again (positions moved)
    f3 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s3.cells]))
    assert np.abs(f3).max() > 0


def test_off_step_spread_contains_repulsion():
    """The fluid must feel the carried repulsion on off-steps: an
    every-step run and an every-2-steps run from the same state diverge
    only at second order (recompute lag), not by a missing force term."""
    cfg1, state = _dense_cfg(repulsion_every=1)
    cfg2 = dataclasses.replace(cfg1, repulsion_every=2)
    # ramp repulsion so its spread contribution dominates
    cfg1 = dataclasses.replace(cfg1, repulsion_constant=cfg1.repulsion_constant)
    s_every = build_runner(cfg1)(state, 2)
    s_skip = build_runner(cfg2)(state, 2)
    u1 = np.asarray(s_every.f).sum()
    # with the old zero-fallback bug the off-step spread loses the whole
    # repulsion component; the two runs' fluid states then differ by the
    # full repulsion magnitude rather than a lag term.  Compare against a
    # run with repulsion disabled entirely to bound the effect.
    cfg0 = dataclasses.replace(cfg1, repulsion_constant=0.0)
    s_none = build_runner(cfg0)(state, 2)
    d_skip = float(np.abs(np.asarray(s_skip.f) - np.asarray(s_every.f)).max())
    d_none = float(np.abs(np.asarray(s_none.f) - np.asarray(s_every.f)).max())
    assert d_none > 0  # repulsion does reach the fluid at all
    # carried-force run must be far closer to every-step than no-repulsion
    assert d_skip < 0.5 * d_none


def test_sharded_step_carries_repulsion():
    import jax

    from hemocell_tpu.parallel.sharded_step import build_shardmap_runner
    from hemocell_tpu.parallel.sharding import make_mesh, shard_state

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 (virtual) devices")
    # shardmap_supported rejects spread_mode='scatter' (that's the facade's
    # overflow fallback, routed to the GSPMD runner) — the shard_map step
    # itself runs the Pallas IBM path
    cfg, state = _dense_cfg(repulsion_every=2)
    cfg = dataclasses.replace(cfg, spread_mode=None)
    mesh = make_mesh(8, axes=("x",))
    run = build_shardmap_runner(cfg, mesh)
    s1 = run(shard_state(state, mesh), 1)
    f1 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s1.cells]))
    assert np.abs(f1).max() > 0
    s2 = run(s1, 1)
    f2 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s2.cells]))
    np.testing.assert_array_equal(f2, f1)


def _boundary_only_cfg(every=1):
    """Boundary repulsion WITHOUT inner repulsion (repulsion_constant=0)."""
    cfg, state, _ = rbc_suspension(
        shape=(32, 16, 16), n_cells=2, repulsion=False, spread_mode="scatter",
    )
    # every node is a "boundary neighbor": guarantees a nonzero force on
    # every particle regardless of placement
    bmask = jnp.ones(cfg.shape, jnp.uint8)
    cfg = dataclasses.replace(
        cfg,
        boundary_repulsion_constant=1e-4,
        boundary_repulsion_cutoff=1.0,
        boundary_repulsion_every=every,
        boundary_mask=bmask,
    )
    return cfg, state


def test_boundary_only_repulsion_does_not_accumulate():
    """With inner repulsion disabled nothing ever zeroes force_repulsion in
    the reference (applyBoundaryRepulsionForce only adds,
    core/hemoCellParticleField.cpp:911), so its force grows ~n per step —
    a physical time bomb.  We deviate: the boundary recompute REPLACES the
    carried value at its timescale, keeping the force bounded."""
    cfg, state = _boundary_only_cfg(every=1)
    run = build_runner(cfg)
    s1 = run(state, 1)
    f1 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s1.cells]))
    m1 = np.abs(f1).max()
    assert m1 > 0
    s5 = run(s1, 4)
    f5 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s5.cells]))
    # accumulation would give ~5*m1 by step 5; replacement stays ~m1
    assert np.abs(f5).max() < 2.0 * m1


def test_boundary_only_repulsion_carried_on_off_steps():
    cfg, state = _boundary_only_cfg(every=2)
    run = build_runner(cfg)
    s1 = run(state, 1)  # it=0 -> recompute
    f1 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s1.cells]))
    assert np.abs(f1).max() > 0
    s2 = run(s1, 1)  # it=1 -> off-step: carried
    f2 = np.asarray(jnp.concatenate(
        [cs.force_repulsion.reshape(-1, 3) for cs in s2.cells]))
    np.testing.assert_array_equal(f2, f1)
