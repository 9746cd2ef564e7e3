"""Pallas MXU repulsion vs the jnp candidate-gather reference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu.cells.pallas_repulsion import pallas_repulsion
from hemocell_tpu.cells.repulsion import repulsion_forces
from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.presets import rbc_suspension


def test_matches_reference_interior():
    key = jax.random.PRNGKey(0)
    shape = (16, 8, 8)
    P = 600
    pos = jnp.stack(
        [
            jax.random.uniform(key, (P,), jnp.float64) * 16,
            1.5 + jax.random.uniform(jax.random.fold_in(key, 1), (P,),
                                     jnp.float64) * 5,
            1.5 + jax.random.uniform(jax.random.fold_in(key, 2), (P,),
                                     jnp.float64) * 5,
        ],
        axis=1,
    )
    gid = jax.random.randint(key, (P,), 0, 40)
    act = jnp.ones(P, jnp.float64)
    ref = repulsion_forces(pos, gid, act, shape, 1e-3, 0.7, bin_capacity=64)
    out, ovf = pallas_repulsion(
        pos, gid, act, shape, 1e-3, 0.7, capacity=512, chunk=128
    )
    assert int(ovf) == 0
    interior = (pos[:, 0] > 1.0) & (pos[:, 0] < 15.0)
    np.testing.assert_allclose(
        np.asarray(out[interior]), np.asarray(ref[interior]), atol=1e-12
    )
    assert int((jnp.abs(ref).sum(axis=1) > 0).sum()) > 100  # pairs formed


def test_dead_cells_no_pairs():
    pos = jnp.asarray([[3.0, 3.0, 3.0], [3.2, 3.0, 3.0]], jnp.float64)
    gid = jnp.asarray([0, 1])
    act = jnp.asarray([1.0, 0.0])
    out, _ = pallas_repulsion(pos, gid, act, (8, 8, 8), 1.0, 0.7,
                              capacity=512, chunk=128)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-15)


def test_step_with_repulsion_modes_agree():
    cfg, state, _ = rbc_suspension(shape=(32, 16, 16), n_cells=4,
                                   repulsion=True)
    ref = build_runner(dataclasses.replace(cfg, spread_mode="scatter"))(
        state, 3
    )
    out = build_runner(dataclasses.replace(cfg, spread_mode="pallas"))(
        state, 3
    )
    np.testing.assert_allclose(
        np.asarray(out.cells[0].pos), np.asarray(ref.cells[0].pos), atol=1e-6
    )
