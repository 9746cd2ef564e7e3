"""Pallas IBM kernels (interpret mode) vs the jnp gather/scatter reference,
and end-to-end step equivalence across all three spread modes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.ibm import coupling
from hemocell_tpu.ibm.pallas_ibm import pallas_interp, pallas_spread
from hemocell_tpu.presets import rbc_suspension


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    shape = (8, 16, 128)
    P = 1000
    pos = jax.random.uniform(key, (P, 3), jnp.float64) * 20 - 2
    F = jax.random.normal(key, (P, 3), jnp.float64)
    u = jax.random.normal(key, (3,) + shape, jnp.float64)
    flags = jnp.zeros(shape, jnp.uint8)
    pw = jnp.mod(pos, jnp.asarray(shape, jnp.float64))
    idx, w = coupling.stencil(pw, flags)
    return shape, pos, F, u, idx, w


def test_spread_matches(setup):
    shape, pos, F, u, idx, w = setup
    ref = coupling.spread(F, idx, w, shape)
    out, ovf = pallas_spread(pos, F, shape, capacity=512)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)
    # conservation
    np.testing.assert_allclose(
        np.asarray(out.sum(axis=(1, 2, 3))), np.asarray(F.sum(axis=0)),
        atol=1e-11,
    )


def test_interp_matches(setup):
    shape, pos, F, u, idx, w = setup
    ref = coupling.interpolate(u, idx, w)
    v, ovf = pallas_interp(pos, u, shape, capacity=512)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref), atol=1e-13)


def test_overflow_reported():
    # all vertices in one slab with a tiny capacity
    pos = jnp.ones((600, 3), jnp.float64) * 2.5
    F = jnp.ones((600, 3), jnp.float64)
    _, ovf = pallas_spread(pos, F, (8, 8, 128), capacity=512)
    assert int(ovf) == 600 - 512


def test_step_modes_agree():
    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 16), n_cells=2, repulsion=False
    )
    ref = build_runner(cfg)(state, 3)
    for mode in ["pallas", "binned"]:
        out = build_runner(dataclasses.replace(cfg, spread_mode=mode))(state, 3)
        np.testing.assert_allclose(
            np.asarray(out.f), np.asarray(ref.f), atol=1e-6,
            err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(out.cells[0].pos), np.asarray(ref.cells[0].pos),
            atol=1e-6, err_msg=mode,
        )


def test_bf16_matmul_option_close_to_f32():
    import jax

    key = jax.random.PRNGKey(5)
    shape = (8, 8, 16)
    P = 512
    pos = (
        jax.random.uniform(key, (P, 3), jnp.float32)
        * jnp.asarray([8.0, 8.0, 16.0], jnp.float32)
    ).astype(jnp.float32)
    F = jax.random.normal(key, (P, 3), jnp.float32)
    from hemocell_tpu.ibm.pallas_ibm import pallas_interp, pallas_spread

    a, _ = pallas_spread(pos, F, shape, capacity=512, interpret=True)
    b, _ = pallas_spread(pos, F, shape, capacity=512, interpret=True,
                         mm="bf16")
    ref = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 0.02 * ref
    u = jax.random.normal(key, (3,) + shape, jnp.float32)
    va, _ = pallas_interp(pos, u, shape, capacity=512, interpret=True)
    vb, _ = pallas_interp(pos, u, shape, capacity=512, interpret=True,
                          mm="bf16")
    assert float(jnp.abs(va - vb).max()) < 0.02 * float(jnp.abs(va).max())
