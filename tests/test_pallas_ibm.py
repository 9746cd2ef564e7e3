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


def test_wall_hit_cells_matches_on_boundary():
    """pallas_wall_hit_cells (nearest-node wall sampling + in-kernel
    per-cell reduction) must reproduce coupling.on_boundary's per-cell
    ANY exactly — it replaces the [P] flags gather in the deletion phase
    (reference criterion: core/hemoCellParticleField.cpp:566-588)."""
    from hemocell_tpu.ibm.pallas_ibm import (
        SUBDIV,
        build_ibm_plan,
        pallas_wall_hit_cells,
        slab_capacity,
    )

    key = jax.random.PRNGKey(7)
    shape = (16, 16, 128)
    nc, nv = 37, 40
    P0 = nc * nv
    pos = jax.random.uniform(key, (P0, 3), jnp.float32) * 18.0 - 1.0
    # walls: a y-ring plus scattered random wall nodes
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = 1
    flags[:, -1, :] = 1
    rng = np.random.default_rng(3)
    flags[
        rng.integers(0, shape[0], 200),
        rng.integers(0, shape[1], 200),
        rng.integers(0, shape[2], 200),
    ] = 1
    flags = jnp.asarray(flags)

    P_pad = -(-P0 // 512) * 512
    pad = P_pad - P0
    fshape = jnp.asarray(shape, jnp.float32)
    pos_pad = jnp.pad(pos, ((0, pad), (0, 0)), constant_values=0.5)
    pos_w = jnp.mod(pos_pad, fshape[None, :])
    cid = jnp.pad(
        jnp.repeat(jnp.arange(nc, dtype=jnp.int32), nv),
        (0, pad), constant_values=-1,
    ).astype(jnp.float32)
    cap = slab_capacity(P_pad, shape[0])
    plan = build_ibm_plan(pos_w, shape, cap, subdiv=SUBDIV,
                          aux=cid, payload=jnp.zeros((P_pad, 3), jnp.float32))
    counts = pallas_wall_hit_cells(
        plan, (flags != 0).astype(jnp.float32), shape, cap, n_cells=nc,
        interpret=True,
    )

    hit_ref = coupling.on_boundary(pos_w[:P0], flags).reshape(nc, nv)
    np.testing.assert_array_equal(
        np.asarray(counts > 0.5), np.asarray(jnp.any(hit_ref, axis=1))
    )
    # counts are exact integers: total hits per cell
    np.testing.assert_allclose(
        np.asarray(counts), np.asarray(jnp.sum(hit_ref, axis=1)), atol=0
    )


def test_wall_hit_cells_drifted_plan():
    """Drifted shadow positions (pos_cm advanced in place, incl. across the
    periodic x faces into the virtual slabs) keep the hit test exact."""
    from hemocell_tpu.ibm.pallas_ibm import (
        SUBDIV,
        build_ibm_plan,
        pallas_wall_hit_cells,
        slab_capacity,
    )

    key = jax.random.PRNGKey(11)
    shape = (8, 8, 128)
    nc, nv = 11, 50
    P0 = nc * nv
    pos = jax.random.uniform(key, (P0, 3), jnp.float32) * 7.9
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = 1
    rng = np.random.default_rng(5)
    flags[
        rng.integers(0, 8, 60), rng.integers(0, 8, 60),
        rng.integers(0, 128, 60),
    ] = 1
    flags = jnp.asarray(flags)

    P_pad = -(-P0 // 512) * 512
    pad = P_pad - P0
    fshape = jnp.asarray(shape, jnp.float32)
    pos_w = jnp.mod(jnp.pad(pos, ((0, pad), (0, 0)), constant_values=0.5),
                    fshape[None, :])
    cid = jnp.pad(
        jnp.repeat(jnp.arange(nc, dtype=jnp.int32), nv),
        (0, pad), constant_values=-1,
    ).astype(jnp.float32)
    cap = slab_capacity(P_pad, shape[0])
    plan = build_ibm_plan(pos_w, shape, cap, subdiv=SUBDIV, aux=cid,
                          payload=jnp.zeros((P_pad, 3), jnp.float32))
    # drift: within the shadow bound (EXTRA-1)/SUBDIV = 0.125 lu
    drift = (jax.random.uniform(key, (3, P_pad + cap), jnp.float32) - 0.5) \
        * 0.2
    plan2 = plan._replace(pos_cm=plan.pos_cm.at[:3].add(drift))
    counts = pallas_wall_hit_cells(
        plan2, (flags != 0).astype(jnp.float32), shape, cap, n_cells=nc,
        interpret=True,
    )
    # reference on the same drifted positions, recovered via the order
    pos_drifted_sorted = plan2.pos_cm[:3, : P_pad].T  # [P,3] sorted order
    cid_sorted = plan2.pos_cm[3, :P_pad]
    hit_s = coupling.on_boundary(
        jnp.mod(pos_drifted_sorted, fshape[None, :]), flags
    )
    ref = np.zeros(nc)
    cs = np.asarray(cid_sorted).astype(int)
    hs = np.asarray(hit_s)
    for i in range(P_pad):
        if cs[i] >= 0:
            ref[cs[i]] += hs[i]
    np.testing.assert_allclose(np.asarray(counts), ref, atol=0)


def test_adaptive_capacity():
    """Occupancy-measured window capacity: tight for uniform clouds,
    >= the densest window, never above the blind safety=4 pick, and
    physics-neutral (capacity only sizes windows; the spread result is
    identical as long as no window overflows)."""
    from hemocell_tpu.ibm.pallas_ibm import (
        adaptive_capacity,
        build_ibm_plan,
        pallas_spread,
        slab_capacity,
    )

    rng = np.random.default_rng(0)
    X, Y, Z = 32, 8, 8
    P = 8192
    pos = rng.uniform(0, 1, (P, 3)).astype(np.float32) * np.array(
        [X, Y, Z], np.float32
    )
    cap = adaptive_capacity(pos, X)
    full = slab_capacity(P, X)
    assert 1024 <= cap <= full
    # uniform cloud: mean window occupancy ~ P/X * 1.5 -> tighter than 4x
    assert cap < full
    # dense cluster in one slab: capacity must cover it (up to the
    # safety=4 ceiling)
    pos_dense = pos.copy()
    pos_dense[: P // 2, 0] = 5.25
    cap_d = adaptive_capacity(pos_dense, X)
    assert cap_d >= min(int(P // 2 * 1.5), full - 512)

    # spread result identical at tight vs blind capacity (f32 sums in a
    # different chunk grouping -> allclose)
    F = rng.normal(0, 1e-3, (P, 3)).astype(np.float32)
    a, ova = pallas_spread(jnp.asarray(pos), jnp.asarray(F), (X, Y, Z),
                           capacity=cap)
    b, ovb = pallas_spread(jnp.asarray(pos), jnp.asarray(F), (X, Y, Z),
                           capacity=full)
    assert int(ova) == 0 and int(ovb) == 0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=1e-9)
