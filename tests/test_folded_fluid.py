"""Lane-folded fluid layout (fluid/pallas_lbm.fold_field, StepConfig.fold).

The folded kernel packs k x-planes into the 128-lane tile; these tests pin
it against the canonical kernel (interpret mode) and run the full coupled
step with fold forced on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.config.defaults import (
    FLAG_PRESSURE,
    FLAG_VELOCITY,
    FLAG_WALL,
)
from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.pallas_lbm import (
    fold_field,
    stream_collide_pallas,
    unfold_field,
)


def test_fold_roundtrip():
    a = jnp.arange(19 * 8 * 4 * 6, dtype=jnp.float32).reshape(19, 8, 4, 6)
    for k in (1, 2, 4):
        np.testing.assert_array_equal(
            np.asarray(unfold_field(fold_field(a, k), k)), np.asarray(a)
        )
    # lane layout: (x = xh*k + h) -> lane h*Z + z
    f2 = fold_field(a, 2)
    np.testing.assert_array_equal(
        np.asarray(f2[:, 0, :, 6:]), np.asarray(a[:, 1])
    )


def test_folded_kernel_matches_canonical():
    for shape, k in [((8, 8, 64), 2), ((16, 8, 32), 4)]:
        key = jax.random.PRNGKey(1)
        rho = 1.0 + 0.02 * jax.random.normal(key, shape, jnp.float32)
        u = 0.02 * jax.random.normal(key, (3,) + shape, jnp.float32)
        f = lbm.equilibrium_dev(rho, u).astype(jnp.float32)
        f = f * (1 + 0.01 * jax.random.normal(key, f.shape, jnp.float32))
        force = 1e-5 * jax.random.normal(key, (3,) + shape, jnp.float32)
        flags = np.zeros(shape, np.uint8)
        flags[:, 0, :] = FLAG_WALL
        flags[:, :, 0] = FLAG_VELOCITY
        flags[-1] = FLAG_PRESSURE
        flags = jnp.asarray(flags)
        bc = 0.01 * jax.random.normal(key, (3,) + shape).astype(jnp.float32)
        ref = f
        got = fold_field(f, k)
        for _ in range(3):
            ref = stream_collide_pallas(
                ref, force, 1.0, flags, bc, tx=2, interpret=True,
                bc_density=1.0,
            )
            got = stream_collide_pallas(
                got, fold_field(force, k), 1.0, fold_field(flags, k),
                fold_field(bc, k), tx=2, interpret=True, bc_density=1.0,
                fold=k,
            )
        np.testing.assert_allclose(
            np.asarray(unfold_field(got, k)), np.asarray(ref), atol=1e-6
        )


def test_folded_coupled_step_matches():
    from hemocell_tpu.dynamics import build_step
    from hemocell_tpu.presets import rbc_suspension

    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 32), n_cells=2, body_force=(1e-6, 0.0, 0.0),
        repulsion=False, spread_mode="pallas",
    )
    cfg1 = dataclasses.replace(cfg, use_pallas=True)
    cfgk = dataclasses.replace(cfg, use_pallas=True, fold=4)
    s1 = state
    sk = state._replace(f=fold_field(state.f, 4))
    step1, stepk = build_step(cfg1), build_step(cfgk)
    for _ in range(3):
        s1 = step1(s1)
        sk = stepk(sk)
    np.testing.assert_allclose(
        np.asarray(unfold_field(sk.f, 4)), np.asarray(s1.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sk.cells[0].vel), np.asarray(s1.cells[0].vel),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sk.cells[0].pos), np.asarray(s1.cells[0].pos),
        atol=1e-5,
    )


def test_lazy_uniform_force_fluid_only_matches_jnp():
    """No-cells + uniform body force: the pallas step takes the SMEM
    uniform-force / no-flags fast path; the jnp step materialises a field.
    Trajectories must match."""
    from hemocell_tpu.dynamics import build_step
    from hemocell_tpu.presets import rbc_suspension

    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 32), n_cells=0, body_force=(1e-6, 2e-7, 0.0),
        repulsion=False,
    )
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    cfg_j = dataclasses.replace(cfg, use_pallas=False)
    sp, sj = state, state
    step_p, step_j = build_step(cfg_p), build_step(cfg_j)
    for _ in range(3):
        sp = step_p(sp)
        sj = step_j(sj)
    np.testing.assert_allclose(
        np.asarray(sp.f), np.asarray(sj.f), atol=1e-6
    )
    # folded variant of the same fast path
    cfg_k = dataclasses.replace(cfg, use_pallas=True, fold=2)
    sk = state._replace(f=fold_field(state.f, 2))
    step_k = build_step(cfg_k)
    for _ in range(3):
        sk = step_k(sk)
    np.testing.assert_allclose(
        np.asarray(unfold_field(sk.f, 2)), np.asarray(sj.f), atol=1e-6
    )
