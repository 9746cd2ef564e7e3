"""Two-step fused fluid kernel (fluid/pallas_lbm_2x.py).

Oracle: equality with two sequential one-pass kernel steps — the 2x
kernel evaluates the exact same _collide_local math on the same operands.
On TPU hardware the match is bitwise (verified on-chip); under the CPU
interpret path with x64 enabled the emulation introduces ~1-ulp noise, so
off-chip the assertion is allclose at f32-ulp tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL
from hemocell_tpu.fluid.pallas_lbm import stream_collide_pallas
from hemocell_tpu.fluid.pallas_lbm_2x import stream_collide_pallas_2x


def _assert_match(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if jax.default_backend() == "tpu":
        assert (a == b).all()
    else:
        np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-8)


def _rand_f(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1e-3, (19,) + shape).astype(np.float32))


@pytest.mark.parametrize("tx", [2, 4, 8])
def test_2x_bitwise_periodic(tx):
    f = _rand_f((16, 8, 8))
    force = jnp.asarray(np.float32([1e-5, 2e-6, 0.0]))
    a = stream_collide_pallas(f, force, 1.1, None)
    a = stream_collide_pallas(a, force, 1.1, None)
    b = stream_collide_pallas_2x(f, force, 1.1, None, tx=tx)
    _assert_match(a, b)


def test_2x_bitwise_walled():
    X, Y, Z = 16, 8, 8
    f = _rand_f((X, Y, Z), seed=1)
    flags = np.full((X, Y, Z), FLAG_FLUID, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags = jnp.asarray(flags)
    force = jnp.asarray(np.float32([1e-5, 0, 0]))
    a = stream_collide_pallas(f, force, 1.0, flags)
    a = stream_collide_pallas(a, force, 1.0, flags)
    b = stream_collide_pallas_2x(f, force, 1.0, flags, tx=4)
    _assert_match(a, b)


def test_2x_bitwise_unforced():
    f = _rand_f((8, 8, 8), seed=2)
    a = stream_collide_pallas(f, None, 1.3, None)
    a = stream_collide_pallas(a, None, 1.3, None)
    b = stream_collide_pallas_2x(f, None, 1.3, None, tx=2)
    _assert_match(a, b)


def _pure_fluid_cfg(walls, fluid_2x):
    from hemocell_tpu.dynamics import StepConfig

    X, Y, Z = 16, 8, 8
    flags = np.zeros((X, Y, Z), np.uint8)
    if walls:
        flags[:, 0, :] = FLAG_WALL
        flags[:, -1, :] = FLAG_WALL
    return StepConfig(
        shape=(X, Y, Z),
        flags=jnp.asarray(flags),
        omega=1.1,
        types=[],
        body_force=jnp.asarray(np.float32([1e-5, 0, 0])),
        fluid_2x=fluid_2x,
        use_pallas=fluid_2x or None,
    )


@pytest.mark.parametrize("walls", [False, True])
@pytest.mark.parametrize("n", [4, 5])
def test_2x_runner_matches_stepwise(walls, n):
    """build_runner dispatches cell-free runs to the 2x kernel; the result
    must match the one-pass Pallas path exactly (odd n covers the
    single-step remainder)."""
    from hemocell_tpu.dynamics import build_runner, initial_sim_state

    cfg_a = _pure_fluid_cfg(walls, fluid_2x=True)
    cfg_b = _pure_fluid_cfg(walls, fluid_2x=False)
    state = initial_sim_state(cfg_a, [])
    # perturb so streaming is visible
    rng = np.random.default_rng(3)
    state = state._replace(
        f=state.f + jnp.asarray(
            rng.normal(0, 1e-4, state.f.shape).astype(np.float32)
        )
    )
    out_a = build_runner(cfg_a)(state, n)
    out_b = build_runner(cfg_b)(state, n)
    _assert_match(out_a.f, out_b.f)
    assert int(out_a.it) == int(out_b.it) == n


def test_2x_dynamic_body_force_override():
    """The adaptive preInlet drive (state.body_force_state) must feed the
    2x path too."""
    from hemocell_tpu.dynamics import build_runner, initial_sim_state

    cfg_a = _pure_fluid_cfg(False, fluid_2x=True)
    cfg_b = _pure_fluid_cfg(False, fluid_2x=False)
    state = initial_sim_state(cfg_a, [])
    bf = jnp.asarray(np.float32([3e-5, 0, 1e-6]))
    state = state._replace(body_force_state=bf)
    out_a = build_runner(cfg_a)(state, 4)
    out_b = build_runner(cfg_b)(state, 4)
    _assert_match(out_a.f, out_b.f)
