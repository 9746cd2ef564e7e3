"""k-step fused fluid kernel (fluid/pallas_lbm_kx.py).

Oracle: equality with k sequential one-pass kernel steps — the kx
kernel evaluates the exact same _collide_local math on the same
operands (same contract as the 2x kernel, tests/test_fluid_2x.py).
On TPU the match is bitwise; the CPU interpret path carries ~1-ulp
emulation noise, so off-chip the assertion is allclose at f32-ulp.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL
from hemocell_tpu.fluid.pallas_lbm import stream_collide_pallas
from hemocell_tpu.fluid.pallas_lbm_kx import (
    pick_tx_kx,
    stream_collide_pallas_kx,
)


def _assert_match(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if jax.default_backend() == "tpu":
        assert (a == b).all()
    else:
        np.testing.assert_allclose(a, b, rtol=5e-6, atol=1e-8)


def _rand_f(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1e-3, (19,) + shape).astype(np.float32))


@pytest.mark.parametrize("k", [2, 3, 4])
@pytest.mark.parametrize("tx", [2, 4])
def test_kx_bitwise_periodic(k, tx):
    f = _rand_f((16, 8, 8), seed=k)
    force = jnp.asarray(np.float32([1e-5, 2e-6, 0.0]))
    a = f
    for _ in range(k):
        a = stream_collide_pallas(a, force, 1.1, None)
    b = stream_collide_pallas_kx(f, force, 1.1, None, k=k, tx=tx)
    _assert_match(a, b)


@pytest.mark.parametrize("k", [3, 4])
def test_kx_bitwise_walled(k):
    X, Y, Z = 16, 8, 8
    f = _rand_f((X, Y, Z), seed=10 + k)
    flags = np.full((X, Y, Z), FLAG_FLUID, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags = jnp.asarray(flags)
    force = jnp.asarray(np.float32([1e-5, 0, 0]))
    a = f
    for _ in range(k):
        a = stream_collide_pallas(a, force, 1.0, flags)
    b = stream_collide_pallas_kx(f, force, 1.0, flags, k=k, tx=4)
    _assert_match(a, b)


def test_kx_bitwise_unforced():
    f = _rand_f((12, 8, 8), seed=3)
    a = f
    for _ in range(3):
        a = stream_collide_pallas(a, None, 1.3, None)
    b = stream_collide_pallas_kx(f, None, 1.3, None, k=3, tx=2)
    _assert_match(a, b)


def test_kx_vmem_fallback():
    """tx=0 (nothing fits) falls back to 2x + one-pass composition."""
    f = _rand_f((8, 8, 8), seed=4)
    a = f
    for _ in range(3):
        a = stream_collide_pallas(a, None, 1.2, None)
    b = stream_collide_pallas_kx(f, None, 1.2, None, k=3, tx=0)
    _assert_match(a, b)


def test_pick_tx_kx_monotone():
    """Larger k shrinks (never grows) the feasible slab; huge cross
    sections hit the tx=1 escape hatch or 0."""
    t2 = pick_tx_kx(128, 128, 128, 19, 2)
    t4 = pick_tx_kx(128, 128, 128, 19, 4)
    assert t2 >= t4 >= 1
    assert pick_tx_kx(256, 512, 512, 19, 4) in (0, 1)
