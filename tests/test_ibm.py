"""IBM kernel tests: partition of unity, exact interpolation of linear
fields, spread/interpolate adjointness, force conservation, boundary-aware
renormalisation."""

import jax
import jax.numpy as jnp
import numpy as np

from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.ibm import cap_force, interpolate, on_boundary, spread, stencil

jax.config.update("jax_enable_x64", True)

SHAPE = (12, 10, 8)


def _flags(walls=False):
    f = np.zeros(SHAPE, np.uint8)
    if walls:
        f[:, 0, :] = FLAG_WALL
    return jnp.asarray(f)


def test_partition_of_unity():
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (50, 3), jnp.float64) * jnp.asarray(SHAPE)
    idx, w = stencil(pos, _flags())
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, atol=1e-12)


def test_linear_field_exact():
    # trilinear interpolation reproduces affine fields exactly
    x = np.arange(SHAPE[0])[:, None, None]
    y = np.arange(SHAPE[1])[None, :, None]
    z = np.arange(SHAPE[2])[None, None, :]
    field = np.stack(
        [
            1.0 + 0.5 * x + 0 * y + 0 * z,
            2.0 + 0 * x - 0.25 * y + 0 * z,
            0 * x + 0 * y + 0.125 * z,
        ]
    ).astype(np.float64)
    field = jnp.asarray(np.broadcast_to(field, (3,) + SHAPE).copy())
    # keep positions inside so periodic wrap never kicks in
    key = jax.random.PRNGKey(1)
    pos = 1.0 + jax.random.uniform(key, (40, 3), jnp.float64) * (
        jnp.asarray(SHAPE, jnp.float64) - 3.0
    )
    idx, w = stencil(pos, _flags())
    v = interpolate(field, idx, w)
    expect = np.stack(
        [
            1.0 + 0.5 * np.asarray(pos[:, 0]),
            2.0 - 0.25 * np.asarray(pos[:, 1]),
            0.125 * np.asarray(pos[:, 2]),
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(v), expect, atol=1e-12)


def test_spread_conserves_force():
    key = jax.random.PRNGKey(2)
    pos = jax.random.uniform(key, (30, 3), jnp.float64) * jnp.asarray(SHAPE)
    forces = jax.random.normal(key, (30, 3), jnp.float64)
    idx, w = stencil(pos, _flags())
    field = spread(forces, idx, w, SHAPE)
    np.testing.assert_allclose(
        np.asarray(field.sum(axis=(1, 2, 3))), np.asarray(forces.sum(axis=0)),
        atol=1e-12,
    )


def test_boundary_renormalisation():
    flags = _flags(walls=True)
    # vertex right next to the wall plane y=0: stencil touches wall nodes
    pos = jnp.asarray([[5.2, 0.7, 4.3]], dtype=jnp.float64)
    idx, w = stencil(pos, flags)
    np.testing.assert_allclose(float(w.sum()), 1.0, atol=1e-12)
    # no weight on wall nodes
    node_flags = np.asarray(flags)[
        np.asarray(idx[..., 0]), np.asarray(idx[..., 1]), np.asarray(idx[..., 2])
    ]
    assert (np.asarray(w)[node_flags == FLAG_WALL] == 0).all()


def test_spread_interpolate_adjoint():
    """<spread(F), U> == <F, interpolate(U)> for matching weights."""
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (25, 3), jnp.float64) * jnp.asarray(SHAPE)
    F = jax.random.normal(k2, (25, 3), jnp.float64)
    U = jax.random.normal(k3, (3,) + SHAPE, jnp.float64)
    idx, w = stencil(pos, _flags())
    lhs = float(jnp.sum(spread(F, idx, w, SHAPE) * U))
    rhs = float(jnp.sum(F * interpolate(U, idx, w)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_cap_force():
    f = jnp.asarray([[3.0, 4.0, 0.0], [0.1, 0.0, 0.0]], dtype=jnp.float64)
    capped = cap_force(f, 1.0)
    np.testing.assert_allclose(float(jnp.linalg.norm(capped[0])), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(capped[1]), [0.1, 0, 0], atol=1e-15)


def test_on_boundary():
    flags = _flags(walls=True)
    pos = jnp.asarray(
        [[5.0, 0.2, 4.0], [5.0, 5.0, 4.0]], dtype=jnp.float64
    )
    hit = on_boundary(pos, flags)
    assert bool(hit[0]) and not bool(hit[1])


def test_dead_cell_mask():
    pos = jnp.asarray([[2.5, 2.5, 2.5], [3.5, 3.5, 3.5]], dtype=jnp.float64)
    mask = jnp.asarray([1.0, 0.0])
    idx, w = stencil(pos, _flags(), weight_mask=mask)
    assert float(w[1].sum()) == 0.0
    F = jnp.ones((2, 3), jnp.float64)
    field = spread(F, idx, w, SHAPE)
    np.testing.assert_allclose(np.asarray(field.sum(axis=(1, 2, 3))), 1.0)
