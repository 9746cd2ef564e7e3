"""shard_map fluid step with explicit ppermute halo exchange: matches the
single-device reference bitwise on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.fluid import lbm
from hemocell_tpu.fluid.sharded_pallas import make_sharded_stream_collide
from hemocell_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_shardmap_halo_fluid_matches():
    key = jax.random.PRNGKey(0)
    shape = (32, 8, 128)
    rho = 1.0 + 0.02 * jax.random.normal(key, shape, jnp.float64)
    u = 0.02 * jax.random.normal(key, (3,) + shape, jnp.float64)
    f = lbm.equilibrium_dev(rho, u)
    force = 1e-5 * jax.random.normal(key, (3,) + shape, jnp.float64)
    flags = np.zeros(shape, np.uint8)
    flags[:, 0, :] = FLAG_WALL
    flags = jnp.asarray(flags)

    mesh = make_mesh(8, axes=("x",))
    step = make_sharded_stream_collide(mesh, flags)
    fs = jax.device_put(f, NamedSharding(mesh, P(None, "x", None, None)))
    fos = jax.device_put(force, NamedSharding(mesh, P(None, "x", None, None)))

    out = fs
    ref = f
    for _ in range(5):
        out = step(out, fos, 0.9)
        ref = lbm.stream_collide(ref, force, 0.9, flags)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-14)
