"""Constitutive model unit tests: equilibrium nullity, invariances,
restoring-force directions — kernel-level oracles the reference lacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu.mechanics import (
    material_dict,
    MaterialConstants,
    cell_volume,
    plt_simple_forces,
    rbc_ho_forces,
    topology_device_arrays,
)
from hemocell_tpu.mesh import build_topology, ellipsoid_from_sphere, rbc_from_sphere

jax.config.update("jax_enable_x64", True)

MC = material_dict(
    MaterialConstants(k_volume=2.0, k_area=1.5, k_link=1.2, k_bend=0.8, eta_m=0.5)
)


@pytest.fixture(scope="module")
def rbc():
    mesh = rbc_from_sphere(7.82, 600)
    topo = build_topology(mesh)
    t = topology_device_arrays(topo, dtype=jnp.float64)
    pos = jnp.asarray(mesh.vertices)
    return mesh, topo, t, pos


@pytest.fixture(scope="module")
def plt():
    mesh = ellipsoid_from_sphere(2.5, 0.435, 66)
    inner = np.array([[0, 4], [6, 10]])
    topo = build_topology(mesh, inner_edges=inner)
    t = topology_device_arrays(topo, dtype=jnp.float64)
    pos = jnp.asarray(mesh.vertices)
    return mesh, topo, t, pos


def test_rbc_equilibrium_zero_force(rbc):
    _, _, t, pos = rbc
    vel = jnp.zeros_like(pos)
    ft = rbc_ho_forces(pos, vel, t, MC)
    scale = MC["k_link"]  # typical force unit
    assert float(jnp.abs(ft.total).max()) < 1e-9 * max(scale, 1.0)


def test_plt_equilibrium_zero_force(plt):
    _, _, t, pos = plt
    vel = jnp.zeros_like(pos)
    ft = plt_simple_forces(pos, vel, t, MC)
    assert float(jnp.abs(ft.total).max()) < 1e-9


def test_translation_invariance(rbc):
    _, _, t, pos = rbc
    vel = jnp.zeros_like(pos)
    p2 = pos * 1.02 + jnp.asarray([3.0, -2.0, 1.0])
    f1 = rbc_ho_forces(pos * 1.02, vel, t, MC).total
    f2 = rbc_ho_forces(p2, vel, t, MC).total
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-10)


def test_rotation_equivariance(rbc):
    _, _, t, pos = rbc
    vel = jnp.zeros_like(pos)
    th = 0.3
    R = jnp.asarray(
        [
            [np.cos(th), -np.sin(th), 0.0],
            [np.sin(th), np.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    p = pos * 1.03  # slightly inflated so forces are nonzero
    f = rbc_ho_forces(p, vel, t, MC).total
    f_rot = rbc_ho_forces(p @ R.T, vel, t, MC).total
    np.testing.assert_allclose(np.asarray(f @ R.T), np.asarray(f_rot), atol=1e-9)


def test_volume_restoring(rbc):
    _, topo, t, pos = rbc
    vel = jnp.zeros_like(pos)
    inflated = pos * 1.01
    ft = rbc_ho_forces(inflated, vel, t, MC)
    # volume force should push volume back down: dV/dt ~ sum f . dV/dx < 0
    eps = 1e-6
    v0 = float(cell_volume(inflated, t["tri"]))
    v1 = float(cell_volume(inflated + eps * ft.volume, t["tri"]))
    assert v1 < v0
    # inflation also stretches edges: link force should shrink mean edge len
    e = t["edges"]
    def mean_edge(p):
        return float(jnp.linalg.norm(p[e[:, 1]] - p[e[:, 0]], axis=1).mean())
    assert mean_edge(inflated + eps * ft.link) < mean_edge(inflated)


def test_momentum_conservation(rbc):
    _, _, t, pos = rbc
    vel = jnp.zeros_like(pos)
    key = jax.random.PRNGKey(0)
    noisy = pos * (1.0 + 0.01) + 0.05 * jax.random.normal(key, pos.shape)
    ft = rbc_ho_forces(noisy, vel, t, MC)
    # link/area/bending sum to zero exactly; volume approximately
    for name in ["area", "link", "bending", "visc"]:
        s = np.asarray(getattr(ft, name).sum(axis=0))
        np.testing.assert_allclose(s, 0.0, atol=1e-9)
    mag = float(jnp.abs(ft.total).sum())
    s_tot = np.abs(np.asarray(ft.total.sum(axis=0))).max()
    assert s_tot < 1e-3 * mag


def test_membrane_viscosity_damps(rbc):
    _, _, t, pos = rbc
    key = jax.random.PRNGKey(1)
    vel = 0.01 * jax.random.normal(key, pos.shape)
    ft = rbc_ho_forces(pos, vel, t, MC)
    # viscous force should reduce relative edge velocities: P = sum f.v < 0
    power = float(jnp.sum(ft.visc * vel))
    assert power < 0.0


def test_plt_dihedral_bending_restores(plt):
    _, topo, t, pos = plt
    vel = jnp.zeros_like(pos)
    # push one vertex outward along its normal -> bending force opposes
    v = 7
    normal = pos[v] / jnp.linalg.norm(pos[v])
    pert = pos.at[v].add(0.15 * normal)
    ft = plt_simple_forces(pert, vel, t, MC)
    assert float(jnp.dot(ft.bending[v], normal)) < 0.0


def test_inner_links(plt):
    _, topo, t, pos = plt
    vel = jnp.zeros_like(pos)
    # squeeze the cell along y: inner links resist
    squeezed = pos.at[:, 1].multiply(0.8)
    ft = plt_simple_forces(squeezed, vel, t, MC)
    assert float(jnp.abs(ft.inner_link).max()) > 0.0


def test_vmap_over_cells(rbc):
    _, _, t, pos = rbc
    nc = 4
    offsets = jnp.arange(nc, dtype=pos.dtype)[:, None, None] * 10.0
    batch = pos[None] * 1.02 + offsets
    vels = jnp.zeros_like(batch)
    f_batch = jax.vmap(lambda p, v: rbc_ho_forces(p, v, t, MC).total)(batch, vels)
    f_single = rbc_ho_forces(batch[2], vels[2], t, MC).total
    np.testing.assert_allclose(np.asarray(f_batch[2]), np.asarray(f_single), atol=1e-12)
