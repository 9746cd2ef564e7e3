"""Mesh generation and topology tests.

Oracles from the reference: RBC template at minNumTriangles=600 has 1280
triangles / 642 vertices; physical volume ~81-90 um^3 for radius 3.91 um
(tools/cell_templates/RBC_template.xml); every vertex has 5 or 6 neighbours;
Euler characteristic V - E + F = 2.
"""

import math

import numpy as np
import pytest

from hemocell_tpu.mesh import (
    MeshMetrics,
    build_topology,
    ellipsoid_from_sphere,
    icosphere,
    rbc_from_sphere,
    signed_volume,
)


def test_icosphere_counts():
    m = icosphere(600)
    assert m.num_triangles == 1280
    assert m.num_vertices == 642
    m2 = icosphere(20)
    assert m2.num_triangles == 20
    assert m2.num_vertices == 12


def test_icosphere_is_unit_sphere_outward():
    m = icosphere(600)
    r = np.linalg.norm(m.vertices, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-12)
    # outward winding: signed volume > 0 and close to sphere volume
    v = signed_volume(m.vertices, m.triangles)
    assert v > 0
    assert abs(v - 4 / 3 * math.pi) / (4 / 3 * math.pi) < 0.01


def test_euler_characteristic():
    m = icosphere(600)
    topo = build_topology(m)
    V, E, F = m.num_vertices, topo.edges.shape[0], m.num_triangles
    assert V - E + F == 2
    assert E == 1920


def test_rbc_volume_physical():
    # radius 3.91 um at dx = 0.5 um -> 7.82 lu
    dx = 0.5e-6
    radius_lu = 3.91e-6 / dx
    m = rbc_from_sphere(radius_lu, 600)
    met = MeshMetrics(m)
    vol_um3 = met.volume * (dx * 1e6) ** 3
    assert 78.0 < vol_um3 < 90.0
    # disc axis along y: y-extent is the ~2-2.5 um thickness
    ext = m.vertices.max(axis=0) - m.vertices.min(axis=0)
    ext_um = ext * dx * 1e6
    assert 7.5 < ext_um[0] < 8.1  # diameter in x
    assert 7.5 < ext_um[2] < 8.1  # diameter in z
    assert 1.5 < ext_um[1] < 3.0  # thickness in y


def test_rbc_biconcave_dimple():
    m = rbc_from_sphere(7.82, 600)
    # thickness at centre (r<1 lu from axis) should be less than max thickness
    r_axis = np.sqrt(m.vertices[:, 0] ** 2 + m.vertices[:, 2] ** 2)
    near_axis = np.abs(m.vertices[r_axis < 1.5, 1])
    far = np.abs(m.vertices[(r_axis > 4) & (r_axis < 6), 1])
    assert near_axis.max() < far.max()


def test_ellipsoid_platelet():
    # octahedron-refined sphere (Palabos constructSphere): minNumTriangles=66
    # -> 128 triangles / 66 vertices, the counts the reference PLT material
    # XML assumes
    m = ellipsoid_from_sphere(2.5, 0.434782608696, 66)
    assert m.num_triangles == 128
    assert m.num_vertices == 66
    ext = m.vertices.max(axis=0) - m.vertices.min(axis=0)
    np.testing.assert_allclose(ext[0], 5.0, rtol=0.02)
    np.testing.assert_allclose(ext[2], 5.0, rtol=0.02)
    np.testing.assert_allclose(ext[1], 5.0 * 0.434782608696, rtol=0.05)
    assert signed_volume(m.vertices, m.triangles) > 0


def test_topology_ring_structure():
    m = icosphere(600)
    topo = build_topology(m)
    assert set(np.unique(topo.ring_n)) == {5, 6}
    # exactly 12 pentagonal vertices on a subdivided icosahedron
    assert int((topo.ring_n == 5).sum()) == 12
    # ring entries are actual mesh neighbours
    edge_set = {(int(a), int(b)) for a, b in topo.edges}
    edge_set |= {(b, a) for a, b in edge_set}
    for v in [0, 5, 100, 641]:
        n = int(topo.ring_n[v])
        for k in range(n):
            assert (v, int(topo.ring[v, k])) in edge_set
        # ring is cyclic: consecutive members are themselves neighbours
        for k in range(n):
            a, b = int(topo.ring[v, k]), int(topo.ring[v, (k + 1) % n])
            assert (a, b) in edge_set


def test_topology_eq_geometry():
    m = rbc_from_sphere(7.82, 600)
    topo = build_topology(m)
    assert topo.volume_eq > 0
    met = MeshMetrics(m)
    np.testing.assert_allclose(topo.volume_eq, met.volume, rtol=1e-12)
    np.testing.assert_allclose(topo.tri_area_eq.sum(), met.area, rtol=1e-12)
    # eq dihedral angles are small and signed consistently for a convex-ish
    # surface discretisation
    assert np.abs(topo.edge_angle_eq).max() < 1.0
    # patch distances: curvature offsets, small relative to edge length
    assert np.abs(topo.patch_dist_eq).max() < topo.edge_mean_eq


def test_bending_pairs():
    m = icosphere(80)
    topo = build_topology(m)
    for e, (i, j) in enumerate(topo.edges):
        t0, t1 = topo.bend_tri[e]
        tri0 = set(topo.triangles[t0])
        tri1 = set(topo.triangles[t1])
        assert {int(i), int(j)} <= tri0
        assert {int(i), int(j)} <= tri1
        assert int(topo.bend_outer[e, 0]) in tri0 - {int(i), int(j)}
        assert int(topo.bend_outer[e, 1]) in tri1 - {int(i), int(j)}
