"""End-to-end coupled IB-LBM tests: single RBC at rest, optical-tweezers
stretching (smoke + full validation bounds from the reference test suite,
tests/validation/stretch_cell/test_stretch_cell.cpp:159-163)."""

import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hemocell_tpu import HemoCell
from hemocell_tpu.config import Parameters
from hemocell_tpu.config.defaults import FLAG_WALL
from hemocell_tpu.utils.stretch import stretch_force_array

RBC_XML = textwrap.dedent(
    """\
    <?xml version="1.0" ?>
    <hemocell>
    <MaterialModel>
        <name>RBC</name>
        <eta_m> 0.0 </eta_m>
        <kBend> 80.0 </kBend>
        <kVolume> 20.0 </kVolume>
        <kArea> 5.0 </kArea>
        <kLink> 15.0 </kLink>
        <minNumTriangles> 600 </minNumTriangles>
        <radius> 3.91e-6 </radius>
        <Volume> 90 </Volume>
    </MaterialModel>
    </hemocell>
    """
)

CONFIG_XML = textwrap.dedent(
    """\
    <?xml version="1.0" ?>
    <hemocell>
    <ibm>
        <stepMaterialEvery> 1 </stepMaterialEvery>
        <stepParticleEvery> 1 </stepParticleEvery>
    </ibm>
    <domain>
        <rhoP> 1025 </rhoP>
        <nuP> 1.1e-6 </nuP>
        <dx> 0.5e-6 </dx>
        <dt> 1e-7 </dt>
        <kBT> 4.100531391e-21 </kBT>
    </domain>
    <sim><tmax> 10000 </tmax></sim>
    </hemocell>
    """
)


def make_stretch_setup(tmp_path, force_pn, dtype=jnp.float32, dt=None):
    """Reproduce the reference stretch test setup (test_stretch_cell.cpp):
    26 x 13 x 13 um closed box, single RBC at (12, 6, 6) um rotated (90,0,0),
    7 forced vertices per side.  ``dt`` overrides the config's time step
    (the reference CI config-stretchCell.xml uses 0.5e-7 vs the validation
    test's 1e-7)."""
    xml = CONFIG_XML if dt is None else CONFIG_XML.replace(
        "<dt> 1e-7 </dt>", f"<dt> {dt:g} </dt>"
    )
    (tmp_path / "config.xml").write_text(xml)
    (tmp_path / "RBC.xml").write_text(RBC_XML)
    (tmp_path / "RBC.pos").write_text("1\n12.0 6 6 90 0 0\n")

    hc = HemoCell(str(tmp_path / "config.xml"))
    hc.dtype = dtype
    nz = int(13 * (1e-6 / hc.params.dx))  # 26
    nx, ny = 2 * nz, nz
    flags = np.zeros((nx, ny, nz), np.uint8)
    flags[0, :, :] = FLAG_WALL
    flags[-1, :, :] = FLAG_WALL
    flags[:, 0, :] = FLAG_WALL
    flags[:, -1, :] = FLAG_WALL
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    hc.initialize_lattice(flags=flags)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()

    ef_lbm = hc.params.pn_to_lu(force_pn)
    # the reference finds forced vertices from the placed (rotated) cell
    placed = np.asarray(hc.cell_states[0].pos[0])
    hc.set_external_force(0, stretch_force_array(placed, 7, ef_lbm))
    return hc


def _extents_um(hc):
    bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
    to_um = hc.params.dx * 1e6
    axial = (bbox[1] - bbox[0]) * to_um
    transverse = (bbox[3] - bbox[2]) * to_um
    return axial, transverse


def test_rbc_at_rest_is_stable():
    """Unforced RBC in a periodic quiescent box: stays put, volume constant."""
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        d = pathlib.Path(d)
        (d / "config.xml").write_text(CONFIG_XML)
        (d / "RBC.xml").write_text(RBC_XML)
        (d / "RBC.pos").write_text("1\n12.0 6 6 0 0 0\n")
        hc = HemoCell(str(d / "config.xml"))
        hc.initialize_lattice(shape=(48, 24, 24))
        hc.add_cell_type("RBC", "RbcHighOrderModel")
        hc.load_particles()
        assert hc.cell_states[0].pos.shape == (1, 642, 3)
        v0 = float(hc.cell_volumes(0)[0])
        hc.iterate(100)
        assert hc.alive_count(0) == 1
        v1 = float(hc.cell_volumes(0)[0])
        np.testing.assert_allclose(v1, v0, rtol=2e-3)
        # velocities should be tiny (numerical noise only)
        vmax = float(jnp.abs(hc.state.cells[0].vel).max())
        assert vmax < 1e-4


def test_stretch_smoke(tmp_path):
    """300 iterations at 125 pN: cell elongates along x, shrinks in y,
    stays alive, volume within 2%."""
    hc = make_stretch_setup(tmp_path, 125.0)
    a0, t0 = _extents_um(hc)
    assert 7.4 < a0 < 8.2  # resting disc diameter ~7.82 um
    v0 = float(hc.cell_volumes(0)[0])
    hc.iterate(300)
    assert hc.alive_count(0) == 1
    a1, t1 = _extents_um(hc)
    assert a1 > a0 + 0.3
    assert t1 < t0
    v1 = float(hc.cell_volumes(0)[0])
    np.testing.assert_allclose(v1, v0, rtol=0.02)


@pytest.mark.slow
@pytest.mark.parametrize(
    "force_pn,t_lo,t_hi,a_lo,a_hi",
    [
        (25.0, 7.3, 7.9, 9.2, 9.7),
        (75.0, 7.0, 7.5, 11.0, 12.0),
        (125.0, 6.5, 7.0, 12.25, 12.75),
    ],
)
def test_stretch_validation(tmp_path, force_pn, t_lo, t_hi, a_lo, a_hi):
    """Full 10k-iteration force-displacement validation
    (reference bounds, doi:10.3389/fphys.2017.00563 Fig. 4)."""
    hc = make_stretch_setup(tmp_path, force_pn, dtype=jnp.float32)
    v0 = float(hc.cell_volumes(0)[0])
    for _ in range(10):
        hc.iterate(1000)
    assert hc.alive_count(0) == 1
    axial, transverse = _extents_um(hc)
    assert t_lo <= transverse <= t_hi, f"transverse {transverse}"
    assert a_lo <= axial <= a_hi, f"axial {axial}"
    v1 = float(hc.cell_volumes(0)[0])
    assert 0.98 < v1 / v0 <= 1.02
