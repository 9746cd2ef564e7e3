"""Fluid HDF5 output parity (reference io/FluidHdf5IO.hh:140-196 +
writeCEPACField_HDF5, io/FluidHdf5IO.cpp:32-42):

- "Force" holds the actual spread IBM particle force + body force, not
  just the uniform body force
- BindingSites / InteriorPoints datasets exist (zero fields when the
  respective subsystem is off)
- CellDensity is emitted per cell type as CellDensity_<name>
- setFluidOutputs / setOutputs selections are honored
- a CEPAC field file is written when the CEPAC lattice is enabled
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

h5py = pytest.importorskip("h5py")

from test_integration import CONFIG_XML, RBC_XML  # noqa: E402

from hemocell_tpu import HemoCell  # noqa: E402


def _mk(tmp_path, **lattice_kw):
    (tmp_path / "config.xml").write_text(CONFIG_XML)
    (tmp_path / "RBC.xml").write_text(RBC_XML)
    (tmp_path / "RBC.pos").write_text("1\n12.0 6 6 0 0 0\n")
    hc = HemoCell(str(tmp_path / "config.xml"))
    hc.initialize_lattice(shape=(48, 24, 24), **lattice_kw)
    hc.add_cell_type("RBC", "RbcHighOrderModel")
    hc.load_particles()
    hc.set_output_dir(str(tmp_path / "out"))
    return hc


def _fluid_file(hc):
    from hemocell_tpu.io.hdf5io import zero_pad

    return os.path.join(
        hc.outdir, "hdf5", zero_pad(hc.iter),
        f"Fluid.{zero_pad(hc.iter)}.p.0.h5",
    )


def test_force_field_contains_spread_forces(tmp_path):
    hc = _mk(tmp_path)
    hc.set_body_force((1e-7, 0.0, 0.0))
    hc.iterate(30)  # membrane deforms -> nonzero constitutive forces
    hc.write_output(fluid_fields=("Force",))
    with h5py.File(_fluid_file(hc), "r") as f:
        force = f["Force"][...]
    # file layout is [Z+2, Y+2, X+2, 3] with a periodic envelope
    # (paraview-reversed, like the reference); crop + restore [3,X,Y,Z]
    core = force[1:-1, 1:-1, 1:-1].transpose(3, 2, 1, 0)
    # subtract the uniform body force: the remainder is the spread field
    spread = core - np.asarray([1e-7, 0.0, 0.0])[:, None, None, None]
    assert np.abs(spread).max() > 1e-10
    # spread forces are local to the cell: far corner stays body-force-only
    assert np.abs(spread[:, 0, 0, 0]).max() < 1e-12
    # and matches the recomputed spread field exactly
    ref = np.asarray(hc.spread_force_field())
    np.testing.assert_allclose(spread, ref, rtol=1e-4, atol=1e-12)


def test_binding_interior_and_celldensity_fields(tmp_path):
    hc = _mk(tmp_path)
    hc.iterate(2)
    hc.write_output(
        fluid_fields=("BindingSites", "InteriorPoints", "CellDensity")
    )
    with h5py.File(_fluid_file(hc), "r") as f:
        assert f["BindingSites"][...].max() == 0.0
        assert f["InteriorPoints"][...].max() == 0.0
        cd = f["CellDensity_RBC"][...]
    assert cd.sum() == 642.0  # one alive RBC's vertices


def test_set_fluid_outputs_selection(tmp_path):
    hc = _mk(tmp_path)
    hc.iterate(1)
    hc.setFluidOutputs(["Density"])
    hc.write_output()
    with h5py.File(_fluid_file(hc), "r") as f:
        assert set(f.keys()) == {"Density"}


def test_set_outputs_selection(tmp_path):
    hc = _mk(tmp_path)
    hc.iterate(1)
    hc.setOutputs("RBC", ["Velocity"])
    hc.write_output()
    from hemocell_tpu.io.hdf5io import zero_pad

    path = os.path.join(
        hc.outdir, "hdf5", zero_pad(hc.iter),
        f"RBC.{zero_pad(hc.iter)}.p.0.h5",
    )
    with h5py.File(path, "r") as f:
        keys = set(f.keys())
    assert "Velocity" in keys
    assert "Bending force" not in keys and "Total force" not in keys


def test_cepac_field_file(tmp_path):
    hc = _mk(tmp_path)
    hc.enable_cepac(0.1, init=0.5)
    hc.iterate(2)
    hc.write_output(fluid_fields=("Density",))
    from hemocell_tpu.io.hdf5io import zero_pad

    path = os.path.join(
        hc.outdir, "hdf5", zero_pad(hc.iter),
        f"CEPAC.{zero_pad(hc.iter)}.p.0.h5",
    )
    with h5py.File(path, "r") as f:
        conc = f["Density"][...]
    np.testing.assert_allclose(conc, 0.5, atol=1e-5)


def test_write_csv_standalone(tmp_path):
    """write_csv writes the per-cell CSV at its own cadence without the
    full HDF5 output (reference writeCellInfo_CSV at tcsv,
    examples/pipeflow/pipeflow.cpp:136,170-172)."""
    hc = _mk(tmp_path)
    hc.iterate(2)
    hc.write_csv()
    from hemocell_tpu.io.hdf5io import zero_pad

    path = os.path.join(hc.outdir, "csv", f"RBC.{zero_pad(hc.iter)}.csv")
    assert os.path.exists(path)
    lines = open(path).read().splitlines()
    assert lines[0] == ("X,Y,Z,area,volume,atomic_block,cellId,baseCellId,"
                        "velocity_x,velocity_y,velocity_z")
    assert len(lines) == 2  # one cell
    # no fluid HDF5 was written by the CSV-only call
    assert not os.path.exists(_fluid_file(hc))
    # camelCase alias
    hc.writeCellInfoCSV()
