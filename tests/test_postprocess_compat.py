"""Output compatibility with the reference postprocessing scripts: run the
shipped FluidHDF5toXMF.py / CellHDF5toXMF.py unmodified on our HDF5 output
and check they produce XDMF files."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from hemocell_tpu.io import write_cells_hdf5, write_fluid_hdf5

SCRIPTS = "/root/reference/scripts"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCRIPTS), reason="reference scripts not available"
)


def test_fluid_xmf_conversion(tmp_path):
    fields = {
        "Velocity": np.random.rand(8, 6, 4, 3).astype(np.float32),
        "Density": np.random.rand(8, 6, 4).astype(np.float32),
    }
    write_fluid_hdf5(str(tmp_path), 100, 5e-7, 1e-7, fields)
    res = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "FluidHDF5toXMF.py")],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert res.returncode == 0, res.stderr
    xmfs = [p for p in os.listdir(tmp_path / "hdf5") if p.endswith(".xmf")]
    produced = []
    for root, _, files in os.walk(tmp_path):
        produced += [f for f in files if f.endswith(".xmf")]
    assert produced, res.stdout + res.stderr


def test_cell_xmf_conversion(tmp_path):
    nv, nt = 20, 12
    pos = np.random.rand(nv, 3).astype(np.float32)
    tris = np.random.randint(0, nv, (nt, 3)).astype(np.int32)
    write_cells_hdf5(
        str(tmp_path), 100, "RBC", pos,
        datasets={"Velocity": np.random.rand(nv, 3).astype(np.float32)},
        triangles=tris,
    )
    res = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "CellHDF5toXMF.py"), "RBC"],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=60,
    )
    produced = []
    for root, _, files in os.walk(tmp_path):
        produced += [f for f in files if f.endswith(".xmf")]
    assert res.returncode == 0 and produced, res.stdout + res.stderr
