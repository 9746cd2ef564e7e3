"""Native C++ components: voxelizer library + packcells CLI.

Skipped when no toolchain is available (every native component has a
pure-Python fallback)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                   check=True, capture_output=True, timeout=300)


def test_voxelizer_matches_numpy():
    from hemocell_tpu import native
    from hemocell_tpu.utils.voxelize import _inside_by_parity
    from hemocell_tpu.mesh.generate import icosphere

    assert native.available()
    mesh = icosphere(300)
    tris = mesh.vertices[mesh.triangles] * 6.0 + 10.0  # radius-6 sphere at 10
    tris = tris + np.array([0.0, 2.347e-4 * 2**0.5, 1.731e-4 * 3**0.5])
    shape = (20, 20, 20)
    got = native.voxelize_parity(tris, shape)
    want = _inside_by_parity(tris, shape)
    np.testing.assert_array_equal(got, want)
    # sphere volume sanity: ~4/3 pi 6^3 = 905 nodes
    assert 700 < got.sum() < 1100


def test_voxelize_stl_uses_native(tmp_path):
    from hemocell_tpu.utils.voxelize import voxelize_stl

    flags, info = voxelize_stl(
        "/root/reference/examples/pipeflow/tube.stl", 50, 1
    )
    # pipeflow tube oracle: round cross-section of diameter ~50 lu
    area = float((flags[flags.shape[0] // 2] == 0).sum())
    assert 1800 < area < 2200, area


def test_packcells_cli(tmp_path):
    exe = os.path.join(REPO, "tools", "packcells", "packcells")
    subprocess.run(
        [exe, "30", "30", "30", "--hematocrit", "0.2", "--seed", "3",
         "--plt_ratio", "0.1"],
        cwd=tmp_path, check=True, capture_output=True, timeout=300,
    )
    rbc = tmp_path / "RBC.pos"
    assert rbc.exists()
    lines = rbc.read_text().strip().splitlines()
    n = int(lines[0])
    assert n == len(lines) - 1 and n > 10
    xyzabc = np.array([[float(v) for v in ln.split()] for ln in lines[1:]])
    assert xyzabc.shape[1] == 6
    # positions inside the box (um)
    assert (xyzabc[:, :3] >= 0).all() and (xyzabc[:, :3] <= 30).all()
