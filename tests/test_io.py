"""IO tests: HDF5 layout compatibility, CSV header, checkpoint round-trip,
voxelizer geometry."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from hemocell_tpu.config.defaults import FLAG_FLUID, FLAG_WALL
from hemocell_tpu.dynamics import build_runner
from hemocell_tpu.io import load_checkpoint, save_checkpoint, write_fluid_hdf5
from hemocell_tpu.io.hdf5io import write_cell_csv, write_cells_hdf5, zero_pad
from hemocell_tpu.presets import rbc_suspension


def test_zero_pad():
    assert zero_pad(42) == "000000000042"  # width 12, genericFunctions.cpp:112


def test_fluid_hdf5_layout(tmp_path):
    fields = {
        "Velocity": np.random.rand(8, 6, 4, 3).astype(np.float32),
        "Density": np.random.rand(8, 6, 4).astype(np.float32),
    }
    path = write_fluid_hdf5(str(tmp_path), 1000, 5e-7, 1e-7, fields)
    assert path.endswith("Fluid.000000001000.p.0.h5")
    with h5py.File(path) as f:
        # reversed (z,y,x) + envelope-2 convention
        assert list(f.attrs["subdomainSize"]) == [6, 8, 10]
        assert f["Velocity"].shape == (6, 8, 10, 3)
        assert f["Density"].shape == (6, 8, 10, 1)
        assert f.attrs["dx"] == 5e-7
        assert "relativePosition" in f.attrs and "dxdydz" in f.attrs


def test_cells_hdf5(tmp_path):
    pos = np.random.rand(20, 3).astype(np.float32)
    tris = np.arange(12, dtype=np.int32).reshape(4, 3)
    path = write_cells_hdf5(str(tmp_path), 5, "RBC", pos, triangles=tris)
    with h5py.File(path) as f:
        assert f["Position"].shape == (20, 3)
        assert f["Triangles"].shape == (4, 3)
        assert f.attrs["numberOfParticles"] == 20


def test_cell_csv(tmp_path):
    path = write_cell_csv(str(tmp_path), 7, "RBC", [[1, 2, 3, 4, 5, 0, 0, 0, 6, 7, 8]])
    text = open(path).read().splitlines()
    assert text[0] == (
        "X,Y,Z,area,volume,atomic_block,cellId,baseCellId,"
        "velocity_x,velocity_y,velocity_z"
    )
    assert len(text) == 2


def test_checkpoint_roundtrip(tmp_path):
    cfg, state, _ = rbc_suspension(shape=(16, 16, 16), n_cells=1, repulsion=False)
    run = build_runner(cfg)
    state = run(state, 3)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, {"iteration": 3})
    loaded, meta = load_checkpoint(d)
    assert meta["iteration"] == 3
    assert int(loaded.it) == 3
    np.testing.assert_array_equal(np.asarray(loaded.f), np.asarray(state.f))
    np.testing.assert_array_equal(
        np.asarray(loaded.cells[0].pos), np.asarray(state.cells[0].pos)
    )
    # double buffer: second save keeps .old
    save_checkpoint(d, loaded)
    assert os.path.exists(os.path.join(d, "checkpoint.npz.old"))
    # resumed run continues identically
    out_a = run(state, 2)
    out_b = run(loaded, 2)
    np.testing.assert_array_equal(np.asarray(out_a.f), np.asarray(out_b.f))


def test_voxelize_tube():
    from hemocell_tpu.utils.voxelize import voxelize_stl

    flags, info = voxelize_stl(
        "/root/reference/examples/pipeflow/tube.stl", 50, 1
    )
    assert flags.shape[1] == flags.shape[2]
    # circular lumen of diameter ~50
    area = (flags[flags.shape[0] // 2] == FLAG_FLUID).sum()
    r = np.sqrt(area / np.pi)
    assert 23.5 < r < 25.5
    # open ends
    assert (flags[0] == FLAG_FLUID).sum() > 0
    assert (flags[-1] == FLAG_FLUID).sum() > 0
    # walls exist
    assert (flags == FLAG_WALL).sum() > 0


def test_voxelize_erode():
    """erode=1 tightens the lumen by exactly one face-connected layer
    (the measured config switch closing the 52-vs-42 placement gap;
    reference lumen: Palabos `inside` without innerBorder)."""
    from hemocell_tpu.utils.voxelize import voxelize_stl

    f0, _ = voxelize_stl("/root/reference/examples/pipeflow/tube.stl", 50, 1)
    f1, _ = voxelize_stl(
        "/root/reference/examples/pipeflow/tube.stl", 50, 1, erode=1
    )
    a0 = f0 == FLAG_FLUID
    a1 = f1 == FLAG_FLUID
    # strictly smaller lumen, subset of the original
    assert a1.sum() < a0.sum()
    assert not (a1 & ~a0).any()
    # every removed voxel is face-adjacent to a wall in the original
    removed = a0 & ~a1
    p = np.pad(a0, 1, mode="edge")
    has_wall_neighbor = ~(
        p[:-2, 1:-1, 1:-1] & p[2:, 1:-1, 1:-1]
        & p[1:-1, :-2, 1:-1] & p[1:-1, 2:, 1:-1]
        & p[1:-1, 1:-1, :-2] & p[1:-1, 1:-1, 2:]
    )
    assert (removed <= has_wall_neighbor).all()
    # ends still open
    assert (f1[0] == FLAG_FLUID).sum() > 0
    assert (f1[-1] == FLAG_FLUID).sum() > 0


def test_pad_flags_axis():
    from hemocell_tpu.utils.voxelize import pad_flags_axis

    flags = np.zeros((103, 8, 8), np.uint8)
    flags[:, 0, :] = FLAG_WALL  # x-uniform geometry
    out, added = pad_flags_axis(flags, axis=0, multiple=8, mode="extend")
    assert out.shape == (104, 8, 8) and added == 1
    np.testing.assert_array_equal(out[-1], flags[-1])
    # already divisible: no-op
    out2, added2 = pad_flags_axis(out, axis=0, multiple=8)
    assert added2 == 0 and out2 is out
    # wall mode appends solid planes
    out3, added3 = pad_flags_axis(flags, axis=0, multiple=16, mode="wall")
    assert out3.shape == (112, 8, 8) and added3 == 9
    assert (out3[103:] == FLAG_WALL).all()
    # extend requires matching end planes
    bad = flags.copy()
    bad[-1, 3, 3] = FLAG_WALL
    with pytest.raises(ValueError):
        pad_flags_axis(bad, axis=0, multiple=8, mode="extend")


def test_async_output(tmp_path):
    """async_io=True writes the same files as the synchronous path."""
    import jax.numpy as jnp

    from hemocell_tpu import HemoCell

    cfgdir = tmp_path / "case"
    os.makedirs(cfgdir, exist_ok=True)
    (cfgdir / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx><dt>1e-7</dt>
        <kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    hc = HemoCell(str(cfgdir / "config.xml"))
    hc.initialize_lattice(shape=(8, 8, 8))
    hc.set_body_force((1e-6, 0.0, 0.0))
    hc.iterate(2)

    hc.set_output_dir(str(tmp_path / "sync"))
    hc.write_output()
    hc.set_output_dir(str(tmp_path / "async"))
    hc.write_output(async_io=True)
    hc.flush_output()

    import glob

    sync_files = sorted(
        os.path.relpath(p, tmp_path / "sync")
        for p in glob.glob(str(tmp_path / "sync" / "**" / "*.h5"),
                           recursive=True)
    )
    async_files = sorted(
        os.path.relpath(p, tmp_path / "async")
        for p in glob.glob(str(tmp_path / "async" / "**" / "*.h5"),
                           recursive=True)
    )
    assert sync_files == async_files and len(sync_files) > 0
    import h5py

    fa = h5py.File(glob.glob(str(tmp_path / "async" / "**" / "Fluid*.h5"),
                             recursive=True)[0])
    fs = h5py.File(glob.glob(str(tmp_path / "sync" / "**" / "Fluid*.h5"),
                             recursive=True)[0])
    assert np.array_equal(fa["Velocity"][:], fs["Velocity"][:])


def test_metrics_log(tmp_path):
    """metrics.dat rows + plots (analog of scripts/plot_metrics.py)."""
    from hemocell_tpu import HemoCell
    from hemocell_tpu.utils.metrics import MetricsLog, plot_metrics

    cfgdir = tmp_path / "case"
    os.makedirs(cfgdir, exist_ok=True)
    (cfgdir / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx><dt>1e-7</dt>
        <kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    hc = HemoCell(str(cfgdir / "config.xml"))
    hc.params.u_lbm_max = 0.01
    flags = np.zeros((16, 8, 8), np.uint8)
    flags[:, :, 0] = FLAG_WALL
    flags[:, :, -1] = FLAG_WALL
    hc.initialize_lattice(flags=flags)
    hc.set_body_force((1e-6, 0.0, 0.0))
    hc.set_output_dir(str(tmp_path / "out"))
    m = MetricsLog(hc.outdir)
    for _ in range(2):
        hc.iterate(5)
        hc.block()
        m.record(hc)
    data = np.loadtxt(m.path)
    assert data.shape == (2, 5)
    assert data[1, 0] == 10
    plot_metrics(hc.outdir)  # smoke (skips silently without matplotlib)


def test_checkpoint_carries_overflow_and_le(tmp_path):
    """ibm_overflow and le_displacement must survive a checkpoint: losing
    the counter silently disables the IBM overflow guard on resume, and
    losing the displacement resets a Lees-Edwards run's image offset."""
    import jax.numpy as jnp

    cfg, state, _ = rbc_suspension(shape=(16, 16, 16), n_cells=1,
                                   repulsion=False)
    state = state._replace(
        ibm_overflow=jnp.asarray(7, jnp.int32),
        le_displacement=jnp.asarray(3.25, jnp.float32),
    )
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state)
    loaded, _ = load_checkpoint(d)
    assert int(loaded.ibm_overflow) == 7
    assert float(loaded.le_displacement) == 3.25
    # pre-change checkpoint (fields absent): guard restores ARMED (0), not
    # None — None would permanently disable the running-max update
    state_old = state._replace(ibm_overflow=None, le_displacement=None)
    d2 = str(tmp_path / "ckpt_old")
    save_checkpoint(d2, state_old)
    loaded2, _ = load_checkpoint(d2)
    assert int(loaded2.ibm_overflow) == 0
    assert loaded2.le_displacement is None
