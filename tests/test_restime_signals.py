"""Residence time (HemoCellParticle.restime, core/hemoCellParticle.h:45-63)
and graceful-exit signal handling (core/hemoCell.cpp:48-67,289-297)."""

import os
import signal
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hemocell_tpu.presets import rbc_suspension
from hemocell_tpu.dynamics import build_runner


def test_restime_counts_alive_iterations():
    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 16), n_cells=1, body_force=(1e-7, 0, 0),
        repulsion=False,
    )
    out = build_runner(cfg)(state, 7)
    assert np.asarray(out.cells[0].restime).tolist() == [7]


def test_restime_survives_checkpoint(tmp_path):
    from hemocell_tpu.io import load_checkpoint, save_checkpoint

    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 16), n_cells=1, body_force=(1e-7, 0, 0),
        repulsion=False,
    )
    state = build_runner(cfg)(state, 3)
    save_checkpoint(str(tmp_path), state)
    loaded, _ = load_checkpoint(str(tmp_path))
    assert np.asarray(loaded.cells[0].restime).tolist() == [3]


def test_old_checkpoint_without_restime_loads(tmp_path):
    """Forward compatibility: checkpoints written before the restime field
    get zeros."""
    from hemocell_tpu.io import load_checkpoint, save_checkpoint

    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 16), n_cells=2, body_force=(1e-7, 0, 0),
        repulsion=False,
    )
    save_checkpoint(str(tmp_path), state)
    # strip the restime keys to simulate an old checkpoint
    path = os.path.join(str(tmp_path), "checkpoint.npz")
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files if "restime" not in k}
    with open(path, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    loaded, _ = load_checkpoint(str(tmp_path))
    assert np.asarray(loaded.cells[0].restime).tolist() == [0, 0]


def test_exit_signal_checkpoints_and_exits(tmp_path):
    from hemocell_tpu import HemoCell

    cfgdir = tmp_path / "case"
    os.makedirs(cfgdir)
    (cfgdir / "config.xml").write_text(
        """<?xml version="1.0" ?><hemocell>
        <domain><rhoP>1025</rhoP><nuP>1.1e-6</nuP><dx>5e-7</dx><dt>1e-7</dt>
        <kBT>4.100531391e-21</kBT></domain>
        <sim><tmax>10</tmax></sim></hemocell>"""
    )
    hc = HemoCell(str(cfgdir / "config.xml"))
    hc.initialize_lattice(shape=(8, 8, 8))
    hc.set_output_dir(str(tmp_path / "out"))
    hc.enable_exit_signals()
    hc.iterate(1)
    os.kill(os.getpid(), signal.SIGUSR1)
    with pytest.raises(SystemExit):
        hc.iterate(1)
    assert os.path.exists(tmp_path / "out" / "checkpoint" / "checkpoint.npz")


def test_adams_bashforth_integration():
    """material_integration=2: pos += 1.5v - 0.5v_prev
    (core/hemoCellParticle.h:197-200)."""
    import dataclasses

    import jax.numpy as jnp

    from hemocell_tpu.cells.state import make_cell_state

    cfg, state, _ = rbc_suspension(
        shape=(16, 16, 16), n_cells=1, body_force=(1e-6, 0, 0),
        repulsion=False,
    )
    cfg2 = dataclasses.replace(cfg, material_integration=2)
    cells2 = tuple(
        make_cell_state(np.asarray(cs.pos), adams_bashforth=True)
        for cs in state.cells
    )
    state2 = state._replace(cells=cells2)
    out_e = build_runner(cfg)(state, 5)
    out_ab = build_runner(cfg2)(state2, 5)
    pe = np.asarray(out_e.cells[0].pos)
    pab = np.asarray(out_ab.cells[0].pos)
    # both advance, and the schemes genuinely differ
    assert not np.allclose(pab, np.asarray(state.cells[0].pos))
    assert not np.array_equal(pe, pab)
    assert np.asarray(out_ab.cells[0].vel_prev).shape == pe.shape
