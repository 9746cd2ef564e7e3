"""Checkpoint / resume.

Replaces Palabos ``parallelIO::save/load`` + checkpoint.xml
(reference: core/hemoCellFields.cpp:240-319, core/hemoCell.cpp:199-219):
full state = fluid populations + per-type cell arrays + iteration counter,
written as a compressed npz, with the reference's ``.old`` double-buffer
semantics (the previous checkpoint is kept until the new one is complete).

PreInlet runs (utils/preinlet.PreInletState) checkpoint BOTH simulations
plus the crossing watermarks and the adaptive drive — the analog of the
reference's ``PRE_*`` checkpoint variants (core/hemoCellFields.cpp:312-318).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..dynamics import SimState
from ..cells.state import CellTypeState

_OPT_FIELDS = ("cepac", "omega_field", "flags_state", "binding_mask",
               "bc_state", "body_force_state", "le_displacement",
               "ibm_overflow")


def _state_arrays(state: SimState, prefix: str = "") -> dict:
    """Flatten a SimState into named numpy arrays.

    Deviation populations are stored under 'h' (NOT 'f'): a pre-change
    loader given this file fails loudly with KeyError instead of silently
    misreading deviations as raw populations (rho ~= 0)."""
    arrays = {prefix + "h": np.asarray(state.f),
              prefix + "it": np.asarray(state.it)}
    for opt in _OPT_FIELDS:
        val = getattr(state, opt)
        if val is not None:
            arrays[prefix + opt] = np.asarray(val)
    for k, cs in enumerate(state.cells):
        for fieldname in CellTypeState._fields:
            val = getattr(cs, fieldname)
            if val is not None:
                arrays[f"{prefix}cell{k}_{fieldname}"] = np.asarray(val)
    arrays[prefix + "n_types"] = np.asarray(len(state.cells))
    return arrays


def _state_from(data, prefix: str = "", dtype=None) -> SimState:
    import jax.numpy as jnp

    n_types = int(data[prefix + "n_types"])
    cells = []
    for k in range(n_types):
        fields = {}
        for fieldname in CellTypeState._fields:
            key = f"{prefix}cell{k}_{fieldname}"
            if key not in data:
                # field added after this checkpoint was written
                nc = data[f"{prefix}cell{k}_pos"].shape[0]
                if fieldname == "restime":
                    fields[fieldname] = jnp.zeros(nc, jnp.int32)
                else:
                    fields[fieldname] = None
                continue
            arr = data[key]
            if dtype is not None and arr.dtype.kind == "f":
                fields[fieldname] = jnp.asarray(arr, dtype=dtype)
            else:
                fields[fieldname] = jnp.asarray(arr)
        cells.append(CellTypeState(**fields))
    if prefix + "h" in data:
        raw = data[prefix + "h"]  # deviation populations, current format
        f = jnp.asarray(raw, dtype=dtype) if dtype else jnp.asarray(raw)
    else:
        raw = data[prefix + "f"]
        f = jnp.asarray(raw, dtype=dtype) if dtype else jnp.asarray(raw)
        if prefix + "f_storage_dev" not in data:
            # legacy checkpoint with full populations: convert
            from ..fluid.d3q19 import W

            f = f - jnp.asarray(W, f.dtype).reshape(
                (19,) + (1,) * (f.ndim - 1)
            )
    it = jnp.asarray(data[prefix + "it"], jnp.int32)

    def opt_load(name, floaty=True):
        if prefix + name not in data:
            return None
        arr = data[prefix + name]
        if dtype is not None and floaty and arr.dtype.kind == "f":
            return jnp.asarray(arr, dtype=dtype)
        return jnp.asarray(arr)

    # Absent counter (pre-change checkpoint) restores as 0, not None:
    # None would permanently disable the IBM window-overflow guard on
    # the resumed run (build_step only carries the running max when
    # the incoming state has the field).
    ibm_overflow = opt_load("ibm_overflow", floaty=False)
    if ibm_overflow is None:
        ibm_overflow = jnp.asarray(0, jnp.int32)
    return SimState(
        f=f, it=it, cells=tuple(cells),
        cepac=opt_load("cepac"),
        omega_field=opt_load("omega_field"),
        flags_state=opt_load("flags_state", floaty=False),
        binding_mask=opt_load("binding_mask", floaty=False),
        bc_state=opt_load("bc_state"),
        body_force_state=opt_load("body_force_state"),
        le_displacement=opt_load("le_displacement"),
        ibm_overflow=ibm_overflow,
    )


def _atomic_write(directory: str, filename: str, arrays: dict) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, filename)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:  # explicit handle: savez appends .npz to paths
        np.savez_compressed(fh, **arrays)
    # .old double buffer (hemoCellFields.cpp:290-303)
    if os.path.exists(path):
        os.replace(path, path + ".old")
    os.replace(tmp, path)
    return path


def save_checkpoint(directory: str, state: SimState, meta: dict | None = None):
    path = _atomic_write(directory, "checkpoint.npz", _state_arrays(state))
    if meta is not None:
        with open(os.path.join(directory, "checkpoint.json"), "w") as fh:
            json.dump(meta, fh, indent=2)
    return path


def load_checkpoint(directory: str, dtype=None):
    path = os.path.join(directory, "checkpoint.npz")
    with np.load(path) as data:
        state = _state_from(data, "", dtype)
    meta = None
    metapath = os.path.join(directory, "checkpoint.json")
    if os.path.exists(metapath):
        with open(metapath) as fh:
            meta = json.load(fh)
    return state, meta


def save_preinlet_checkpoint(directory: str, pstate,
                             meta: dict | None = None):
    """Checkpoint a coupled preinlet run (utils/preinlet.PreInletState):
    both SimStates (preinlet fields under ``PRE_``, the reference's
    variant naming, core/hemoCellFields.cpp:312-318), the per-type crossing
    watermarks, and the adaptive body force.  Same atomic-write + ``.old``
    semantics as save_checkpoint."""
    arrays = _state_arrays(pstate.main, "")
    arrays.update(_state_arrays(pstate.pre, "PRE_"))
    arrays["preinlet_body_force"] = np.asarray(pstate.body_force)
    for k, c in enumerate(pstate.crossings):
        arrays[f"preinlet_crossings{k}"] = np.asarray(c)
    arrays["preinlet_n_crossings"] = np.asarray(len(pstate.crossings))
    path = _atomic_write(directory, "checkpoint_preinlet.npz", arrays)
    if meta is not None:
        with open(os.path.join(directory, "checkpoint_preinlet.json"),
                  "w") as fh:
            json.dump(meta, fh, indent=2)
    return path


def load_preinlet_checkpoint(directory: str, dtype=None):
    """Restore a PreInletState (+ meta) saved by save_preinlet_checkpoint."""
    import jax.numpy as jnp

    from ..utils.preinlet import PreInletState

    path = os.path.join(directory, "checkpoint_preinlet.npz")
    with np.load(path) as data:
        main = _state_from(data, "", dtype)
        pre = _state_from(data, "PRE_", dtype)
        bf = data["preinlet_body_force"]
        body_force = (jnp.asarray(bf, dtype=dtype) if dtype
                      else jnp.asarray(bf))
        n = int(data["preinlet_n_crossings"])
        crossings = tuple(
            jnp.asarray(data[f"preinlet_crossings{k}"]) for k in range(n)
        )
    meta = None
    metapath = os.path.join(directory, "checkpoint_preinlet.json")
    if os.path.exists(metapath):
        with open(metapath) as fh:
            meta = json.load(fh)
    return PreInletState(pre=pre, main=main, body_force=body_force,
                         crossings=crossings), meta
