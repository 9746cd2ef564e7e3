"""Checkpoint / resume.

Replaces Palabos ``parallelIO::save/load`` + checkpoint.xml
(reference: core/hemoCellFields.cpp:240-319, core/hemoCell.cpp:199-219):
full state = fluid populations + per-type cell arrays + iteration counter,
written as a compressed npz, with the reference's ``.old`` double-buffer
semantics (the previous checkpoint is kept until the new one is complete).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..dynamics import SimState
from ..cells.state import CellTypeState


def save_checkpoint(directory: str, state: SimState, meta: dict | None = None):
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "checkpoint.npz")
    tmp = path + ".tmp"
    # Deviation populations are stored under 'h' (NOT 'f'): a pre-change
    # loader given this file fails loudly with KeyError instead of silently
    # misreading deviations as raw populations (rho ~= 0).
    arrays = {"h": np.asarray(state.f), "it": np.asarray(state.it)}
    for opt in ("cepac", "omega_field", "flags_state", "binding_mask",
                "bc_state", "body_force_state", "le_displacement",
                "ibm_overflow"):
        val = getattr(state, opt)
        if val is not None:
            arrays[opt] = np.asarray(val)
    for k, cs in enumerate(state.cells):
        for fieldname in CellTypeState._fields:
            val = getattr(cs, fieldname)
            if val is not None:
                arrays[f"cell{k}_{fieldname}"] = np.asarray(val)
    arrays["n_types"] = np.asarray(len(state.cells))
    with open(tmp, "wb") as fh:  # explicit handle: savez appends .npz to paths
        np.savez_compressed(fh, **arrays)
    # .old double buffer (hemoCellFields.cpp:290-303)
    if os.path.exists(path):
        os.replace(path, path + ".old")
    os.replace(tmp, path)
    if meta is not None:
        with open(os.path.join(directory, "checkpoint.json"), "w") as fh:
            json.dump(meta, fh, indent=2)
    return path


def load_checkpoint(directory: str, dtype=None):
    path = os.path.join(directory, "checkpoint.npz")
    with np.load(path) as data:
        import jax.numpy as jnp

        n_types = int(data["n_types"])
        cells = []
        for k in range(n_types):
            fields = {}
            for fieldname in CellTypeState._fields:
                key = f"cell{k}_{fieldname}"
                if key not in data:
                    # field added after this checkpoint was written
                    nc = data[f"cell{k}_pos"].shape[0]
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
        if "h" in data:
            raw = data["h"]  # deviation populations, current format
            f = jnp.asarray(raw, dtype=dtype) if dtype else jnp.asarray(raw)
        else:
            raw = data["f"]
            f = jnp.asarray(raw, dtype=dtype) if dtype else jnp.asarray(raw)
            if "f_storage_dev" not in data:
                # legacy checkpoint with full populations: convert
                from ..fluid.d3q19 import W

                f = f - jnp.asarray(W, f.dtype).reshape(
                    (19,) + (1,) * (f.ndim - 1)
                )
        it = jnp.asarray(data["it"], jnp.int32)
        def opt_load(name, floaty=True):
            if name not in data:
                return None
            arr = data[name]
            if dtype is not None and floaty and arr.dtype.kind == "f":
                return jnp.asarray(arr, dtype=dtype)
            return jnp.asarray(arr)

        cepac = opt_load("cepac")
        omega_field = opt_load("omega_field")
        flags_state = opt_load("flags_state", floaty=False)
        binding_mask = opt_load("binding_mask", floaty=False)
        bc_state = opt_load("bc_state")
        body_force_state = opt_load("body_force_state")
        le_displacement = opt_load("le_displacement")
        # Absent counter (pre-change checkpoint) restores as 0, not None:
        # None would permanently disable the IBM window-overflow guard on
        # the resumed run (build_step only carries the running max when
        # the incoming state has the field).
        ibm_overflow = opt_load("ibm_overflow", floaty=False)
        if ibm_overflow is None:
            ibm_overflow = jnp.asarray(0, jnp.int32)
    meta = None
    metapath = os.path.join(directory, "checkpoint.json")
    if os.path.exists(metapath):
        with open(metapath) as fh:
            meta = json.load(fh)
    return (
        SimState(
            f=f, it=it, cells=tuple(cells), cepac=cepac,
            omega_field=omega_field, flags_state=flags_state,
            binding_mask=binding_mask, bc_state=bc_state,
            body_force_state=body_force_state,
            le_displacement=le_displacement,
            ibm_overflow=ibm_overflow,
        ),
        meta,
    )
