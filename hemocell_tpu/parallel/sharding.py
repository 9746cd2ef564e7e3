"""Multi-chip scale-out: GSPMD sharding of the simulation state.

TPU-native replacement for the reference's MPI spatial domain decomposition
(sparse atomic blocks + envelope exchange, core/hemoCell.cpp:438-571,
core/hemoCellFields.cpp:363-499):

  * The dense lattice ``f[19, X, Y, Z]`` is sharded over a
    ``jax.sharding.Mesh`` along the X (and optionally Y) axes; the streaming
    rolls compile to ICI halo exchanges inserted by XLA — no hand-written
    envelope protocol.
  * Vertex arrays are tiny next to the lattice and stay replicated; the IBM
    scatter/gather against the sharded force/velocity fields is partitioned
    by GSPMD.  This removes the reference's entire particle-communication
    machinery (two-phase request/response envelope sync).
  * Periodic wrap identity (cellId offset relabeling,
    core/hemoCellParticleDataTransfer.cpp:33-65) is unnecessary: positions
    are global and unwrapped.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dynamics import SimState, StepConfig, build_step


def make_mesh(n_devices: int | None = None, axes: tuple = ("x",)) -> Mesh:
    """1-D (or 2-D) device mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axes) == 1:
        arr = np.array(devs)
    else:
        nx = 2 ** int(math.floor(math.log2(n) / 2))
        arr = np.array(devs).reshape(nx, n // nx)
    return Mesh(arr, axes)


def lattice_spec(mesh: Mesh) -> P:
    """Shard the lattice spatially: f[19, X, Y, Z] over ('x'[, 'y'])."""
    if len(mesh.axis_names) == 1:
        return P(None, "x", None, None)
    return P(None, "x", "y", None)


def field_spec(mesh: Mesh) -> P:
    if len(mesh.axis_names) == 1:
        return P("x", None, None)
    return P("x", "y", None)


def shard_state(state: SimState, mesh: Mesh) -> SimState:
    """Place the lattice sharded, cell arrays replicated; optional field
    state (cepac/omega/flags/binding/bc) sharded to match its rank."""
    lsh = NamedSharding(mesh, lattice_spec(mesh))
    fsh = NamedSharding(mesh, field_spec(mesh))
    rep = NamedSharding(mesh, P())
    f = jax.device_put(state.f, lsh)
    cells = jax.tree.map(lambda x: jax.device_put(x, rep), state.cells)
    it = jax.device_put(state.it, rep)

    def put(val, spatial_rank_sh):
        if val is None:
            return None
        nd = getattr(val, "ndim", 0)
        if nd >= 3:
            return jax.device_put(val, spatial_rank_sh)
        return jax.device_put(val, rep)

    return SimState(
        f=f, it=it, cells=cells,
        cepac=put(state.cepac, lsh),
        omega_field=put(state.omega_field, fsh),
        flags_state=put(state.flags_state, fsh),
        binding_mask=put(state.binding_mask, fsh),
        bc_state=put(state.bc_state, lsh),
        body_force_state=put(state.body_force_state, rep),
        le_displacement=put(state.le_displacement, rep),
        ibm_overflow=put(state.ibm_overflow, rep),
    )


def shard_step_config(cfg: StepConfig, mesh: Mesh) -> StepConfig:
    """Place the static fields (flags, masks, bc velocity) with matching
    shardings so the compiled step keeps everything distributed."""
    fs = NamedSharding(mesh, field_spec(mesh))
    rep = NamedSharding(mesh, P())
    flags = jax.device_put(cfg.flags, fs)
    bc = (
        jax.device_put(cfg.bc_velocity, NamedSharding(mesh, lattice_spec(mesh)))
        if cfg.bc_velocity is not None
        else None
    )
    omega = (
        jax.device_put(cfg.omega, fs)
        if hasattr(cfg.omega, "ndim") and getattr(cfg.omega, "ndim", 0) == 3
        else cfg.omega
    )
    bmask = (
        jax.device_put(cfg.boundary_mask, fs)
        if cfg.boundary_mask is not None
        else None
    )
    import dataclasses

    # Pin the exact XLA scatter/gather IBM under GSPMD: the Pallas slab
    # kernels are custom calls whose auto-partitioning has never been
    # exercised on hardware, and their per-slab windows assume the FULL
    # x extent — under an x-sharded lattice that combination silently
    # mis-bins.  The shard_map fast path (sharded_step.py) is where the
    # Pallas IBM runs distributed, with explicit per-shard ownership.
    return dataclasses.replace(
        cfg, flags=flags, bc_velocity=bc, omega=omega, boundary_mask=bmask,
        use_pallas=False, spread_mode="scatter",
    )


def build_sharded_runner(cfg: StepConfig, mesh: Mesh):
    """jitted (state, n) -> state with explicit output shardings so the
    lattice stays sharded across iterations."""
    cfg = shard_step_config(cfg, mesh)
    step = build_step(cfg)

    f_sh = NamedSharding(mesh, lattice_spec(mesh))
    g_sh = NamedSharding(mesh, field_spec(mesh))
    rep = NamedSharding(mesh, P())

    def out_shardings(state: SimState):
        cells = jax.tree.map(lambda _: rep, state.cells)

        def spatial(val):
            if val is None:
                return None
            nd = getattr(val, "ndim", 0)
            return g_sh if nd == 3 else (f_sh if nd == 4 else rep)

        return SimState(
            f=f_sh, it=rep, cells=cells,
            cepac=spatial(state.cepac),
            omega_field=spatial(state.omega_field),
            flags_state=spatial(state.flags_state),
            binding_mask=spatial(state.binding_mask),
            bc_state=spatial(state.bc_state),
            body_force_state=rep if state.body_force_state is not None else None,
            le_displacement=rep if state.le_displacement is not None else None,
            ibm_overflow=rep if state.ibm_overflow is not None else None,
        )

    def run(state: SimState, n: int) -> SimState:
        shardings = out_shardings(state)

        @jax.jit
        def _run(s):
            body = lambda _, ss: jax.lax.with_sharding_constraint(step(ss), shardings)
            return jax.lax.fori_loop(0, n, body, s)

        return _run(state)

    return run
