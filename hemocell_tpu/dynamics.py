"""The coupled IB-LBM time step.

Reproduces the reference iteration contract (core/hemoCell.cpp:299-376):

  1. inter-cell + boundary repulsion every ``repulsion_every`` steps
  2. spread (capped) particle forces to the fluid; add driving body force
  3. fluid collide + stream  [+ CEPAC advection-diffusion when enabled]
  4. interpolate fluid velocity to vertices every ``particle_every`` steps
  5. advance vertices (Euler, pos += v); kill cells touching boundary nodes
  6. constitutive model every ``material_every`` steps (per cell type)
  7. (forces on the lattice rebuilt from scratch each step — no reset needed)

as ONE jitted function over a ``SimState`` pytree.  Timescale separation uses
``lax.cond`` on the traced iteration counter so the whole loop stays a single
compiled XLA program; ``run(state, n)`` wraps it in ``lax.fori_loop``.

Static configuration (lattice flags, topologies, constants) is closed over;
only the state flows through.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cells.repulsion import boundary_repulsion_forces, repulsion_forces
from .cells.state import CellTypeState
from .fluid import lbm
from .ibm import coupling


class SimState(NamedTuple):
    f: jnp.ndarray  # [19, X, Y, Z]
    it: jnp.ndarray  # int32 scalar
    cells: tuple  # tuple[CellTypeState, ...]
    # optional CEPAC scalar advection-diffusion populations [19, X, Y, Z]
    # (reference: core/hemoCellFields.cpp:113-139)
    cepac: Any = None
    # optional per-node relaxation frequency (interior viscosity,
    # reference: helper/interiorViscosity.{h,cpp})
    omega_field: Any = None
    # mutable node flags + binding-site mask (solidify mechanics,
    # reference: helper/bindingField.{h,cpp}, pltSimpleModel.cpp:211-248)
    flags_state: Any = None
    binding_mask: Any = None
    # dynamic velocity-BC override (preInlet coupling,
    # reference: helper/preInlet.cpp:353-452)
    bc_state: Any = None
    # dynamic body-force override [3] (adaptive preInlet drive,
    # reference: helper/preInlet.cpp:742-938)
    body_force_state: Any = None
    # Lees-Edwards accumulated x-displacement (scalar; helper/leesEdwardsBC.h)
    le_displacement: Any = None
    # running max of the Pallas IBM slab-window overflow counter (int32
    # scalar; 0 = no vertex contribution was ever dropped).  Checked by
    # HemoCell.iterate after every runner call — in-run overflow triggers a
    # loud warning + auto-fallback to the scatter path (silent physics
    # corruption is never acceptable).
    ibm_overflow: Any = None


@dataclass
class TypeConfig:
    """Static per-celltype configuration for the step builder."""

    name: str
    model_fn: Callable  # (pos, vel, topo_arrays, mc) -> ForceTerms
    topo: dict  # device arrays from topology_device_arrays
    material: dict  # float coefficients
    material_every: int = 1  # stepMaterialEvery (timescale)
    ext_force: Optional[jnp.ndarray] = None  # [NC, NV, 3] static external
    # interior viscosity (None = off): omega inside this type's membranes
    omega_interior: Optional[float] = None
    interior_box: int = 24  # local raycast box edge (>= cell diameter + 2)
    # solidify mechanics (platelet binding; reference material XML
    # distanceThreshold / shearThreshold)
    solidify: bool = False
    distance_threshold: float = 0.0
    shear_threshold: float = 0.0


@dataclass
class StepConfig:
    """Static global configuration."""

    shape: tuple  # (X, Y, Z)
    flags: jnp.ndarray  # uint8 [X,Y,Z]
    omega: Any  # scalar or [X,Y,Z]
    types: Sequence[TypeConfig] = field(default_factory=list)
    bc_velocity: Optional[jnp.ndarray] = None  # [3,X,Y,Z]
    # fixed-density (anti-bounce-back) outlet value at FLAG_PRESSURE nodes
    # (reference: Zou-He addPressureBoundary + setBoundaryDensity)
    bc_density: Optional[float] = None
    body_force: Optional[jnp.ndarray] = None  # [3] or [3,X,Y,Z]
    particle_every: int = 1  # stepParticleEvery
    f_limit: float = 1e30
    # repulsion (reference: config kRep/RepCutoff in lbm units)
    repulsion_constant: float = 0.0
    repulsion_cutoff: float = 0.0
    repulsion_every: int = 1
    boundary_repulsion_constant: float = 0.0
    boundary_repulsion_cutoff: float = 0.0
    boundary_repulsion_every: int = 1
    boundary_mask: Optional[jnp.ndarray] = None  # uint8 [X,Y,Z]
    dtype: Any = jnp.float32
    # fluid kernel: None = auto (fused Pallas kernel on TPU, jnp elsewhere);
    # the sharded runner forces False until the shard_map halo path lands
    use_pallas: Optional[bool] = None
    # CEPAC advection-diffusion field (enabled when cepac_tau is set)
    cepac_tau: Optional[float] = None
    cepac_dirichlet_mask: Optional[jnp.ndarray] = None  # uint8 [X,Y,Z]
    cepac_dirichlet_value: Optional[jnp.ndarray] = None  # [X,Y,Z]
    # interior viscosity membrane-update period (0 = disabled;
    # reference: interiorViscosityTimescale)
    interior_every: int = 0
    # full-raycast period (0 = raycast at interior_every, no cheap update;
    # reference: interiorViscosityEntireGridTimescale — the octree raycast
    # runs rarely, the membrane-normal sweep at interior_every in between,
    # core/hemoCell.cpp:347-357)
    interior_entire_every: int = 0
    # solidification period (0 = disabled; reference: solidifyTimescale)
    solidify_every: int = 0
    # IBM exchange: None = auto (Pallas sorted-slab kernels on wall-free TPU
    # domains — 7x faster than scatter at 64^3/70k verts — else XLA
    # scatter); or force 'scatter' | 'binned' | 'pallas'
    spread_mode: Optional[str] = None
    # Lees-Edwards sheared periodicity across the z faces (None = off):
    # the relative image velocity U = shear_rate * Z
    lees_edwards_velocity: Optional[float] = None
    # amortised-resort shadow mode: keep the Pallas IBM's sorted vertex
    # layout for this many steps (positions drift in-place; widened kernel
    # windows absorb up to one slab of drift).  1 = resort every step.
    # Only active on wall-free non-LE pallas domains; requires
    # resort_every * u_max < 1 LU.
    resort_every: int = 1
    # vertex integration scheme (reference HEMOCELL_MATERIAL_INTEGRATION,
    # core/hemoCellParticle.h:188-203): 1 = Euler, 2 = Adams-Bashforth
    # (pos += 1.5 v - 0.5 v_prev; needs CellTypeState.vel_prev)
    material_integration: int = 1
    # multi-step fused fluid kernel for pure-fluid (cell-free) runs: None =
    # auto on TPU, True forces (tests run it interpreted on CPU), False
    # disables.  Bitwise equal to k one-pass steps at ~1/k the per-step
    # HBM write traffic (fluid/pallas_lbm_kx.py); coupled iterations
    # spread a fresh IBM force every step so they cannot fuse across the
    # fluid boundary.
    fluid_2x: Optional[bool] = None
    # fusion depth for the pure-fluid kernel: None = auto (4, the
    # measured on-chip optimum — 5.11 GLUPS at 128^3 vs 3.57 for k=2,
    # scripts/probe_kx_ab.py); 2 dispatches the original 2x kernel
    fluid_k: Optional[int] = None
    # IBM matmul precision: 'f32' (default) or 'bf16' — bf16 runs the
    # one-hot spread/interp contractions at the MXU's bf16 rate with f32
    # accumulation (~0.3% relative weight error; stretch/pipeflow oracles
    # hold — see tests and docs/PERFORMANCE.md)
    ibm_mm: str = "f32"
    # static IBM slab-window capacity override (None = blind safety=4
    # pick, ibm/pallas_ibm.slab_capacity).  The facade sets this from the
    # MEASURED initial occupancy (adaptive_capacity) — tighter windows
    # mean less per-program DMA + chunk waste; the carried overflow
    # counter guards against mid-run redistribution past the margin.
    ibm_capacity: Optional[int] = None
    # lane-fold factor (fluid/pallas_lbm.fold_field): state.f and the fluid
    # kernel operands live in the [19, X/fold, Y, fold*Z] layout, filling
    # the 128-lane tile on Z<128 domains (64^3 fluid pass +70%).  Set by
    # build_runner only (the runner folds/unfolds at its boundary); must be
    # 1 when Lees-Edwards/CEPAC/solidify/interior-viscosity are active.
    fold: int = 1


class IbmShadow(NamedTuple):
    """Persistent sorted-layout state between resorts (see
    ibm/pallas_ibm.py shadow kernels)."""

    plan: Any      # IbmPlanT: starts/pos_cm (CURRENT drifted)/order/F_cm
    vel_cm: jnp.ndarray  # [4, P+C] sorted velocities (advance increments)
    act_cm: jnp.ndarray  # [P+C] sorted activity mask
    alive: jnp.ndarray   # [NC_total] per-cell alive at last act_cm refresh


def auto_resort_every(u_max: float, candidates=(32, 16, 8, 4, 2)) -> int:
    """Largest IBM resort cadence whose worst-case drift (k * u_max per
    step) stays safely inside the shadow kernels' boundary strips
    ((EXTRA-1)/SUBDIV lu, see ibm/pallas_ibm.shadow_supported_drift), with
    a 20% margin.  Measured on the v5e at 128^3/560k verts: cadence 32 vs 8
    is 397 vs 347 coupled MLUPS (commit a04398f)."""
    from .ibm.pallas_ibm import EXTRA, SUBDIV

    strip = (EXTRA - 1) / SUBDIV
    for k in candidates:
        if k * max(u_max, 1e-12) < 0.8 * strip:
            return k
    return 1


def _every(it, k, fn, operand, fallback):
    """lax.cond on (it % k == 0); skips the cond when k == 1."""
    if k <= 1:
        return fn(operand)
    return jax.lax.cond(it % k == 0, fn, lambda _: fallback, operand)


def build_step(cfg: StepConfig) -> Callable[[SimState], SimState]:
    """Build the single-iteration function.  Pure; jit at call site."""
    shape = tuple(int(s) for s in cfg.shape)
    fshape = jnp.asarray(shape, dtype=cfg.dtype)
    n_types = len(cfg.types)
    # static: wall-free domains (and no solidify, which could create walls)
    # skip the per-node flag gather in the IBM stencil entirely
    has_boundaries = bool(np.asarray(cfg.flags).any()) or bool(cfg.solidify_every)

    shadow_mode = shadow_active(cfg)

    def step(state: SimState, shadow=None, resync=None):
        it = state.it
        cells = list(state.cells)
        new_shadow = shadow
        # node flags: static unless solidification mutates them
        flags = (
            state.flags_state
            if (cfg.solidify_every and state.flags_state is not None)
            else cfg.flags
        )
        # velocity BC: dynamic override (preInlet) wins over the static one
        bc_velocity = (
            state.bc_state if state.bc_state is not None else cfg.bc_velocity
        )

        # ---- flatten vertices across types --------------------------------
        pos_parts, act_parts, gid_parts, ftot_parts = [], [], [], []
        offset = 0
        for tc, cs in zip(cfg.types, cells):
            nc, nv = cs.pos.shape[0], cs.pos.shape[1]
            pos_parts.append(cs.pos.reshape(-1, 3))
            act = jnp.repeat(cs.alive.astype(cfg.dtype), nv)
            act_parts.append(act)
            gids = jnp.repeat(jnp.arange(nc, dtype=jnp.int32) + offset, nv)
            gid_parts.append(gids)
            offset += nc
        pos_flat = jnp.concatenate(pos_parts) if pos_parts else None
        active = jnp.concatenate(act_parts) if act_parts else None
        cell_gid = jnp.concatenate(gid_parts) if gid_parts else None
        if pos_flat is not None and pos_flat.shape[0] == 0:
            # types registered but no cells loaded: pure-fluid run
            pos_flat = active = cell_gid = None

        # ---- 1: repulsion -------------------------------------------------
        # Reference semantics (core/hemoCell.cpp:307-314): the recompute at
        # repulsionTimescale zeroes + replaces force_repulsion; boundary
        # repulsion ADDS onto it at its own timescale; the carried value is
        # spread EVERY iteration.  So off-step fallback is the carried
        # per-particle force, never zeros.
        carried_rep = None
        if pos_flat is not None and (
            cfg.repulsion_constant > 0.0
            or (
                cfg.boundary_repulsion_constant > 0.0
                and cfg.boundary_mask is not None
            )
        ):
            carried_rep = jnp.concatenate(
                [cs.force_repulsion.reshape(-1, 3) for cs in cells]
            )
        rep_overflow = None
        if pos_flat is not None and cfg.repulsion_constant > 0.0:
            rep_mode = cfg.spread_mode
            if rep_mode is None:
                rep_mode = (
                    "pallas" if jax.default_backend() == "tpu" else "scatter"
                )

            def _rep(p):
                if rep_mode == "pallas":
                    from .cells.pallas_repulsion import pallas_repulsion

                    # window overflow means silently dropped PAIRS —
                    # folded into the carried guard counter below
                    f, ovr = pallas_repulsion(
                        p, cell_gid, active, shape,
                        float(cfg.repulsion_constant),
                        float(cfg.repulsion_cutoff),
                    )
                    return f, ovr.astype(jnp.int32)
                return repulsion_forces(
                    p, cell_gid, active, shape,
                    cfg.repulsion_constant, cfg.repulsion_cutoff,
                ), jnp.zeros((), jnp.int32)
            frep, rep_overflow = _every(
                it, cfg.repulsion_every, _rep, pos_flat,
                (carried_rep, jnp.zeros((), jnp.int32)),
            )
        else:
            frep = carried_rep

        if (
            pos_flat is not None
            and cfg.boundary_repulsion_constant > 0.0
            and cfg.boundary_mask is not None
        ):
            def _brep(p):
                return boundary_repulsion_forces(
                    p, active, cfg.boundary_mask, shape,
                    cfg.boundary_repulsion_constant,
                    cfg.boundary_repulsion_cutoff,
                )
            if cfg.repulsion_constant > 0.0:
                # Inner recompute zeroes the carried force at its own
                # timescale (reference applyRepulsionForce,
                # hemoCellParticleField.cpp:703); boundary adds on top
                # (applyBoundaryRepulsionForce:911 only accumulates).
                fb = _every(it, cfg.boundary_repulsion_every, _brep,
                            pos_flat, jnp.zeros_like(pos_flat))
                frep = frep + fb
            else:
                # Boundary-only: nothing ever zeroes force_repulsion in
                # the reference (zeroing lives exclusively in
                # applyRepulsionForce, which never runs when inner
                # repulsion is off), so its carried force grows without
                # bound.  Deliberate deviation: the boundary recompute
                # REPLACES the carried value at its timescale.
                frep = _every(it, cfg.boundary_repulsion_every, _brep,
                              pos_flat, carried_rep)

        # scatter repulsion back into per-type state
        if frep is not None:
            offset = 0
            for k, cs in enumerate(cells):
                nc, nv = cs.pos.shape[0], cs.pos.shape[1]
                cnt = nc * nv
                cells[k] = cs._replace(
                    force_repulsion=frep[offset : offset + cnt].reshape(nc, nv, 3)
                )
                offset += cnt

        # ---- 2: spread particle forces + body force -----------------------
        # force_field stays None while the force is a uniform [3] body
        # force: the Pallas fluid kernel then takes it through SMEM instead
        # of a [3,X,Y,Z] field — 3 fewer HBM channels (x3 halo re-reads)
        # and VMEM headroom for a taller slab (_pick_tx).
        force_field = None
        bf_uniform = None  # uniform [3] body force while no field exists
        body_force = (
            state.body_force_state
            if state.body_force_state is not None
            else cfg.body_force
        )
        if body_force is not None:
            bf = jnp.asarray(body_force, dtype=cfg.dtype)
            if bf.ndim == 1:
                bf_uniform = bf
            else:
                force_field = jnp.zeros((3,) + shape, dtype=cfg.dtype) + bf

        def _mat_force(field):
            """Materialise the lazy force field before a non-uniform add."""
            if field is not None:
                return field
            field = jnp.zeros((3,) + shape, dtype=cfg.dtype)
            if bf_uniform is not None:
                field = field + bf_uniform[:, None, None, None]
            return field

        # One padded flat vertex batch for the whole IBM exchange: TPU
        # gathers need 128-aligned batches, and the binned dense spread
        # replaces XLA's serialised scatter.
        idx = w = None
        step_overflow = None  # slab-window overflow from this step's plan
        fused_hits = None  # per-cell wall-contact counts from the fused
        # spread pass (shadow + boundaries; see _spread_renorm_hit_kernel)
        if pos_flat is not None:
            P0 = pos_flat.shape[0]
            P_pad = -(-P0 // 512) * 512
            pad = P_pad - P0
            pos_pad = jnp.pad(pos_flat, ((0, pad), (0, 0)),
                              constant_values=0.5)
            act_pad = jnp.pad(active, (0, pad))
            if cfg.lees_edwards_velocity is not None:
                # Lees-Edwards image mapping: a vertex in z-image w sees the
                # fluid displaced by w*d(t) in x and moving at w*U
                le_w = jnp.floor(pos_pad[:, 2] / fshape[2])
                x_eff = pos_pad[:, 0] - le_w * state.le_displacement
                pos_w = jnp.stack(
                    [jnp.mod(x_eff, fshape[0]),
                     jnp.mod(pos_pad[:, 1], fshape[1]),
                     jnp.mod(pos_pad[:, 2], fshape[2])], axis=1)
            else:
                le_w = None
                pos_w = jnp.mod(pos_pad, fshape[None, :])
            mode = cfg.spread_mode
            if mode is None:
                mode = (
                    "pallas" if jax.default_backend() == "tpu" else "scatter"
                )
            # The Pallas mask channel reads the runtime flags, so solidify's
            # mutated walls renormalise correctly too.  The toolchain
            # stack-allocates the spread outputs in scoped VMEM, so
            # build_runner raises the per-jit scoped budget to cover them
            # (scoped_vmem_limit_kib); domains whose outputs exceed physical
            # VMEM (~128 MiB on v5e) fall back to the XLA scatter path —
            # shard such domains instead (parallel/sharded_step.py keeps
            # per-shard outputs small).
            use_pallas_ibm = mode == "pallas" and (
                cfg.spread_mode == "pallas"
                or scoped_vmem_limit_kib(cfg) < 114688
            )
            if use_pallas_ibm:
                from .ibm.pallas_ibm import (
                    _component_major,
                    build_ibm_plan,
                    pallas_interp,
                    pallas_interp_shadow,
                    pallas_spread,
                    pallas_spread_shadow,
                    slab_capacity,
                )
                from .ibm.pallas_ibm import SUBDIV as SHADOW_SUBDIV

                _interp_fn, _spread_fn = pallas_interp, pallas_spread
                ibm_capacity = (
                    cfg.ibm_capacity
                    if cfg.ibm_capacity is not None
                    else slab_capacity(P_pad, shape[0])
                )
                idx = w = wtot = None
                fluid_mask3 = (flags == 0).astype(cfg.dtype)
                # one x-slab sort per step (built at the spread site so the
                # forces ride the sort as payload), shared with interp;
                # boundary-aware renormalisation is fused into the spread
                # kernel (mask= argument) — no separate wtot interp pass
                ibm_plan = None
            else:
                # kernel computed once per step, reused for interpolation
                # (the reference caches kernelWeights the same way,
                #  core/immersedBoundaryMethod.h:62-138)
                idx, w, wtot = coupling.stencil(
                    pos_w, flags, weight_mask=act_pad, return_total=True,
                    has_boundaries=has_boundaries,
                )

            shadow_path = (
                use_pallas_ibm and shadow_mode and shadow is not None
            )
            if not shadow_path:
                # spread total = constitutive(capped) + repulsion
                # (core/hemoCellParticleField.cpp:841-863)
                ftot_parts = [
                    (
                        coupling.cap_force(
                            cs.force.reshape(-1, 3), cfg.f_limit
                        )
                        + cs.force_repulsion.reshape(-1, 3)
                    )
                    for cs in cells
                ]
                ftot = jnp.concatenate(ftot_parts)
                ftot = jnp.pad(ftot, ((0, pad), (0, 0)))

            if shadow_path:
                # amortised-resort: the sorted layout persists in ``shadow``;
                # this step only refreshes the sorted forces when the
                # canonical forces changed, and fully resorts on ``resync``
                P_pad_s = pos_w.shape[0]
                alive_cur = jnp.concatenate([cs.alive for cs in cells])

                def _fdep():
                    # [P] deposit arithmetic INSIDE the refresh branches
                    # only: as a cond closure value it would be a hoisted
                    # operand recomputed every step (~20 MB of [P] traffic
                    # wasted on carry steps — r05 machinery trim)
                    ftot_l = jnp.concatenate([
                        coupling.cap_force(
                            cs.force.reshape(-1, 3), cfg.f_limit
                        )
                        + cs.force_repulsion.reshape(-1, 3)
                        for cs in cells
                    ])
                    ftot_l = jnp.pad(ftot_l, ((0, pad), (0, 0)))
                    return ftot_l * act_pad[:, None]

                def _resync(_):
                    # global cell ids ride pos_cm row 3 for the wall-hit
                    # kernel's in-kernel per-cell reduction
                    cid_pad = jnp.pad(
                        cell_gid, (0, pad), constant_values=-1
                    ).astype(cfg.dtype)
                    plan = build_ibm_plan(
                        pos_w, shape, ibm_capacity, payload=_fdep(),
                        subdiv=SHADOW_SUBDIV, aux=cid_pad,
                    )
                    vel0 = jnp.pad(
                        jnp.concatenate(
                            [cs.vel.reshape(-1, 3) for cs in cells]
                        ),
                        ((0, pad), (0, 0)),
                    )
                    vel_cm = _component_major(
                        vel0[plan.order], ibm_capacity
                    )
                    act_cm = jnp.zeros(
                        P_pad_s + ibm_capacity, cfg.dtype
                    ).at[:P_pad_s].set(act_pad[plan.order])
                    return IbmShadow(plan, vel_cm, act_cm, alive_cur)

                def _carry(_):
                    plan = shadow.plan
                    # sorted forces refresh: constitutive forces change the
                    # step after each type's material update; repulsion
                    # changes on its own cadence within this step
                    pred = jnp.asarray(False)
                    for tc in cfg.types:
                        pred = pred | (
                            jnp.mod(it - 1, tc.material_every) == 0
                        )
                    if cfg.repulsion_constant > 0.0:
                        pred = pred | (jnp.mod(it, cfg.repulsion_every) == 0)
                    if (
                        cfg.boundary_repulsion_constant > 0.0
                        and cfg.boundary_mask is not None
                    ):
                        pred = pred | (
                            jnp.mod(it, cfg.boundary_repulsion_every) == 0
                        )
                    # wall-contact deletion can change `alive` any step;
                    # fdep and act_cm carry the act mask, so refresh when a
                    # deletion actually happened (the [P]-sized XLA gather
                    # by `order` costs ~as much as the saved sort, so an
                    # every-step refresh would negate the shadow — compare
                    # against the alive snapshot instead; deletions are
                    # rare events)
                    changed = jnp.any(alive_cur != shadow.alive)
                    pred = pred | changed
                    F_cm, act_cm = jax.lax.cond(
                        pred,
                        lambda _: (
                            _component_major(
                                _fdep()[plan.order], ibm_capacity
                            ),
                            jnp.zeros(
                                P_pad_s + ibm_capacity, cfg.dtype
                            ).at[:P_pad_s].set(act_pad[plan.order]),
                        ),
                        lambda _: (plan.payload_cm, shadow.act_cm),
                        None,
                    )
                    return IbmShadow(
                        plan._replace(payload_cm=F_cm),
                        shadow.vel_cm, act_cm, alive_cur,
                    )

                new_shadow = jax.lax.cond(resync, _resync, _carry, None)
                n_cells_tot = sum(cs.pos.shape[0] for cs in cells)
                # the per-cell one-hot reduction holds a [chunk, NCp]
                # one-hot in VMEM — cap the fused path at 2048 cells
                # (beyond it the gather-based deletion path takes over)
                hit_fusable = n_cells_tot <= 2048
                if has_boundaries and hit_fusable:
                    # wall-contact counts fused into the spread pass (same
                    # windows/iotas; saves the standalone 0.32 ms/it hit
                    # kernel).  Verdict positions = post-advance of the
                    # PREVIOUS step, so deletion lands one step after the
                    # reference's schedule (see _spread_renorm_hit_kernel).
                    field, fused_hits = pallas_spread_shadow(
                        new_shadow.plan, shape, ibm_capacity,
                        mm=cfg.ibm_mm, mask=fluid_mask3,
                        hit_cells=n_cells_tot,
                    )
                elif has_boundaries:
                    field = pallas_spread_shadow(
                        new_shadow.plan, shape, ibm_capacity,
                        mm=cfg.ibm_mm, mask=fluid_mask3,
                    )
                    # destination masking is fused in-kernel (r05)
                else:
                    field = pallas_spread_shadow(
                        new_shadow.plan, shape, ibm_capacity,
                        mm=cfg.ibm_mm, mask=None,
                    )
                force_field = _mat_force(force_field) + field
                step_overflow = new_shadow.plan.overflow
            elif use_pallas_ibm:
                fdep = ftot * act_pad[:, None]
                ibm_plan = build_ibm_plan(
                    pos_w, shape, ibm_capacity, payload=fdep
                )
                field, _ = _spread_fn(
                    pos_w, fdep, shape, capacity=ibm_capacity,
                    mask=fluid_mask3 if has_boundaries else None,
                    plan=ibm_plan, mm=cfg.ibm_mm,
                )
                # destination masking is fused in the renorm kernel (r05)
                force_field = _mat_force(force_field) + field
                step_overflow = ibm_plan.overflow
            elif mode == "binned":
                from .ibm.fast_spread import binned_spread, slab_capacity

                # renormalised deposit: scale by 1/(fluid weight total) and
                # mask the field to fluid nodes — identical to the
                # per-vertex boundary-aware renormalisation
                fdep = ftot * (
                    act_pad / jnp.maximum(wtot, 1e-30)
                )[:, None]
                field, ov_binned = binned_spread(
                    pos_pad, fdep, shape, slab_capacity(P_pad, shape[0])
                )
                fluid_mask = (flags == 0).astype(cfg.dtype)
                force_field = _mat_force(force_field) + field * fluid_mask[None]
                step_overflow = ov_binned
            else:
                force_field = _mat_force(force_field) + coupling.spread(
                    ftot, idx, w, shape, dtype=cfg.dtype
                )

        # ---- 2b: interior viscosity omega field ---------------------------
        omega = cfg.omega
        omega_field_new = state.omega_field
        if cfg.interior_every and state.omega_field is not None:
            from .cells.interior import interior_mask, membrane_omega_update

            def _recompute(_):
                om = jnp.full(shape, cfg.omega, dtype=cfg.dtype)
                for tc, cs in zip(cfg.types, cells):
                    if tc.omega_interior is None:
                        continue
                    # unwrapped positions: the local-box anchor needs a
                    # coherent min; the node scatter wraps periodically
                    m = interior_mask(
                        cs.pos, tc.topo["tri"], cs.alive, shape,
                        tc.interior_box,
                    )
                    om = jnp.where(m, tc.omega_interior, om)
                return om

            # full raycast at the (rare) entire-grid timescale; in between,
            # the cheap membrane-normal sweep re-tags only nodes the
            # surface passes over (core/hemoCellParticleField.cpp:746-807)
            entire = cfg.interior_entire_every or cfg.interior_every
            omega_field_new = _every(
                it, entire, _recompute, None, state.omega_field
            )
            if cfg.interior_entire_every and entire != cfg.interior_every:

                def _membrane(om):
                    for tc, cs in zip(cfg.types, cells):
                        if tc.omega_interior is None:
                            continue
                        om = membrane_omega_update(
                            om, cs.pos, tc.topo["tri"], cs.alive,
                            tc.omega_interior, cfg.omega,
                            tc.topo["edge_mean_eq"], shape,
                        )
                    return om

                omega_field_new = _every(
                    it, cfg.interior_every, _membrane,
                    omega_field_new, omega_field_new,
                )
            omega = omega_field_new

        # ---- 3: fluid collide + stream ------------------------------------
        # Pallas fast paths: keep the uniform body force in SMEM ([3] array;
        # force_field is None) and drop the flags operand on all-fluid
        # periodic boxes — fewer HBM channels and a taller _pick_tx slab.
        force_arg = force_field if force_field is not None else bf_uniform
        all_fluid = (
            not has_boundaries
            and not cfg.solidify_every
            and bc_velocity is None
            and cfg.bc_density is None
        )
        le_disp_new = state.le_displacement
        if cfg.lees_edwards_velocity is not None:
            use_pallas = cfg.use_pallas
            if use_pallas is None:
                use_pallas = jax.default_backend() == "tpu"
            if use_pallas:
                from .fluid.lees_edwards import le_stream_collide_pallas

                f_new = le_stream_collide_pallas(
                    state.f, _mat_force(force_field), omega,
                    state.le_displacement, cfg.lees_edwards_velocity,
                )
            else:
                from .fluid.lees_edwards import le_stream_collide

                f_new = le_stream_collide(
                    state.f, _mat_force(force_field), omega,
                    state.le_displacement, cfg.lees_edwards_velocity,
                )
            # wrap by X: only disp mod X enters the image shift and the
            # particle mapping (le_w is an integer image count), and an
            # unbounded f32 accumulator loses precision over long shears
            le_disp_new = jnp.mod(
                state.le_displacement + cfg.lees_edwards_velocity, fshape[0]
            )
        else:
            use_pallas = cfg.use_pallas
            if use_pallas is None:
                use_pallas = jax.default_backend() == "tpu"
            if cfg.fold > 1:
                from .fluid.pallas_lbm import (
                    fold_field,
                    stream_collide_pallas,
                )

                # keep force_field in the folded layout for the post-fluid
                # macroscopic/stress consumers (f_new is folded)
                if force_field is not None:
                    force_field = fold_field(force_field, cfg.fold)
                f_new = stream_collide_pallas(
                    state.f,
                    force_field if force_field is not None else force_arg,
                    omega,
                    None if all_fluid else fold_field(flags, cfg.fold),
                    fold_field(bc_velocity, cfg.fold)
                    if bc_velocity is not None else None,
                    bc_density=cfg.bc_density, fold=cfg.fold,
                )
            elif use_pallas:
                from .fluid.pallas_lbm import stream_collide_pallas

                f_new = stream_collide_pallas(
                    state.f, force_arg, omega,
                    None if all_fluid else flags, bc_velocity,
                    bc_density=cfg.bc_density,
                )
            else:
                f_new = lbm.stream_collide(
                    state.f, _mat_force(force_field), omega, flags,
                    bc_velocity, bc_density=cfg.bc_density,
                )

        # post-fluid consumers (CEPAC/interp macroscopic, Tresca stress)
        # take the force as a broadcastable view when it stayed uniform
        if force_field is None and bf_uniform is not None:
            force_field = bf_uniform[:, None, None, None]

        # ---- 3b: CEPAC advection-diffusion (one-way velocity coupling) ----
        cepac_new = state.cepac
        if cfg.cepac_tau is not None and state.cepac is not None:
            from .fluid.advection_diffusion import (
                ad_stream_collide,
                ad_stream_collide_pallas,
            )

            use_pallas_ad = cfg.use_pallas
            if use_pallas_ad is None:
                use_pallas_ad = jax.default_backend() == "tpu"
            _, u_ad = lbm.macroscopic(f_new, force_field)
            ad_fn = ad_stream_collide_pallas if use_pallas_ad \
                else ad_stream_collide
            cepac_new = ad_fn(
                state.cepac, u_ad, cfg.cepac_tau,
                cfg.cepac_dirichlet_mask, cfg.cepac_dirichlet_value,
            )

        # ---- 4: interpolate fluid velocity to vertices --------------------
        if cells and pos_flat is not None and shadow_mode and \
                use_pallas_ibm and shadow is not None:
            sh = new_shadow

            def _interp_sh(_unused):
                _, u = lbm.macroscopic(f_new, force_field)
                if cfg.fold > 1:
                    from .fluid.pallas_lbm import unfold_field

                    u = unfold_field(u, cfg.fold)
                if has_boundaries:
                    # boundary-aware renorm: interpolate [u*mask, mask] and
                    # divide by the fluid-weight total, in both layouts
                    fields4 = jnp.concatenate(
                        [u * fluid_mask3[None], fluid_mask3[None]]
                    )
                    v4, v4_cm = pallas_interp_shadow(
                        sh.plan, fields4, shape, ibm_capacity, mm=cfg.ibm_mm
                    )
                    vals = v4[:, :3] / jnp.maximum(v4[:, 3:4], 1e-30)
                    vals_cm = v4_cm.at[:3].set(
                        v4_cm[:3] / jnp.maximum(v4_cm[3:4], 1e-30)
                    )
                else:
                    vals, vals_cm = pallas_interp_shadow(
                        sh.plan, u, shape, ibm_capacity, mm=cfg.ibm_mm
                    )
                return (
                    vals * act_pad[:, None],
                    vals_cm * sh.act_cm[None, :],
                )

            vel_fallback = jnp.pad(
                jnp.concatenate([cs.vel.reshape(-1, 3) for cs in cells]),
                ((0, pad), (0, 0)),
            )
            vel_flat, vel_cm_new = _every(
                it, cfg.particle_every, _interp_sh, None,
                (vel_fallback, sh.vel_cm),
            )
            new_shadow = IbmShadow(sh.plan, vel_cm_new, sh.act_cm, sh.alive)
            offset = 0
            for k, cs in enumerate(cells):
                nc, nv = cs.pos.shape[0], cs.pos.shape[1]
                cnt = nc * nv
                cells[k] = cs._replace(
                    vel=vel_flat[offset : offset + cnt].reshape(nc, nv, 3)
                )
                offset += cnt
        elif cells and pos_flat is not None:

            def _interp(_unused):
                _, u = lbm.macroscopic(f_new, force_field)
                if cfg.fold > 1:
                    from .fluid.pallas_lbm import unfold_field

                    u = unfold_field(u, cfg.fold)
                if use_pallas_ibm:
                    if has_boundaries:
                        fields4 = jnp.concatenate(
                            [u * fluid_mask3[None], fluid_mask3[None]]
                        )
                        v4, _ = _interp_fn(
                            pos_w, fields4, shape, capacity=ibm_capacity,
                            plan=ibm_plan, mm=cfg.ibm_mm,
                        )
                        v = v4[:, :3] / jnp.maximum(v4[:, 3:4], 1e-30)
                    else:
                        v, _ = _interp_fn(pos_w, u, shape,
                                          capacity=ibm_capacity,
                                          plan=ibm_plan, mm=cfg.ibm_mm)
                    v = v * act_pad[:, None]
                else:
                    v = coupling.interpolate(u, idx, w)
                if cfg.lees_edwards_velocity is not None:
                    # galilean frame shift of the wrapped image — INSIDE
                    # the interp step: the carried velocity already holds
                    # its own shift, so adding per iteration would
                    # double-count on off-steps (particle_every > 1)
                    v = v.at[:, 0].add(le_w * cfg.lees_edwards_velocity)
                return v

            vel_fallback = jnp.pad(
                jnp.concatenate([cs.vel.reshape(-1, 3) for cs in cells]),
                ((0, pad), (0, 0)),
            )
            vel_flat = _every(
                it, cfg.particle_every, _interp, None, vel_fallback
            )
            offset = 0
            for k, cs in enumerate(cells):
                nc, nv = cs.pos.shape[0], cs.pos.shape[1]
                cnt = nc * nv
                cells[k] = cs._replace(
                    vel=vel_flat[offset : offset + cnt].reshape(nc, nv, 3)
                )
                offset += cnt

        # ---- 4b: solidify mechanics ---------------------------------------
        flags_new = state.flags_state
        binding_new = state.binding_mask
        if cfg.solidify_every and state.flags_state is not None:
            from .cells.interior import interior_mask
            from .fluid.tresca import tresca_field

            def _solidify(args):
                flags_s, binding, cell_list = args
                cell_list = list(cell_list)
                # phase A (solidifyMechanics, pltSimpleModel.cpp:211-248):
                # cells tagged last round harden: interior -> bounce-back +
                # binding sites; the cell is removed
                for k, (tc, cs) in enumerate(zip(cfg.types, cell_list)):
                    if not tc.solidify:
                        continue
                    marked = cs.solidify & cs.alive
                    interior = interior_mask(
                        cs.pos, tc.topo["tri"], marked, shape, tc.interior_box
                    )
                    interior = interior & (flags_s == 0)
                    flags_s = jnp.where(
                        interior, jnp.uint8(1), flags_s
                    )
                    binding = binding | interior
                    cell_list[k] = cs._replace(
                        alive=cs.alive & ~marked,
                        solidify=cs.solidify & ~marked,
                    )
                # phase B (solidifyCells, hemoCellParticleField.cpp:1018-1070):
                # vertices near a binding site under sufficient Tresca shear
                # tag their cell
                tresca = jnp.abs(
                    tresca_field(f_new, force_field, omega) / 1e-7
                )
                nbr = jnp.asarray(
                    np.array(
                        [
                            [i, j, k]
                            for i in (-1, 0, 1)
                            for j in (-1, 0, 1)
                            for k in (-1, 0, 1)
                        ],
                        dtype=np.int32,
                    )
                )
                shp_i = jnp.asarray(shape, jnp.int32)
                for k, (tc, cs) in enumerate(zip(cfg.types, cell_list)):
                    if not tc.solidify:
                        continue
                    nc, nv = cs.pos.shape[0], cs.pos.shape[1]
                    p = jnp.mod(cs.pos.reshape(-1, 3), fshape[None, :])
                    node = jnp.mod(
                        jnp.floor(p + 0.5).astype(jnp.int32), shp_i[None, :]
                    )
                    nn = jnp.mod(
                        node[:, None, :] + nbr[None, :, :], shp_i[None, None, :]
                    )
                    b = binding[nn[..., 0], nn[..., 1], nn[..., 2]]
                    t = tresca[nn[..., 0], nn[..., 1], nn[..., 2]]
                    dv = p[:, None, :] - nn.astype(cfg.dtype)
                    dv = dv - jnp.round(dv / fshape) * fshape
                    dist = jnp.linalg.norm(dv, axis=-1)
                    hit = (
                        b
                        & (dist <= tc.distance_threshold)
                        & (t > tc.shear_threshold)
                    )
                    vert_hit = jnp.any(hit, axis=1).reshape(nc, nv)
                    cell_hit = jnp.any(vert_hit, axis=1) & cs.alive
                    cell_list[k] = cs._replace(
                        solidify=cs.solidify | cell_hit
                    )
                return flags_s, binding, tuple(cell_list)

            flags_new, binding_new, new_cells = _every(
                it, cfg.solidify_every, _solidify,
                (state.flags_state, state.binding_mask, tuple(cells)),
                (state.flags_state, state.binding_mask, tuple(cells)),
            )
            cells = list(new_cells)
            flags = flags_new

        # ---- 5: advance + boundary-contact deletion -----------------------
        # shadow advance FIRST (same Euler update in the sorted layout;
        # positions drift unwrapped, the widened kernel windows absorb it):
        # the advanced pos_cm mirrors new_pos bit-for-bit, so the wall-hit
        # kernel below tests the same post-advance positions the reference
        # tests (core/hemoCellParticleField.cpp:566-588)
        hit_counts = None
        if shadow_mode and new_shadow is not None and \
                isinstance(new_shadow, IbmShadow):
            plan2 = new_shadow.plan._replace(
                pos_cm=new_shadow.plan.pos_cm.at[:3].add(
                    new_shadow.vel_cm[:3]
                )
            )
            new_shadow = new_shadow._replace(plan=plan2)
            if has_boundaries and fused_hits is not None:
                # r05: the counts were computed IN the spread pass (same
                # windows), replacing the standalone nearest-node kernel
                # (0.32 ms/it); deletion is one step deferred vs the
                # reference schedule (see _spread_renorm_hit_kernel)
                hit_counts = fused_hits
            elif has_boundaries and pos_flat is not None and \
                    use_pallas_ibm and \
                    sum(cs.pos.shape[0] for cs in cells) <= 2048:
                # per-cell wall-contact counts via the Pallas nearest-node
                # kernel: replaces a [P] arbitrary flags gather that
                # measured 1.86 ms/it (47% of the step) on pipeflow30.
                # Same [chunk, NCp] one-hot VMEM cap as the fused path;
                # larger suspensions use the on_boundary gather below.
                from .ibm.pallas_ibm import pallas_wall_hit_cells

                wall01 = (flags != 0).astype(cfg.dtype)
                hit_counts = pallas_wall_hit_cells(
                    plan2, wall01, shape, ibm_capacity,
                    n_cells=sum(cs.pos.shape[0] for cs in cells),
                )

        cell_off = 0
        for k, cs in enumerate(cells):
            if cfg.material_integration == 2 and cs.vel_prev is not None:
                # Adams-Bashforth (hemoCellParticle.h:197-200)
                new_pos = cs.pos + 1.5 * cs.vel - 0.5 * cs.vel_prev
                cs = cs._replace(vel_prev=cs.vel)
            else:
                new_pos = cs.pos + cs.vel  # Euler (hemoCellParticle.h:188-203)
            nc, nv = new_pos.shape[0], new_pos.shape[1]
            if has_boundaries and hit_counts is not None:
                cell_hit = hit_counts[cell_off: cell_off + nc] > 0.5
                alive = cs.alive & ~cell_hit
            elif has_boundaries:
                hit = coupling.on_boundary(
                    jnp.mod(new_pos.reshape(-1, 3), fshape[None, :]), flags
                ).reshape(nc, nv)
                alive = cs.alive & ~jnp.any(hit, axis=1)
            else:
                alive = cs.alive
            cell_off += nc
            restime = cs.restime
            if restime is not None:
                # residence time: iterations alive (hemoCellParticle.h:45-63)
                restime = restime + alive.astype(jnp.int32)
            cells[k] = cs._replace(pos=new_pos, alive=alive, restime=restime)

        # ---- 6: constitutive model ----------------------------------------
        for k, (tc, cs) in enumerate(zip(cfg.types, cells)):
            def _mech(args, tc=tc, cs=cs):
                p, v = args
                ft = jax.vmap(
                    lambda pp, vv: tc.model_fn(pp, vv, tc.topo, tc.material).total
                )(p, v)
                if tc.ext_force is not None:
                    ft = ft + tc.ext_force
                # dead slots may hold degenerate geometry (NaN forces);
                # where (not multiply) so NaN*0 can't leak
                return jnp.where(cs.alive[:, None, None], ft, 0.0)

            force = _every(
                it, tc.material_every, _mech, (cs.pos, cs.vel), cs.force
            )
            cells[k] = cs._replace(force=force)

        # running-max IBM window overflow: kept only when the incoming state
        # carries the counter (so old pytrees / checkpoints stay valid)
        ov_new = state.ibm_overflow
        if ov_new is not None and step_overflow is not None:
            ov_new = jnp.maximum(ov_new, step_overflow.astype(jnp.int32))
        if ov_new is not None and rep_overflow is not None:
            ov_new = jnp.maximum(ov_new, rep_overflow)
        out_state = SimState(f=f_new, it=it + 1, cells=tuple(cells),
                             cepac=cepac_new, omega_field=omega_field_new,
                             flags_state=flags_new, binding_mask=binding_new,
                             bc_state=state.bc_state,
                             body_force_state=state.body_force_state,
                             le_displacement=le_disp_new,
                             ibm_overflow=ov_new)
        if shadow_mode:
            return out_state, new_shadow
        return out_state

    return step


def shadow_active(cfg: StepConfig) -> bool:
    """True when the amortised-resort IBM shadow runs for this config:
    non-LE, pallas spread, resort_every > 1.  Walled domains are supported
    (the shadow spread renormalises in-kernel against the static fluid
    mask); solidify is not (it mutates the flags and deletes cells at its
    own cadence)."""
    if cfg.resort_every <= 1 or cfg.lees_edwards_velocity is not None:
        return False
    if cfg.material_integration != 1:
        # the shadow advance mirrors plain Euler (pos_cm += vel_cm)
        return False
    if bool(cfg.solidify_every):
        return False
    mode = cfg.spread_mode
    if mode is None:
        mode = "pallas" if jax.default_backend() == "tpu" else "scatter"
    return mode == "pallas" and scoped_vmem_limit_kib(cfg) < 114688


def scoped_vmem_limit_kib(cfg: StepConfig) -> int:
    """Scoped-VMEM compiler limit for this step's program.

    The TPU toolchain stack-allocates pallas custom-call outputs in scoped
    VMEM; the [X,3,Y,Z] spread outputs at >=128^3 exceed the default
    16 MiB budget and the compile fails (the allocator errors rather than
    falling back to HBM).  The fix is to RAISE the per-jit budget to cover
    the outputs plus the fused stream-collide kernel's window buffers
    (~8 double-buffered [19,1,Y,Z] rows) — v5e has 128 MiB of VMEM per
    core, far above the default cap.
    """
    X, Y, Z = (int(s) for s in cfg.shape)
    itemsize = jnp.dtype(cfg.dtype).itemsize
    spread_outputs = 2 * X * 3 * Y * Z * itemsize
    fluid_rows = 19 * Y * Z * itemsize * 8
    need_kib = -(-(spread_outputs + fluid_rows) // 1024) + 8192
    return min(max(16384, need_kib), 114688)


def pick_fold(cfg: StepConfig) -> int:
    """Lane-fold factor for the fluid state (fluid/pallas_lbm.fold_field):
    largest k packing k x-planes into the 128-lane tile.  Only for plain
    single-chip Pallas runs — features that touch f in canonical layout
    (Lees-Edwards planes, CEPAC coupling, solidify Tresca, interior-omega
    field) keep fold = 1."""
    if jax.default_backend() != "tpu" or cfg.use_pallas is False:
        return 1
    if cfg.lees_edwards_velocity is not None or cfg.cepac_tau is not None:
        return 1
    if cfg.interior_every or cfg.solidify_every:
        return 1
    if jnp.ndim(cfg.omega) != 0:
        # spatially varying omega field is kept in canonical [X,Y,Z] layout
        return 1
    X, Y, Z = (int(v) for v in cfg.shape)
    for k in (8, 4, 2):
        if X % k == 0 and k * Z <= 128:
            return k
    return 1


def build_runner(cfg: StepConfig):
    """jitted (state, n) -> state advancing n iterations."""
    import dataclasses

    K_fold = pick_fold(cfg)
    if K_fold > 1:
        cfg = dataclasses.replace(cfg, fold=K_fold)
    step = build_step(cfg)

    # multi-step fused fluid kernel (pure-fluid runs only): supported when
    # the per-iteration state change is exactly {f, it} and the kernel's
    # restrictions hold (scalar omega, canonical layout, no BCs/LE/CEPAC/
    # interior/solidify, uniform body force)
    K_FLUID = 4 if cfg.fluid_k is None else int(cfg.fluid_k)
    use_2x = cfg.fluid_2x
    if use_2x is None:
        use_2x = jax.default_backend() == "tpu"
    use_2x = bool(
        use_2x
        and K_FLUID >= 2
        and cfg.use_pallas is not False
        and K_fold == 1
        and cfg.lees_edwards_velocity is None
        and cfg.cepac_tau is None
        and not cfg.interior_every
        and not cfg.solidify_every
        and cfg.bc_velocity is None
        and cfg.bc_density is None
        and jnp.ndim(cfg.omega) == 0
        and (cfg.body_force is None or np.ndim(cfg.body_force) == 1)
    )
    flags_any = bool(np.asarray(cfg.flags).any())

    def _fluid_loop(st: SimState, n: int) -> SimState:
        # carry ONLY the population field through the loop: carrying the
        # full SimState pytree was observed to nondeterministically
        # compile to a ~0.6 ms/it slower program at 128^3 (an extra
        # buffer copy per iteration when XLA fails to alias the pallas
        # output into the multi-element carry) — f-only is always fast
        from .fluid.pallas_lbm_2x import stream_collide_pallas_2x
        from .fluid.pallas_lbm_kx import stream_collide_pallas_kx

        bf = (
            st.body_force_state
            if st.body_force_state is not None
            else cfg.body_force
        )
        if bf is not None:
            bf = jnp.asarray(bf, dtype=cfg.dtype)
        omega = jnp.asarray(cfg.omega, cfg.dtype)
        flags = cfg.flags if flags_any else None

        def _fluidk(f, k):
            if k == 2:
                return stream_collide_pallas_2x(f, bf, omega, flags)
            return stream_collide_pallas_kx(f, bf, omega, flags, k=k)

        nk, rem = divmod(n, K_FLUID)
        f = st.f
        if nk:
            f = jax.lax.fori_loop(
                0, nk, lambda _, ff: _fluidk(ff, K_FLUID), f
            )
        # remainder (< K_FLUID by construction): one fused piece, bitwise
        # equal to the same number of one-pass steps; a final odd single
        # step falls to the caller's step() (rem is static — n is static)
        if rem >= 2:
            f = _fluidk(f, rem)
            rem = 0
        st = st._replace(f=f, it=st.it + (n - rem))
        return st, rem

    def _pure_fluid_ok(state: SimState) -> bool:
        # trace-time (pytree-structure) checks: no live vertices, no
        # dynamic overrides the 2x path ignores
        P0 = sum(cs.pos.shape[0] * cs.pos.shape[1] for cs in state.cells)
        return (
            use_2x
            and P0 == 0
            and state.bc_state is None
            and state.cepac is None
            and state.omega_field is None
            and state.flags_state is None
            and (
                state.body_force_state is None
                or np.ndim(state.body_force_state) == 1
            )
        )

    from .fluid.pallas_lbm import fold_field, unfold_field

    def _enter(state: SimState) -> SimState:
        if K_fold > 1:
            return state._replace(f=fold_field(state.f, K_fold))
        return state

    def _exit(state: SimState) -> SimState:
        if K_fold > 1:
            return state._replace(f=unfold_field(state.f, K_fold))
        return state

    # Only cap the scoped budget when the spread outputs are too big to
    # stack-allocate under the toolchain's default budget; small domains
    # keep the default (VMEM-resident outputs are faster there).
    from .ibm.pallas_ibm import pallas_ibm_fits

    opts = None
    if (
        jax.default_backend() == "tpu"
        and cfg.use_pallas is not False
        and not pallas_ibm_fits(cfg.shape)
    ):
        opts = {"xla_tpu_scoped_vmem_limit_kib": scoped_vmem_limit_kib(cfg)}

    if not shadow_active(cfg):

        @partial(jax.jit, static_argnums=(1,), compiler_options=opts)
        def run(state: SimState, n: int) -> SimState:
            st = _enter(state)
            if _pure_fluid_ok(state):
                st, rem = _fluid_loop(st, n)
                if rem:
                    st = step(st)
                return _exit(st)
            return _exit(
                jax.lax.fori_loop(0, n, lambda _, s: step(s), st)
            )

        return run

    # amortised-resort shadow: the sorted IBM layout lives in the loop carry
    # (ephemeral per runner call — SimState and checkpoints are unchanged);
    # a full resort happens at entry and then every cfg.resort_every steps
    from .ibm.pallas_ibm import IbmPlanT, slab_capacity

    K = int(cfg.resort_every)
    X = int(cfg.shape[0])

    @partial(jax.jit, static_argnums=(1,), compiler_options=opts)
    def run(state: SimState, n: int) -> SimState:
        P0 = sum(
            cs.pos.shape[0] * cs.pos.shape[1] for cs in state.cells
        )
        if P0 == 0:
            st = _enter(state)
            if _pure_fluid_ok(state):
                st, rem = _fluid_loop(st, n)
                if rem:
                    st = step(st, None, None)[0]
                return _exit(st)
            return _exit(jax.lax.fori_loop(
                0, n, lambda _, s: step(s, None, None)[0], st
            ))
        P_pad = -(-P0 // 512) * 512
        C = (
            cfg.ibm_capacity
            if cfg.ibm_capacity is not None
            else slab_capacity(P_pad, X)
        )
        from .ibm.pallas_ibm import SUBDIV as _SD

        plan0 = IbmPlanT(
            starts=jnp.zeros(X * _SD + 1, jnp.int32),
            pos_cm=jnp.zeros((4, P_pad + C), cfg.dtype),
            order=jnp.zeros(P_pad, jnp.int32),
            ix_s=jnp.zeros(P_pad, jnp.int32),
            overflow=jnp.zeros((), jnp.int32),
            payload_cm=jnp.zeros((4, P_pad + C), cfg.dtype),
        )
        shadow0 = IbmShadow(
            plan=plan0,
            vel_cm=jnp.zeros((4, P_pad + C), cfg.dtype),
            act_cm=jnp.zeros(P_pad + C, cfg.dtype),
            alive=jnp.zeros(
                sum(cs.alive.shape[0] for cs in state.cells), bool
            ),
        )

        def body(i, carry):
            st, sh = carry
            st2, sh2 = step(st, sh, jnp.mod(i, K) == 0)
            return (st2, sh2)

        out, _ = jax.lax.fori_loop(0, n, body, (_enter(state), shadow0))
        return _exit(out)

    return run


def initial_sim_state(cfg: StepConfig, cell_states: Sequence[CellTypeState],
                      rho0=1.0, u0=(0.0, 0.0, 0.0), cepac0=None) -> SimState:
    f = lbm.initial_state(cfg.shape, rho0=rho0, u0=u0, dtype=cfg.dtype)
    cepac = None
    if cfg.cepac_tau is not None:
        from .fluid.advection_diffusion import ad_initial_state

        cepac = ad_initial_state(
            cfg.shape, conc0=cepac0 if cepac0 is not None else 0.0,
            dtype=cfg.dtype,
        )
    omega_field = None
    if cfg.interior_every:
        omega_field = jnp.full(cfg.shape, cfg.omega, dtype=cfg.dtype)
    le_disp = None
    if cfg.lees_edwards_velocity is not None:
        le_disp = jnp.asarray(0.0, cfg.dtype)
    flags_state = binding = None
    if cfg.solidify_every:
        from .cells.repulsion import boundary_neighbor_mask

        flags_state = jnp.asarray(cfg.flags)
        binding = (
            jnp.asarray(boundary_neighbor_mask(np.asarray(cfg.flags))) > 0
        )
    return SimState(f=f, it=jnp.asarray(0, jnp.int32), cells=tuple(cell_states),
                    cepac=cepac, omega_field=omega_field,
                    flags_state=flags_state, binding_mask=binding,
                    le_displacement=le_disp,
                    ibm_overflow=jnp.asarray(0, jnp.int32))
