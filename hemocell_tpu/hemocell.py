"""The HemoCell facade: owns fluid + cell fields + config, exposes the same
workflow as the reference ``HemoCell`` class (hemocell.h:68-253,
core/hemoCell.cpp): construct from XML config, initialize lattice, add cell
types, load particle positions, iterate, write output, checkpoint.

The compiled step (dynamics.build_runner) is rebuilt lazily whenever the
static configuration changes; iteration state lives in a ``SimState`` pytree
so the whole loop runs on device.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cells.repulsion import boundary_neighbor_mask
from .cells.state import (
    CellTypeState,
    filter_wall_overlaps,
    load_pos_file,
    make_cell_state,
    place_cells,
)
from .config import Config, Parameters
from .config.defaults import FLAG_FLUID, FLAG_WALL
from .dynamics import SimState, StepConfig, TypeConfig, build_runner, initial_sim_state
from .fluid import lbm
from .mechanics import (
    MODEL_REGISTRY,
    convert_material,
    material_dict,
    topology_device_arrays,
)
from .mesh import MeshMetrics, build_topology, construct_mesh
from .utils import cellinfo
from .utils.profiler import Profiler


@dataclass
class CellType:
    """One cell species: template mesh + topology + material + model
    (reference: core/hemoCellField.{h,cpp} HemoCellField)."""

    name: str
    ctype: int
    model_name: str
    mesh: object
    topo: object
    topo_dev: dict
    material: dict
    material_cfg: object
    timescale: int = 1  # stepMaterialEvery
    ext_force: Optional[np.ndarray] = None
    volume_um3: float = 0.0
    minimum_distance_from_solid_um: float = 0.0
    # interior viscosity (1/tau inside the membrane; None = off)
    omega_interior: Optional[float] = None
    # solidify mechanics
    solidify: bool = False
    distance_threshold: float = 0.0
    shear_threshold: float = 0.0

    @property
    def num_vertices(self):
        return self.mesh.num_vertices


class HemoCell:
    def __init__(self, config_path: Optional[str] = None, params: Optional[Parameters] = None):
        from .utils.logfile import print_header

        print_header()  # reference: printHeader() at HemoCell ctor
        self.cfg = Config(config_path) if config_path else None
        if params is not None:
            self.params = params
        elif self.cfg is not None:
            self.params = Parameters.from_config(self.cfg)
        else:
            raise ValueError("need config_path or params")
        self.dtype = jnp.float32
        self.iter = 0
        self.cell_types: list[CellType] = []
        self.cell_states: list[CellTypeState] = []
        self.shape = None
        self.flags = None
        self.bc_velocity = None
        self.body_force = None
        self.omega = 1.0 / self.params.tau
        self.periodicity = (True, True, True)
        self.profiler = Profiler("hemocell")
        # timescales (reference: cellfields setters, hemocell.h:139-151)
        self.particle_every = (
            self.cfg["ibm"].get("stepParticleEvery", int, 1) if self.cfg and "ibm" in self.cfg else 1
        )
        self._default_material_every = (
            self.cfg["ibm"].get("stepMaterialEvery", int, 1) if self.cfg and "ibm" in self.cfg else 1
        )
        # repulsion off by default (reference: enableRepulsion flags)
        self.repulsion_constant = 0.0
        self.repulsion_cutoff = 0.0
        self.repulsion_every = 1
        self.boundary_repulsion_constant = 0.0
        self.boundary_repulsion_cutoff = 0.0
        self.boundary_repulsion_every = 1
        self.interior_every = 0  # interiorViscosityTimescale (0 = off)
        self.interior_entire_every = 0  # interiorViscosityEntireGrid
        self.solidify_every = 0  # solidifyTimescale (0 = off)
        self.cepac_tau = None
        self._state: Optional[SimState] = None
        self._runner = None
        self._dirty = True
        self.outdir = None

    # ------------------------------------------------------------------
    # setup

    def initialize_lattice(self, shape=None, flags=None, rho0=1.0, u0=(0, 0, 0)):
        """Dense lattice from a shape or a voxelized flag matrix
        (reference: HemoCell::initializeLattice, core/hemoCell.cpp:438-571 —
        sparse block decomposition is replaced by one dense sharded array)."""
        if flags is not None:
            flags = np.asarray(flags, dtype=np.uint8)
            shape = flags.shape
            from .config.defaults import FLAG_FLUID

            if not (flags == FLAG_FLUID).any():
                raise ValueError(
                    "flag matrix contains no fluid nodes — geometry bug? "
                    f"(shape {shape})"
                )
        else:
            flags = np.zeros(shape, dtype=np.uint8)
        self.shape = tuple(int(s) for s in shape)
        self.flags = jnp.asarray(flags)
        self._rho0, self._u0 = rho0, u0
        self._dirty = True

    def latticeEquilibrium(self, rho, u):
        self._rho0, self._u0 = rho, tuple(u)
        self._dirty = True

    def initializeCellfield(self):
        """Kept for API parity; cell fields are created on add_cell_type."""

    def add_cell_type(self, name: str, model: str = "RbcHighOrderModel",
                      construct_type: Optional[str] = None):
        """Read ``<name>.xml`` next to the config and build the template
        (reference: HemoCell::addCellType<Mechanics>, hemocell.h:122-128 +
        core/hemoCellField.cpp:38-120)."""
        base = self.cfg.directory if self.cfg else "."
        xml_path = os.path.join(base, name + ".xml")
        mat_cfg = Config(xml_path)["MaterialModel"]
        if construct_type is None:
            construct_type = {
                "RbcHighOrderModel": "RBC_FROM_SPHERE",
                "RbcMalariaModel": "RBC_FROM_SPHERE",
                "WbcHighOrderModel": "WBC_SPHERE",
                "PltSimpleModel": "ELLIPSOID_FROM_SPHERE",
                "NoOp": "ELLIPSOID_FROM_SPHERE",
            }[model]
        radius_lu = mat_cfg["radius"].read(float) / self.params.dx
        min_tri = mat_cfg.get("minNumTriangles", int, 600)
        aspect = mat_cfg.get("aspectRatio", float, 0.3)
        stl_file = mat_cfg.get("StlFile", str, None)
        if stl_file:
            construct_type = "MESH_FROM_STL"
            stl_file = os.path.join(base, stl_file)
        mesh = construct_mesh(construct_type, radius_lu, min_tri, aspect, stl_file)

        inner = None
        if "InnerEdges" in mat_cfg:
            if construct_type == "MESH_FROM_STL":
                # STL-based cells (e.g. the malaria gametocyte,
                # cases/pipeflowMalaria/RBC_MALARIA.xml): the ids index the
                # STL's own deduplicated vertex set, which we reproduce —
                # use them directly when in range.
                ids = np.array(
                    [
                        [int(a), int(b)]
                        for a, b in (
                            e.text.split()
                            for e in mat_cfg["InnerEdges"].children("Edge")
                        )
                    ],
                    dtype=np.int64,
                )
                if ids.size and ids.max() < mesh.num_vertices:
                    inner = ids
            if inner is None:
                # Template meshes: the reference XMLs hard-code vertex-id
                # pairs tied to the Palabos dedup ordering ("TODO: make it
                # automatic", commonCellConstants.cpp:142).  We derive the
                # transverse stiffening pairs geometrically instead: mirror
                # pairs across the disc plane — ordering-independent and
                # exhaustive.
                from .mesh.generate import mirror_inner_edges

                inner = mirror_inner_edges(mesh, axis=1)
            if inner is not None and len(inner) == 0:
                inner = None
        topo = build_topology(mesh, inner_edges=inner)
        material = material_dict(
            convert_material(mat_cfg, self.params, mesh.num_triangles)
        )
        ct = CellType(
            name=name,
            ctype=len(self.cell_types),
            model_name=model,
            mesh=mesh,
            topo=topo,
            topo_dev=topology_device_arrays(topo, dtype=self.dtype),
            material=material,
            material_cfg=mat_cfg,
            timescale=self._default_material_every,
            volume_um3=mat_cfg.get("Volume", float, 0.0),
            minimum_distance_from_solid_um=mat_cfg.get(
                "minimumDistanceFromSolid", float, 0.0
            ),
        )
        self.cell_types.append(ct)
        self.cell_states.append(make_cell_state(np.zeros((0, mesh.num_vertices, 3)),
                                                dtype=self.dtype))
        self._dirty = True
        # honour <enableInteriorViscosity> in the material XML (reference:
        # tools/cell_templates/RBC_template.xml keys); the two timescales
        # come from the main config's <sim> block (reference
        # cellCollision_interior_viscosity/config.xml)
        if mat_cfg.get("enableInteriorViscosity", int, 0):
            every, entire = 10, 0
            if self.cfg is not None and "sim" in self.cfg:
                every = self.cfg["sim"].get("interiorViscosity", int, 10)
                entire = self.cfg["sim"].get(
                    "interiorViscosityEntireGrid", int, 0
                )
            self.enable_interior_viscosity(
                len(self.cell_types) - 1, every=every, entire_every=entire
            )
        return ct

    def load_particles(self, pos_dir: Optional[str] = None,
                       allow_missing: bool = False):
        """Load ``<name>.pos`` per cell type, place template meshes, drop
        cells overlapping walls (reference: HemoCell::loadParticles,
        core/hemoCell.cpp:191-197 + io/readPositionsBloodCells.cpp).

        A missing ``.pos`` file raises (the reference aborts); pass
        ``allow_missing=True`` for the run-packCells-first workflow."""
        base = pos_dir or (self.cfg.directory if self.cfg else ".")
        um_to_lu = 1e-6 / self.params.dx
        for k, ct in enumerate(self.cell_types):
            path = os.path.join(base, ct.name + ".pos")
            if not os.path.exists(path):
                if not allow_missing:
                    raise FileNotFoundError(
                        f"{path} not found - generate positions with "
                        f"tools/packcells, or pass allow_missing=True "
                        f"to run cell-free")
                print(f"(HemoCell) warning: {path} not found - "
                      f"no {ct.name} cells loaded (generate with "
                      f"tools/packcells)")
                continue
            centers, angles = load_pos_file(path, um_to_lu)
            cells = place_cells(ct.mesh.vertices, centers, angles)
            deny = int(round(ct.minimum_distance_from_solid_um * um_to_lu))
            keep = filter_wall_overlaps(cells, np.asarray(self.flags), deny)
            self.set_cells(k, cells[keep])

    def set_cells(self, type_index: int, positions: np.ndarray):
        self.cell_states[type_index] = make_cell_state(positions, dtype=self.dtype)
        self._dirty = True

    def set_external_force(self, ct_index: int, force: np.ndarray):
        """Static per-vertex external force (e.g. optical-tweezers stretch)."""
        self.cell_types[ct_index].ext_force = jnp.asarray(force, dtype=self.dtype)
        self._dirty = True

    def enable_repulsion(self, constant=None, cutoff=None, every=1):
        """Inter-cell repulsion (reference: kRep/RepCutoff in config +
        setRepulsion/setRepulsionTimeScaleSeparation)."""
        if constant is None:
            k_rep_si = self.cfg["domain"]["kRep"].read(float)
            constant = k_rep_si / self.params.df
        if cutoff is None:
            cutoff = self.cfg["domain"]["RepCutoff"].read(float)
        self.repulsion_constant = float(constant)
        self.repulsion_cutoff = float(cutoff)
        self.repulsion_every = int(every)
        self._dirty = True

    def enable_boundary_repulsion(self, constant, cutoff, every=1):
        self.boundary_repulsion_constant = float(constant)
        self.boundary_repulsion_cutoff = float(cutoff)
        self.boundary_repulsion_every = int(every)
        self._dirty = True

    def enable_interior_viscosity(self, type_index: int, every: int = 10,
                                  viscosity_ratio: Optional[float] = None,
                                  entire_every: int = 0):
        """Per-node omega raised inside this type's membranes (reference:
        viscosityRatio material XML + interiorViscosity timescales).

        ``every`` = the cheap membrane-normal sweep cadence
        (<interiorViscosity>); ``entire_every`` = the full raycast cadence
        (<interiorViscosityEntireGrid>, e.g. 1000) — 0 raycasts at
        ``every`` with no cheap sweep."""
        from .cells.interior import interior_tau

        ct = self.cell_types[type_index]
        if viscosity_ratio is None:
            viscosity_ratio = ct.material_cfg.get("viscosityRatio", float, 5.0)
        ct.omega_interior = 1.0 / interior_tau(viscosity_ratio, self.params.tau)
        self.interior_every = int(every)
        self.interior_entire_every = int(entire_every)
        self._dirty = True

    def enable_solidify(self, type_index: int, every: int = 10,
                        distance_threshold: Optional[float] = None,
                        shear_threshold: Optional[float] = None):
        """Platelet binding/solidification (reference: SOLIDIFY_MECHANICS
        build + material XML distanceThreshold/shearThreshold)."""
        ct = self.cell_types[type_index]
        ct.solidify = True
        ct.distance_threshold = (
            distance_threshold
            if distance_threshold is not None
            else ct.material_cfg.get("distanceThreshold", float, 1.0)
        )
        ct.shear_threshold = (
            shear_threshold
            if shear_threshold is not None
            else ct.material_cfg.get("shearThreshold", float, 0.0)
        )
        self.solidify_every = int(every)
        self._dirty = True

    def populate_binding_sites(self, mask):
        """Restrict platelet binding sites to ``mask`` (nodes outside keep no
        binding even when wall-adjacent).  Reference:
        HemoCellFields::populateBindingSites(Box3D*) + helper/bindingField —
        the solidify cases seed binding only on a chosen wall segment
        (cases/solidify_example/solidify_example.cpp:120-122)."""
        self._binding_sites = np.asarray(mask) > 0
        self._dirty = True

    def enable_cepac(self, diffusivity_lbm: float = 1.0 / 6.0,
                     dirichlet_mask=None, dirichlet_value=None,
                     init: float = 0.0):
        """CEPAC scalar advection-diffusion field (reference:
        global.enableCEPACfield + createCEPACfield); ``init`` is the
        initial uniform concentration."""
        from .fluid.advection_diffusion import tau_from_diffusivity

        self.cepac_tau = tau_from_diffusivity(diffusivity_lbm)
        self._cepac0 = float(init)
        self._cepac_mask = (
            jnp.asarray(dirichlet_mask) if dirichlet_mask is not None else None
        )
        self._cepac_value = (
            jnp.asarray(dirichlet_value, dtype=self.dtype)
            if dirichlet_value is not None
            else None
        )
        self._dirty = True

    def set_body_force(self, force):
        """Uniform driving force density [3] (pipe flow drive)."""
        self.body_force = jnp.asarray(force, dtype=self.dtype)
        if self._state is not None and not self._dirty:
            # rebuild runner but keep state
            self._dirty = True

    def set_ibm_precision(self, mm: str = "f32"):
        """IBM spread/interp matmul precision: 'f32' (exact parity with the
        jnp path) or 'bf16' (MXU bf16 rate, f32 accumulation, ~0.3%
        trilinear-weight error; validation oracles hold)."""
        assert mm in ("f32", "bf16"), mm
        self.ibm_mm = mm
        self._dirty = True

    def set_outlet_density(self, density: float = 1.0):
        """Fixed-density (pressure) outlet value applied at FLAG_PRESSURE
        nodes in the flag matrix (reference: Zou-He addPressureBoundary +
        setBoundaryDensity, e.g. cases/preinlet_shear/preinlet_shear.cpp:113,
        cases/injured_vessel outlets)."""
        self.bc_density = float(density)
        self._dirty = True

    def set_system_periodicity(self, axis_or_tuple, value=None):
        """API parity (hemocell.h setSystemPeriodicity); the dense lattice is
        always periodic, walls come from the flag matrix."""
        if value is None:
            self.periodicity = tuple(axis_or_tuple)
        else:
            p = list(self.periodicity)
            p[axis_or_tuple] = value
            self.periodicity = tuple(p)

    # ------------------------------------------------------------------
    # compiled step management

    def _build(self):
        types = []
        for ct in self.cell_types:
            box = int(np.ceil(
                2 * np.ptp(ct.mesh.vertices, axis=0).max()
            )) if ct.omega_interior or ct.solidify else 24
            types.append(
                TypeConfig(
                    name=ct.name,
                    model_fn=MODEL_REGISTRY[ct.model_name],
                    topo=ct.topo_dev,
                    material=ct.material,
                    material_every=ct.timescale,
                    ext_force=ct.ext_force,
                    omega_interior=ct.omega_interior,
                    interior_box=max(12, box),
                    solidify=ct.solidify,
                    distance_threshold=ct.distance_threshold,
                    shear_threshold=ct.shear_threshold,
                )
            )
        bmask = None
        if self.boundary_repulsion_constant > 0.0:
            bmask = jnp.asarray(boundary_neighbor_mask(np.asarray(self.flags)))
        # IBM window capacity from the MEASURED initial occupancy instead
        # of the blind safety=4 static pick — tighter windows cut the
        # per-program DMA + chunk waste of every spread/interp/wall-hit
        # call (ibm/pallas_ibm.adaptive_capacity; the overflow guard
        # catches mid-run redistribution past the margin).  Single-device
        # runner only: the distributed paths size their own local windows.
        ibm_cap = None
        if getattr(self, "_mesh", None) is None and self.cell_states and any(
            cs.pos.shape[0] for cs in self.cell_states
        ):
            from .ibm.pallas_ibm import adaptive_capacity

            pos_all = np.concatenate(
                [np.asarray(cs.pos).reshape(-1, 3)
                 for cs in self.cell_states]
            )
            if pos_all.shape[0]:
                ibm_cap = adaptive_capacity(
                    pos_all, self.shape[0],
                    margin=getattr(self, "_ibm_capacity_margin", 1.5),
                )
        cfg = StepConfig(
            shape=self.shape,
            flags=self.flags,
            omega=self.omega,
            types=types,
            bc_velocity=self.bc_velocity,
            bc_density=getattr(self, "bc_density", None),
            ibm_mm=getattr(self, "ibm_mm", "f32"),
            spread_mode=getattr(self, "spread_mode", None),
            body_force=self.body_force,
            particle_every=self.particle_every,
            resort_every=self._auto_resort_every(),
            f_limit=self.params.f_limit,
            repulsion_constant=self.repulsion_constant,
            repulsion_cutoff=self.repulsion_cutoff,
            repulsion_every=self.repulsion_every,
            boundary_repulsion_constant=self.boundary_repulsion_constant,
            boundary_repulsion_cutoff=self.boundary_repulsion_cutoff,
            boundary_repulsion_every=self.boundary_repulsion_every,
            boundary_mask=bmask,
            dtype=self.dtype,
            interior_every=self.interior_every,
            interior_entire_every=self.interior_entire_every,
            solidify_every=self.solidify_every,
            cepac_tau=self.cepac_tau,
            cepac_dirichlet_mask=getattr(self, "_cepac_mask", None),
            cepac_dirichlet_value=getattr(self, "_cepac_value", None),
            ibm_capacity=ibm_cap,
        )
        self._step_cfg = cfg
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            from .parallel import (
                build_shardmap_runner,
                build_sharded_runner,
                shardmap_supported,
            )

            names = mesh.axis_names
            divisible = self.shape[0] % int(mesh.shape[names[0]]) == 0
            if len(names) > 1:
                divisible &= self.shape[1] % int(mesh.shape[names[1]]) == 0
            # owner-computes particle sharding is the PRODUCTION
            # distributed path (per-shard cell tables, O(P/N) particle
            # work like the reference's per-block particle fields,
            # core/hemoCellFields.cpp:70-111): auto-picked whenever it
            # covers the configuration; particle_sharding='replicated'
            # forces the vertex-replicated shard_map/GSPMD runners,
            # 'owner' insists (and logs loudly when it can't)
            pick = getattr(self, "particle_sharding", None)
            owner_ok = False
            owner_reason = None
            n_cells = sum(cs.pos.shape[0] for cs in self.cell_states)
            if pick != "replicated" and n_cells > 0:
                from .parallel.owner_step import (
                    build_owner_runner,
                    owner_unsupported_reason,
                    required_slab_width,
                    suggest_envelope,
                )

                owner_reason = owner_unsupported_reason(cfg, n_cells)
                if len(names) > 2:
                    owner_reason = owner_reason or ">2-D device mesh"
                elif not divisible:
                    owner_reason = owner_reason or (
                        f"X={self.shape[0]} not divisible by the mesh"
                    )
                else:
                    nxm = int(mesh.shape[names[0]])
                    nym = (
                        int(mesh.shape[names[1]]) if len(names) > 1 else 1
                    )
                    env = suggest_envelope(
                        self.cell_states, resort_every=cfg.resort_every
                    )
                    need = required_slab_width(self.cell_states, cfg, env)
                    xl = self.shape[0] // nxm if nxm else 0
                    if nxm < 2:
                        owner_reason = owner_reason or "single-shard mesh"
                    elif xl < need or self.shape[0] - xl < 2 * env:
                        owner_reason = owner_reason or (
                            f"slab width {xl} < required {need} "
                            f"(envelope {env})"
                        )
                    elif nym > 1:
                        yl = self.shape[1] // nym
                        if yl < need or self.shape[1] - yl < 2 * env:
                            owner_reason = owner_reason or (
                                f"y tile width {yl} < required {need} "
                                f"(envelope {env})"
                            )
                if owner_reason is None:
                    self._runner = build_owner_runner(
                        cfg, mesh, envelope=env
                    )
                    owner_ok = True
                else:
                    from .utils.logfile import hlog

                    hlog(
                        f"distribute: owner-computes particle sharding "
                        f"unavailable ({owner_reason}); falling back to "
                        f"the vertex-replicated "
                        f"{'shard_map' if shardmap_supported(cfg, mesh) else 'GSPMD'}"
                        f" runner"
                    )
            if owner_ok:
                self._distributed_mode = "owner"
            elif shardmap_supported(cfg, mesh) and len(names) <= 2 \
                    and divisible:
                self._runner = build_shardmap_runner(cfg, mesh)
                self._distributed_mode = "shardmap"
            else:
                # GSPMD auto-partition covers the full feature set
                self._runner = build_sharded_runner(cfg, mesh)
                self._distributed_mode = "gspmd"
        else:
            self._runner = build_runner(cfg)
            self._distributed_mode = "single"
        if self._state is None:
            self._state = initial_sim_state(
                cfg, self.cell_states, rho0=getattr(self, "_rho0", 1.0),
                u0=getattr(self, "_u0", (0.0, 0.0, 0.0)),
                cepac0=getattr(self, "_cepac0", None),
            )
        else:
            # keep fluid + iteration (and every auxiliary field), adopt
            # (possibly new) cell states
            self._state = self._state._replace(cells=tuple(self.cell_states))
        if getattr(self, "_binding_sites", None) is not None \
                and self._state.binding_mask is not None:
            # restrict binding to wall-adjacent nodes inside the user mask
            # (reference: HemoCellFields::populateBindingSites over a Box3D,
            # helper/bindingField.{h,cpp})
            self._state = self._state._replace(
                binding_mask=self._state.binding_mask
                & jnp.asarray(self._binding_sites)
            )
        self._dirty = False

    def set_resort_every(self, n: int):
        """Amortise the Pallas IBM vertex sort over n steps (keep
        n * u_lbm_max < 0.125 so drifting vertices stay inside the widened
        kernel windows — see StepConfig.resort_every).  Without an explicit
        call the facade auto-picks the largest safe cadence."""
        self.resort_every = int(n)
        self._dirty = True

    def _auto_resort_every(self) -> int:
        """Largest IBM resort cadence whose worst-case drift
        (n * u_lbm_max per step) stays safely inside the shadow kernels'
        boundary strips; explicit set_resort_every wins.

        The shadow only pays when the per-step vertex sort it amortises is
        expensive — which scales with total vertex count.  Measured on the
        v5e: at ~30k vertices (pipeflow tube) the shadow's fixed overhead
        (wider drift-strip windows + the 4-field masked interp) costs more
        than the ~0.2 ms sort it saves; at 70k+ (64^3 suspension) the
        sort dominates and the shadow wins.  Crossover ~48k."""
        explicit = getattr(self, "resort_every", None)
        if explicit is not None:
            return explicit
        n_verts = sum(
            cs.pos.shape[0] * cs.pos.shape[1] for cs in self.cell_states
        )
        if n_verts < 48_000:
            return 1
        u_max = getattr(self.params, "u_lbm_max", 0.1) or 0.1
        from .dynamics import auto_resort_every

        return auto_resort_every(u_max)

    def distribute(self, n_devices: int | None = None, mesh=None,
                   particle_sharding: str | None = None):
        """Run the simulation domain-decomposed over a device mesh — the
        analog of launching the reference under ``mpirun -n N``
        (core/hemoCell.cpp:438-571).  Uses the explicit shard_map step
        (per-shard Pallas kernels + ppermute halo exchange) when the
        feature set allows, else the GSPMD auto-partitioned step.

        Particle sharding defaults to OWNER-COMPUTES (per-shard cell
        tables, parallel/owner_step.py): particle work scales O(P/N) like
        the reference's per-block particle fields, with envelope-halo
        ppermutes replacing the MPI particle protocol.  It falls back
        (with a logged reason) to the vertex-replicated shard_map step
        when the feature set or geometry doesn't allow it;
        ``particle_sharding='replicated'`` forces the replicated step,
        ``'owner'`` documents intent (same auto behavior)."""
        from .parallel import make_mesh, shard_state

        if particle_sharding is not None:
            self.particle_sharding = particle_sharding
        self._mesh = mesh if mesh is not None else make_mesh(
            n_devices, axes=("x",)
        )
        if self._state is not None:
            self._state = shard_state(self._state, self._mesh)
        self._dirty = True
        return self._mesh

    def fresh_state(self):
        self._state = None
        self._dirty = True

    # ------------------------------------------------------------------
    # running

    def enable_exit_signals(self, checkpoint_on_exit: bool = True):
        """Install graceful-exit signal handlers (reference:
        core/hemoCell.cpp:48-67 + checkExitSignals :289-297): SIGINT/TERM/
        HUP/USR1/USR2 set a flag; the next iterate() call writes a final
        checkpoint (if an output dir is set) and raises SystemExit."""
        import signal

        self._exit_requested = False

        def _handler(signum, frame):
            self._exit_requested = True

        for sig in ("SIGINT", "SIGTERM", "SIGHUP", "SIGUSR1", "SIGUSR2"):
            if hasattr(signal, sig):
                try:
                    signal.signal(getattr(signal, sig), _handler)
                except (ValueError, OSError):
                    pass  # not the main thread / unsupported
        self._checkpoint_on_exit = checkpoint_on_exit

    def check_exit_signals(self):
        """Exit gracefully if a termination signal arrived
        (reference: HemoCell::checkExitSignals, core/hemoCell.cpp:289-297)."""
        if getattr(self, "_exit_requested", False):
            if getattr(self, "_checkpoint_on_exit", False) and self.outdir:
                self.block()
                self.save_checkpoint()
            raise SystemExit("HemoCell: exiting because of termination signal")

    def iterate(self, n: int = 1):
        """Advance n coupled iterations (reference: HemoCell::iterate)."""
        self.check_exit_signals()
        if self._dirty or self._runner is None:
            # push current (possibly updated) cell states into the state
            self._build()
        with self.profiler("iterate"):
            self._state = self._runner(self._state, n)
        # iterate(n) advances exactly n steps — count host-side instead of
        # fetching state.it (a device->host scalar read through the axon
        # tunnel costs ~0.7 ms/iter at n=50; see docs/PERFORMANCE.md)
        self.iter += n
        self._check_overflow()
        # mirror state back for observers
        self.cell_states = list(self._state.cells)
        return self._state

    def _check_overflow(self):
        """Deferred in-run IBM window overflow guard: a migrated/packed
        slab exceeding the kernels' static window capacity drops
        contributions silently in-kernel, which corrupts physics.  The
        counter is shipped device->host ASYNCHRONOUSLY each iterate call
        and inspected on the NEXT call (by which point the transfer has
        landed — zero stall on the hot path); on overflow we warn loudly
        and fall back to the exact XLA scatter path for subsequent steps."""
        if getattr(self, "spread_mode", None) == "scatter":
            return
        prev = getattr(self, "_ov_pending", None)
        if prev is not None and hasattr(prev, "is_ready") \
                and not prev.is_ready():
            # the async transfer has not landed yet (tightly chained
            # iterate() calls): skip the inspection instead of blocking —
            # a host wait on the previous call's counter would serialize
            # the chained dispatches (~25 ms relay round trip per call).
            # Safe to supersede: the counter is a carried running max, so
            # the newer value shipped below covers everything the dropped
            # one did.  flush_overflow_guard()/writeOutput/checkpoint
            # remain the synchronous backstops before results are trusted.
            prev = None
        if prev is not None and int(np.asarray(prev)) > 0:
            import warnings as _w

            # recovery first (r05): rebuild the Pallas plan with window
            # capacities re-measured from the CURRENT (redistributed)
            # positions and an escalated margin, instead of permanently
            # degrading the whole run to the ~10x-slower scatter path.
            # Repeated overflow (persistent crowding the margins can't
            # absorb) falls back to scatter for good.
            recoveries = getattr(self, "_overflow_recoveries", 0)
            n_verts = sum(
                cs.pos.shape[0] * cs.pos.shape[1] for cs in self.cell_states
            )
            # recovery escalates adaptive_capacity's margin, which only
            # the SINGLE-DEVICE runner consumes — the distributed runners
            # size their windows from the blind safety-4 slab_capacity,
            # so a distributed overflow means genuine extreme crowding:
            # go straight to the exact scatter fallback there instead of
            # issuing no-op 'recovered' rebuilds (r05 review fix)
            if (
                recoveries < 2 and n_verts > 0
                and getattr(self, "_mesh", None) is None
            ):
                self._overflow_recoveries = recoveries + 1
                self._ibm_capacity_margin = 1.5 * (1.6 ** (recoveries + 1))
                _w.warn(
                    f"IBM slab-window overflow detected by iteration "
                    f"{self.iter} ({int(np.asarray(prev))} dropped "
                    f"contributions): rebuilding Pallas windows from the "
                    f"current occupancy (recovery "
                    f"{recoveries + 1}/2, margin "
                    f"{self._ibm_capacity_margin:.2f}); re-run from the "
                    f"last checkpoint for exact results", stacklevel=3,
                )
            else:
                _w.warn(
                    f"IBM slab-window overflow detected by iteration "
                    f"{self.iter} ({int(np.asarray(prev))} dropped "
                    f"contributions): falling back to "
                    f"spread_mode='scatter' for subsequent steps; re-run "
                    f"from the last checkpoint for exact results",
                    stacklevel=3,
                )
                self.spread_mode = "scatter"
            self._ov_pending = None
            self._state = self._state._replace(
                ibm_overflow=jnp.zeros((), jnp.int32)
            )
            self._dirty = True
            return
        ov = self._state.ibm_overflow
        if ov is not None:
            try:
                ov.copy_to_host_async()
            except AttributeError:
                pass
            self._ov_pending = ov

    def flush_overflow_guard(self):
        """Synchronously run the (normally one-call-deferred) overflow
        check against the CURRENT state — call before trusting final
        results or writing a terminal checkpoint."""
        ov = self._state.ibm_overflow if self._state is not None else None
        if ov is not None:
            jax.block_until_ready(ov)  # synchronous by contract
            self._ov_pending = ov
            self._check_overflow()

    def block(self):
        jax.block_until_ready(self._state)
        if self._state is not None:
            # host-fetch a scalar leaf: on the axon relay,
            # block_until_ready alone can return before remote execution
            # finishes (measured in scripts/probe_roofline.py) — a 4-byte
            # fetch of the loop-carried counter forces true completion
            int(self._state.it)
            # everything has landed: inspect the (possibly deferred)
            # overflow counter now — block() is a user sync point
            prev = getattr(self, "_ov_pending", None)
            if prev is not None:
                jax.block_until_ready(prev)
            self._check_overflow()

    # ------------------------------------------------------------------
    # observables

    @property
    def state(self) -> SimState:
        if self._dirty or self._state is None:
            self._build()
        # direct state reads are not otherwise a sync point: inspect the
        # async overflow counter if it has landed, so corrupted fields are
        # never consumed without the warning/fallback firing (a not-ready
        # counter is skipped — zero stall, block() remains the backstop)
        if getattr(self, "_ov_pending", None) is not None:
            self._check_overflow()
            if self._dirty:
                self._build()
        return self._state

    def fluid_velocity(self):
        st = self.state
        force = jnp.zeros((3,) + self.shape, dtype=self.dtype)
        _, u = lbm.macroscopic(st.f, force)
        return u

    def fluid_density(self):
        return 1.0 + jnp.sum(self.state.f, axis=0)  # deviation storage

    def cell_volumes(self, type_index=0):
        ct = self.cell_types[type_index]
        return cellinfo.volumes(self.state.cells[type_index].pos, ct.topo_dev["tri"])

    def cell_areas(self, type_index=0):
        ct = self.cell_types[type_index]
        return cellinfo.areas(self.state.cells[type_index].pos, ct.topo_dev["tri"])

    def cell_bounding_boxes(self, type_index=0):
        return cellinfo.bounding_boxes(self.state.cells[type_index].pos)

    def alive_count(self, type_index=0):
        return int(self.state.cells[type_index].alive.sum())

    def mean_force_pn(self, type_index=0):
        """Mean vertex force magnitude in pN (pipeflow oracle)."""
        cs = self.state.cells[type_index]
        f_lu = cellinfo.mean_force_magnitude(cs.force + cs.force_repulsion, cs.alive)
        return float(f_lu) * self.params.df * 1e12

    # ------------------------------------------------------------------
    # reference-style camelCase aliases (hemocell.h API surface)

    def setMaterialTimeScaleSeparation(self, name: str, timescale: int):
        for ct in self.cell_types:
            if ct.name == name:
                ct.timescale = int(timescale)
                self._dirty = True
                return
        raise KeyError(name)

    def setParticleVelocityUpdateTimeScaleSeparation(self, timescale: int):
        self.particle_every = int(timescale)
        self._dirty = True

    def setInteriorViscosityTimeScaleSeperation(  # sic (hemocell.h:167)
            self, separation: int, separation_entire_grid: int):
        """Reference: the ENTIRE-grid raycast runs at
        ``separation_entire_grid`` (rare, e.g. 1000) and the cheap
        membrane-normal sweep at ``separation`` (e.g. 10),
        core/hemoCell.cpp:347-357."""
        self.interior_every = int(separation)
        self.interior_entire_every = int(separation_entire_grid)
        self._dirty = True

    def setRepulsion(self, k_rep_si: float, cutoff_lu: float):
        self.enable_repulsion(k_rep_si / self.params.df, cutoff_lu)

    def setRepulsionTimeScaleSeperation(self, every: int):  # sic (reference)
        self.repulsion_every = int(every)
        self._dirty = True

    def enableBoundaryParticles(self, k_rep_si: float, cutoff_lu: float,
                                every: int = 1):
        self.enable_boundary_repulsion(
            k_rep_si / self.params.df, cutoff_lu, every
        )

    def setInitialMinimumDistanceFromSolid(self, name: str, distance_um: float):
        for ct in self.cell_types:
            if ct.name == name:
                ct.minimum_distance_from_solid_um = float(distance_um)
                return
        raise KeyError(name)

    def setSystemPeriodicity(self, axis, value):
        self.set_system_periodicity(axis, value)

    def populateBindingSites(self, mask):
        return self.populate_binding_sites(mask)

    def loadParticles(self, *a, **kw):
        return self.load_particles(*a, **kw)

    def addCellType(self, name, model="RbcHighOrderModel", construct_type=None):
        return self.add_cell_type(name, model, construct_type)

    def initializeLattice(self, *a, **kw):
        return self.initialize_lattice(*a, **kw)

    def writeOutput(self, *a, **kw):
        return self.write_output(*a, **kw)

    def writeCellInfoCSV(self, *a, **kw):
        return self.write_csv(*a, **kw)

    def saveCheckPoint(self, *a, **kw):
        return self.save_checkpoint(*a, **kw)

    def loadCheckPoint(self, *a, **kw):
        return self.load_checkpoint(*a, **kw)

    def setOutputs(self, name, outputs):
        """Select which per-vertex datasets write_output emits for cell
        type ``name`` (reference HemoCellField::setOutputVariables).
        "Cell Id"/"Vertex Id" are always written; everything else —
        including the recomputed separated force terms — only when
        listed."""
        self._outputs = getattr(self, "_outputs", {})
        self._outputs[name] = list(outputs)

    def setFluidOutputs(self, outputs):
        """Select the fluid HDF5 fields write_output emits (reference
        desiredFluidOutputVariables): Velocity, Density, Boundary, Force,
        ShearRate, StrainRate, ShearStress, Omega, CellDensity,
        BindingSites, InteriorPoints."""
        self._fluid_outputs = list(outputs)

    def sanity_check(self, strict=False):
        """Validated-envelope checks (reference: HemoCell::sanityCheck,
        core/hemoCell.cpp:585-696): tau/nu ranges, velocity bound, timescale
        divisibility.  Returns a list of warnings; raises when strict."""
        warnings = []
        p = self.params
        if not (0.53 <= p.tau <= 1.85):
            warnings.append(
                f"tau={p.tau:.3f} outside validated range [0.53, 1.85] "
                f"(nu_lbm={p.nu_lbm:.3f} not in [0.01, 0.45])"
            )
        if p.u_lbm_max > 0.1:
            warnings.append(f"u_lbm_max={p.u_lbm_max:.3f} > 0.1 (compressibility)")
        if abs(p.dx - 0.5e-6) > 1e-12:
            warnings.append(f"dx={p.dx:g} != 0.5e-6 m (models validated at 0.5um)")
        for ct in self.cell_types:
            if ct.timescale % self.particle_every != 0:
                warnings.append(
                    f"material timescale {ct.timescale} of {ct.name} not "
                    f"divisible by particle timescale {self.particle_every}"
                )
        # Pallas IBM slab-window occupancy: contributions of vertices past a
        # window's static capacity are dropped silently in-kernel, so check
        # the current distribution against the capacity headroom
        if self.cell_states and any(cs.pos.shape[0] for cs in self.cell_states):
            from .ibm.pallas_ibm import slab_capacity, window_occupancy

            pos = np.concatenate(
                [np.asarray(cs.pos).reshape(-1, 3) for cs in self.cell_states]
            )
            P_pad = -(-pos.shape[0] // 512) * 512
            cap = getattr(
                getattr(self, "_step_cfg", None), "ibm_capacity", None
            )
            if cap is None:
                cap = slab_capacity(P_pad, self.shape[0])
            # true sliding-window occupancy (slab + shadow drift strips) —
            # with tight adaptive capacities the per-slab bincount max
            # understates what a kernel window actually holds
            occ = window_occupancy(pos, self.shape[0])
            if occ + 128 > cap:
                warnings.append(
                    f"IBM slab occupancy {occ} within 128 of window "
                    f"capacity {cap}: spread contributions may be dropped "
                    f"(spread_mode='scatter' is the safe fallback)"
                )
        if strict and warnings:
            raise ValueError("; ".join(warnings))
        return warnings

    # ------------------------------------------------------------------
    # output & checkpointing

    def set_output_dir(self, path: str):
        self.outdir = path
        os.makedirs(path, exist_ok=True)
        # versioned logfile under <outdir>/log (reference loadDirectories:
        # tmp/log/logfile, logfile.1, ...)
        from .utils.logfile import hlog

        if hlog.path is None:
            hlog.open(os.path.join(path, "log"))

    def write_output(self, fluid_fields=None,
                     si_units=False, async_io=False):
        """HDF5 fluid + per-type cell files and per-cell CSV for this
        iteration (reference: HemoCell::writeOutput,
        core/hemoCell.cpp:221-287).

        With ``async_io=True`` the device->host snapshot happens now but
        serialisation runs on a background thread (bounded queue), so the
        TPU keeps stepping while the host writes — call
        :meth:`flush_output` (or let it run at exit) to guarantee files
        are on disk."""
        # results are trusted at output time: run the (normally
        # opportunistic) overflow guard synchronously first
        self.flush_overflow_guard()
        import functools as _ft

        from .io import write_cell_csv, write_cells_hdf5, write_fluid_hdf5

        if self.outdir is None:
            raise RuntimeError("call set_output_dir first")
        # reference writeOutput performance line (core/hemoCell.cpp:223-233):
        # s/iteration measured by the profiler's iterate scope since the
        # previous output
        it_timer = self.profiler.root.children.get("iterate")
        if it_timer is not None and self._state is not None:
            # iterate() dispatches asynchronously (returns at enqueue);
            # land the outstanding device work INSIDE the iterate scope so
            # the performance line reports compute time, not enqueue time.
            # No extra cost: the np.asarray reads below would block anyway.
            with self.profiler("iterate"):
                jax.block_until_ready(self._state)
        elapsed = it_timer.total if it_timer is not None else 0.0
        last_el = getattr(self, "_last_output_elapsed", 0.0)
        last_at = getattr(self, "_last_output_at", 0)
        tpi = (
            (elapsed - last_el) / (self.iter - last_at)
            if self.iter > last_at
            else 0.0
        )
        self._last_output_elapsed = elapsed
        self._last_output_at = self.iter
        print(
            f"(HemoCell) (Output) writing output at timestep {self.iter} "
            f"({self.params.dt * self.iter:g} s). Approx. performance: "
            f"{tpi:.6f} s / iteration."
        )
        if fluid_fields is None:
            # honor setFluidOutputs selection (reference
            # desiredFluidOutputVariables, core/hemoCellFields.h)
            fluid_fields = tuple(
                getattr(self, "_fluid_outputs", None)
                or ("Velocity", "Density", "Boundary")
            )
        jobs = []
        st = self.state
        zero_force = jnp.zeros((3,) + self.shape, dtype=self.dtype)
        rho, u = lbm.macroscopic(st.f, zero_force)
        fields = {}
        for name in fluid_fields:
            if name == "Velocity":
                fields[name] = np.asarray(u).transpose(1, 2, 3, 0)
            elif name == "Density":
                fields[name] = np.asarray(rho)
            elif name == "Boundary":
                fields[name] = np.asarray(self.flags).astype(np.float32)
            elif name == "ShearRate":
                fields[name] = np.asarray(
                    lbm.shear_rate_magnitude(st.f, zero_force, self.omega)
                )
            elif name == "Omega":
                om = np.asarray(self.omega)
                fields[name] = np.broadcast_to(om, self.shape).copy()
            elif name in ("StrainRate", "ShearStress"):
                # Voigt [xx,yy,zz,xy,xz,yz] -> [...,6] (reference
                # OUTPUT_STRAIN_RATE / OUTPUT_SHEAR_STRESS)
                S = np.asarray(
                    lbm.strain_rate_tensor(st.f, zero_force, self.omega)
                ).transpose(1, 2, 3, 0)
                if name == "ShearStress":
                    om = float(np.mean(np.asarray(self.omega)))
                    nu = (1.0 / om - 0.5) / 3.0
                    S = 2.0 * nu * np.asarray(rho)[..., None] * S
                fields[name] = S
            elif name == "Force":
                # the actual lattice force: spread IBM particle forces
                # (recomputed like the reference's spreadParticleForce
                # re-run, io/FluidHdf5IO.cpp:46-49) plus the body force
                bf = (
                    np.asarray(self._step_cfg.body_force)
                    if self._step_cfg is not None
                    and self._step_cfg.body_force is not None
                    else np.zeros(3)
                )
                total = np.asarray(self.spread_force_field()).transpose(
                    1, 2, 3, 0
                ) + np.broadcast_to(bf, self.shape + (3,))
                fields[name] = total.astype(np.float32)
            elif name == "BindingSites":
                # reference outputBindingSites (io/FluidHdf5IO.hh:307-330):
                # zero field when binding sites are unused
                b = st.binding_mask
                fields[name] = (
                    np.asarray(b).astype(np.float32)
                    if b is not None
                    else np.zeros(self.shape, np.float32)
                )
            elif name == "InteriorPoints":
                # reference outputInteriorPoints: nodes currently tagged
                # interior by the interior-viscosity helper
                om = st.omega_field
                if om is not None:
                    base = float(np.mean(np.asarray(self.omega)))
                    fields[name] = (
                        np.abs(np.asarray(om) - base) > 1e-12
                    ).astype(np.float32)
                else:
                    fields[name] = np.zeros(self.shape, np.float32)
            elif name == "CellDensity":
                # vertices-per-voxel histogram, one dataset per cell type
                # (reference OUTPUT_CELL_DENSITY -> "CellDensity_<name>")
                for k, ct in enumerate(self.cell_types):
                    cs = st.cells[k]
                    dens = np.zeros(self.shape, np.float32)
                    al = np.asarray(cs.alive)
                    if al.any():
                        p = np.asarray(cs.pos)[al].reshape(-1, 3)
                        ij = np.round(p).astype(int)
                        for d in range(3):
                            ij[:, d] = np.mod(ij[:, d], self.shape[d])
                        np.add.at(
                            dens, (ij[:, 0], ij[:, 1], ij[:, 2]), 1.0
                        )
                    fields[f"CellDensity_{ct.name}"] = dens
        jobs.append(_ft.partial(
            write_fluid_hdf5,
            self.outdir, self.iter, self.params.dx, self.params.dt, fields,
            si_units=si_units,
        ))
        # CEPAC scalar field file (reference writeCEPACField_HDF5,
        # core/hemoCell.cpp:274-277 + io/FluidHdf5IO.cpp:32-42)
        if st.cepac is not None:
            from .fluid.advection_diffusion import concentration

            conc = np.asarray(concentration(st.cepac))
            jobs.append(_ft.partial(
                write_fluid_hdf5,
                self.outdir, self.iter, self.params.dx, self.params.dt,
                {"Density": conc}, identifier="CEPAC", si_units=si_units,
            ))
        for k, ct in enumerate(self.cell_types):
            cs = st.cells[k]
            alive = np.asarray(cs.alive)
            pos = np.asarray(cs.pos)[alive]
            vel = np.asarray(cs.vel)[alive]
            frc = np.asarray(cs.force)[alive]
            frep = np.asarray(cs.force_repulsion)[alive]
            nca = pos.shape[0]
            nv = ct.num_vertices
            tris = (
                np.asarray(ct.topo.triangles)[None, :, :]
                + (np.arange(nca) * nv)[:, None, None]
            ).reshape(-1, 3)
            # per-type selection (reference HemoCellField::outputVariables
            # via setOutputs); None = full validated set
            sel = getattr(self, "_outputs", {}).get(ct.name)
            want = (lambda n: sel is None or n in sel)
            datasets = {
                "Cell Id": np.repeat(np.arange(nca), nv)[:, None],
                "Vertex Id": np.tile(np.arange(nv), nca)[:, None],
            }
            if want("Velocity"):
                datasets["Velocity"] = vel.reshape(-1, 3)
            if want("Total force"):
                datasets["Total force"] = (frc + frep).reshape(-1, 3)
            if want("Repulsion force"):
                datasets["Repulsion force"] = frep.reshape(-1, 3)
            if cs.restime is not None and want("restime"):
                rt = np.asarray(cs.restime)[alive]
                datasets["restime"] = np.repeat(rt, nv)[:, None]
            # separated constitutive force components, recomputed like the
            # reference's separateForceVectors re-run
            # (core/hemoCellParticleField.cpp:590-614); skipped entirely
            # unless requested (they cost a model re-evaluation)
            term_labels = [
                ("Area force", "area"),
                ("Volume force", "volume"),
                ("Link force", "link"),
                ("Bending force", "bending"),
                ("Viscous force", "visc"),
                ("Inner link force", "inner_link"),
            ]
            want_terms = [lbl for lbl, _ in term_labels if want(lbl)]
            if nca > 0 and want_terms:
                from .mechanics import MODEL_REGISTRY

                model = MODEL_REGISTRY[ct.model_name]
                terms = jax.vmap(
                    lambda p, v: model(p, v, ct.topo_dev, ct.material)
                )(jnp.asarray(pos), jnp.asarray(vel))
                for label, attr in term_labels:
                    if label in want_terms:
                        datasets[label] = np.asarray(
                            getattr(terms, attr)
                        ).reshape(-1, 3)
            jobs.append(_ft.partial(
                write_cells_hdf5,
                self.outdir, self.iter, ct.name,
                positions=pos.reshape(-1, 3),
                datasets=datasets,
                triangles=tris,
            ))
            # per-cell CSV (io/writeCellInfoCSV.cpp).  atomic_block = the
            # owning x-slab index under the current mesh (the reference
            # reports the Palabos block id; our dense decomposition's
            # analog is the shard slab).  baseCellId == cellId is
            # semantically exact here: positions are unwrapped, so no
            # periodic images ever get re-labelled
            # (core/hemoCellParticleDataTransfer.cpp:33-65 — ∅ by design).
            vols = np.asarray(self.cell_volumes(k))[alive]
            areas = np.asarray(self.cell_areas(k))[alive]
            centers = pos.mean(axis=1)
            vels = vel.mean(axis=1)
            ids = np.arange(len(alive))[alive]
            mesh_obj = getattr(self, "_mesh", None)
            if mesh_obj is not None:
                nxm = int(mesh_obj.shape[mesh_obj.axis_names[0]])
                blk = (
                    np.mod(centers[:, 0], self.shape[0])
                    // max(1, self.shape[0] // max(1, nxm))
                ).astype(int)
            else:
                blk = np.zeros(nca, int)
            rows = [
                [centers[i, 0], centers[i, 1], centers[i, 2], areas[i],
                 vols[i], int(blk[i]), int(ids[i]), int(ids[i]),
                 vels[i, 0], vels[i, 1], vels[i, 2]]
                for i in range(nca)
            ]
            jobs.append(_ft.partial(
                write_cell_csv, self.outdir, self.iter, ct.name, rows
            ))

        def _write_all(jobs=tuple(jobs)):
            for j in jobs:
                j()

        if async_io:
            if getattr(self, "_writer", None) is None:
                from .io.async_output import AsyncWriter

                self._writer = AsyncWriter()
            self._writer.submit(_write_all)
        else:
            _write_all()

    def write_csv(self):
        """Per-cell CSV only, at its own cadence (reference apps call
        writeCellInfo_CSV(hemocell) every ``tcsv`` iterations, separately
        from the full writeOutput at ``tmeas`` — examples/pipeflow/
        pipeflow.cpp:136,170-172)."""
        from .io import write_cell_csv

        if self.outdir is None:
            raise RuntimeError("call set_output_dir first")
        st = self.state
        for k, ct in enumerate(self.cell_types):
            cs = st.cells[k]
            alive = np.asarray(cs.alive)
            pos = np.asarray(cs.pos)[alive]
            vel = np.asarray(cs.vel)[alive]
            nca = pos.shape[0]
            vols = np.asarray(self.cell_volumes(k))[alive]
            areas = np.asarray(self.cell_areas(k))[alive]
            centers = pos.mean(axis=1) if nca else pos.reshape(0, 3)
            vels = vel.mean(axis=1) if nca else vel.reshape(0, 3)
            ids = np.arange(len(alive))[alive]
            rows = [
                [centers[i, 0], centers[i, 1], centers[i, 2], areas[i],
                 vols[i], 0, int(ids[i]), int(ids[i]),
                 vels[i, 0], vels[i, 1], vels[i, 2]]
                for i in range(nca)
            ]
            write_cell_csv(self.outdir, self.iter, ct.name, rows)

    def spread_force_field(self):
        """[3,X,Y,Z] IBM-spread particle force on the lattice, recomputed
        at output time — the reference re-runs spreadParticleForce before
        writing OUTPUT_FORCE (io/FluidHdf5IO.cpp:46-49) because the lattice
        force is consumed each step; we rebuild it the same way from the
        current particle forces (exact jnp scatter path)."""
        from .ibm import coupling

        st = self.state
        field = jnp.zeros((3,) + self.shape, dtype=self.dtype)
        parts, acts = [], []
        for cs in st.cells:
            if cs.pos.shape[0] == 0:
                continue
            nv = cs.pos.shape[1]
            parts.append(
                (
                    coupling.cap_force(
                        cs.force.reshape(-1, 3), self.params.f_limit
                    )
                    + cs.force_repulsion.reshape(-1, 3),
                    cs.pos.reshape(-1, 3),
                )
            )
            acts.append(jnp.repeat(cs.alive.astype(self.dtype), nv))
        if not parts:
            return field
        ftot = jnp.concatenate([p[0] for p in parts])
        pos = jnp.concatenate([p[1] for p in parts])
        act = jnp.concatenate(acts)
        fshape = jnp.asarray(self.shape, dtype=self.dtype)
        pos_w = jnp.mod(pos, fshape[None, :])
        has_b = bool(np.asarray(self.flags).any())
        idx, w, _ = coupling.stencil(
            pos_w, self.flags, weight_mask=act, return_total=True,
            has_boundaries=has_b,
        )
        return field + coupling.spread(ftot, idx, w, self.shape,
                                       dtype=self.dtype)

    def flush_output(self):
        """Block until all async writes have landed on disk."""
        w = getattr(self, "_writer", None)
        if w is not None:
            w.flush()

    def profile_phases(self, n: int = 100, repeats: int = 3):
        """Reference-style per-phase breakdown of the coupled step
        (helper/profiler.cpp:138-180 wraps every iterate phase in a timer).

        The production step is ONE fused jit program, and jax.profiler
        tracing hangs through the remote-chip tunnel — so each phase is
        re-run STANDALONE in its own jitted fori_loop with a chained carry
        and wall-clock timed (best of ``repeats``); phases that run at a
        cadence (material/particle/repulsion timescales) are amortised by
        it.  'other' is the full step minus the listed phases: particle
        advance, integration, flag/halo machinery.

        Returns {phase: s/iteration} and prints the table."""
        import time as _time

        import jax as _jax

        from .dynamics import pick_fold
        from .fluid.pallas_lbm import fold_field, stream_collide_pallas
        from .ibm.pallas_ibm import (
            build_ibm_plan,
            pallas_interp,
            pallas_spread,
            slab_capacity,
        )

        if self._dirty or self._runner is None:
            self._build()
        cfg = self._step_cfg
        st = self.state
        shape = tuple(int(s) for s in self.shape)
        on_tpu = jax.default_backend() == "tpu"

        def _sync(x):
            # host fetch of a scalar that depends on x: on the axon relay
            # block_until_ready can return before remote execution
            # completes (docs/PERFORMANCE.md "Timing methodology")
            leaf = _jax.tree_util.tree_leaves(x)[0]
            float(jnp.asarray(leaf).ravel()[0])

        def timeit(fn, x0):
            # chain the carry across repeats: the axon relay caches
            # identical-input executions (see scripts/probe_roofline.py),
            # so re-timing fn(x0) with the same operand can return from
            # cache and report a bogus near-zero time.  Two calls are
            # chained per sync so the ~25 ms relay dispatch+fetch cost
            # amortises over 2n iterations.
            x = fn(x0)
            _sync(x)  # compile + warm
            best = float("inf")
            for _ in range(repeats):
                t0 = _time.perf_counter()
                x = fn(x)
                x = fn(x)
                _sync(x)
                best = min(best, _time.perf_counter() - t0)
            return best / (2 * n)

        results = {}
        results["total (iterate)"] = timeit(lambda s: self._runner(s, n), st)

        # ---- collideAndStream (the fluid kernel, hemoCell.cpp:317) ----
        fold = pick_fold(cfg)
        bf = jnp.zeros(3, self.dtype) if cfg.body_force is None else (
            jnp.asarray(cfg.body_force, self.dtype)
        )
        force0 = jnp.zeros((3,) + shape, self.dtype) + bf[:, None, None, None]
        flags_d = jnp.asarray(cfg.flags)
        f0, force_c, flags_c = st.f, force0, flags_d
        bc_c = cfg.bc_velocity
        if on_tpu and fold > 1:
            f0 = fold_field(f0, fold)
            force_c = fold_field(force_c, fold)
            flags_c = fold_field(flags_c, fold)
            if bc_c is not None:
                bc_c = fold_field(bc_c, fold)

        if on_tpu:
            def _fluid_step(f):
                return stream_collide_pallas(
                    f, force_c, cfg.omega, flags_c, bc_c, fold=fold
                )
        else:
            def _fluid_step(f):
                return lbm.stream_collide(
                    f, force_c, cfg.omega, flags_d, cfg.bc_velocity
                )

        @_jax.jit
        def floop(f):
            return _jax.lax.fori_loop(0, n, lambda i, ff: _fluid_step(ff), f)

        results["collideAndStream"] = timeit(floop, f0)

        # ---- particle phases -----------------------------------------
        pos_parts = [cs.pos.reshape(-1, 3) for cs in st.cells
                     if cs.pos.shape[0]]
        if pos_parts:
            pos_flat = jnp.concatenate(pos_parts)
            P0 = pos_flat.shape[0]
            P_pad = -(-P0 // 512) * 512
            pos_pad = jnp.pad(pos_flat, ((0, P_pad - P0), (0, 0)),
                              constant_values=0.5)
            fshape = jnp.asarray(shape, self.dtype)
            pos_w = jnp.mod(pos_pad, fshape[None, :])
            fdep = jnp.pad(
                jnp.concatenate(
                    [cs.force.reshape(-1, 3) for cs in st.cells
                     if cs.pos.shape[0]]
                ),
                ((0, P_pad - P0), (0, 0)),
            )
            cap = slab_capacity(P_pad, shape[0])
            has_b = bool(np.asarray(cfg.flags).any())
            mask3 = (
                (jnp.asarray(cfg.flags) == 0).astype(self.dtype)
                if has_b else None
            )

            # spreadParticleForce: slab sort + MXU one-hot deposit
            @_jax.jit
            def sloop(p):
                def body(i, pp):
                    plan = build_ibm_plan(pp, shape, cap, payload=fdep)
                    field, _ = pallas_spread(
                        pp, fdep, shape, capacity=cap, mask=mask3,
                        plan=plan, mm=getattr(self, "ibm_mm", "f32"),
                    )
                    return pp + field[0, 0, 0, 0] * 1e-30
                return _jax.lax.fori_loop(0, n, body, p)

            results["spreadParticleForce"] = timeit(sloop, pos_w)

            # interpolateFluidVelocity (every particle_every)
            force_z = jnp.zeros((3,) + shape, self.dtype)
            _, u0 = lbm.macroscopic(st.f, force_z)

            @_jax.jit
            def iloop(p):
                def body(i, pp):
                    vals, _ = pallas_interp(
                        pp, u0, shape, capacity=cap,
                        mm=getattr(self, "ibm_mm", "f32"),
                    )
                    return pp + vals[0, 0] * 1e-30
                return _jax.lax.fori_loop(0, n, body, p)

            results["interpolateFluidVelocity"] = (
                timeit(iloop, pos_w) / max(1, self.particle_every)
            )

            # applyConstitutiveModel (every material_every, per type)
            mech_total = 0.0
            for k, ct in enumerate(self.cell_types):
                cs = st.cells[k]
                if cs.pos.shape[0] == 0:
                    continue
                model = MODEL_REGISTRY[ct.model_name]
                topo, mat = ct.topo_dev, ct.material

                @_jax.jit
                def mloop(p, model=model, topo=topo, mat=mat, v=cs.vel):
                    def body(i, pp):
                        ft = _jax.vmap(
                            lambda a, b: model(a, b, topo, mat).total
                        )(pp, v)
                        return pp + ft * 1e-30
                    return _jax.lax.fori_loop(0, n, body, p)

                every = max(1, self._step_cfg.types[k].material_every)
                mech_total += timeit(mloop, cs.pos) / every
            results["applyConstitutiveModel"] = mech_total

            # applyRepulsionForce (every repulsion_every)
            if self.repulsion_constant > 0.0:
                from .cells.pallas_repulsion import pallas_repulsion

                gid = jnp.pad(
                    jnp.concatenate([
                        jnp.repeat(
                            jnp.arange(cs.pos.shape[0], dtype=jnp.int32),
                            cs.pos.shape[1],
                        )
                        for cs in st.cells if cs.pos.shape[0]
                    ]),
                    (0, P_pad - P0), constant_values=-1,
                )
                act = jnp.pad(
                    jnp.concatenate([
                        jnp.repeat(
                            cs.alive.astype(self.dtype), cs.pos.shape[1]
                        )
                        for cs in st.cells if cs.pos.shape[0]
                    ]),
                    (0, P_pad - P0),
                )

                @_jax.jit
                def rloop(p):
                    def body(i, pp):
                        fr, _ = pallas_repulsion(
                            pp, gid, act, shape,
                            float(self.repulsion_constant),
                            float(self.repulsion_cutoff),
                        )
                        return pp + fr * 1e-30
                    return _jax.lax.fori_loop(0, n, body, p)

                results["applyRepulsionForce"] = (
                    timeit(rloop, pos_w)
                    / max(1, getattr(self, "repulsion_every", 1))
                )

        listed = sum(v for k, v in results.items() if k != "total (iterate)")
        results["other (advance/integrate/machinery)"] = max(
            0.0, results["total (iterate)"] - listed
        )

        total = results["total (iterate)"]
        print(f"{'phase':40s} {'ms/iter':>9s} {'%':>6s}")
        for k, v in results.items():
            pct = 100.0 * v / total if total > 0 else 0.0
            print(f"{k:40s} {v * 1e3:9.3f} {pct:6.1f}")
        return results

    def save_checkpoint(self, directory: Optional[str] = None):
        from .io import save_checkpoint

        # a checkpoint must never freeze silently-corrupted physics
        self.flush_overflow_guard()
        d = directory or os.path.join(self.outdir or ".", "checkpoint")
        meta = {"iteration": self.iter, "dx": self.params.dx, "dt": self.params.dt}
        return save_checkpoint(d, self.state, meta)

    def load_checkpoint(self, directory: Optional[str] = None):
        from .io import load_checkpoint

        d = directory or os.path.join(self.outdir or ".", "checkpoint")
        state, meta = load_checkpoint(d, dtype=self.dtype)
        self._state = state
        self.cell_states = list(state.cells)
        self.iter = int(state.it)
        self._dirty = True
        return meta
