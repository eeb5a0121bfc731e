"""Declarative simulation configuration.

The reference hardcodes its entire parameter surface at compile time (SURVEY.md
section 5 "Config / flag system — absent"): solver choice (main.rs:91), scene code
(main.rs:177-196), fluid constants (main.rs:85-89), timestep policy (main.rs:120-129),
DFSPH tolerances (dfsph.rs:49-55), WCSPH compressibility (wscsph.rs:39-49). This
module lifts exactly that surface into one dataclass tree that round-trips to JSON
and builds a ready-to-run (world, solver, boundary, carry) quadruple.

Example:

    cfg = SimulationConfig(
        fluid=FluidConfig(particle_density=2500.0),
        solver=SolverConfig(kind="dfsph_dense"),
        scene=[FluidRect(rect=(0.1, 0.7, 0.5, 1.0), jitter=0.05),
               BoundaryThickLine(start=(0.0, 0.0), end=(2.0, 0.0), thickness=4)],
    )
    world, solver, boundary, carry = cfg.build()
"""

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

from .world import FluidParticleWorld


# --------------------------------------------------------------------- scene ops


@dataclass(frozen=True)
class FluidRect:
    """fluid_world.add_fluid_rect (fluidparticleworld.rs:140-166)."""

    rect: Tuple[float, float, float, float]
    jitter: float = 0.05
    op: str = "fluid_rect"


@dataclass(frozen=True)
class BoundaryLine:
    """fluid_world.add_boundary_line (fluidparticleworld.rs:181-195)."""

    start: Tuple[float, float]
    end: Tuple[float, float]
    op: str = "boundary_line"


@dataclass(frozen=True)
class BoundaryThickLine:
    """fluid_world.add_boundary_thick_line (fluidparticleworld.rs:168-176)."""

    start: Tuple[float, float]
    end: Tuple[float, float]
    thickness: int = 2
    op: str = "boundary_thick_line"


_SCENE_OPS = {
    "fluid_rect": FluidRect,
    "boundary_line": BoundaryLine,
    "boundary_thick_line": BoundaryThickLine,
}

SceneOp = Union[FluidRect, BoundaryLine, BoundaryThickLine]


def default_scene() -> List[SceneOp]:
    """The reference's dam-break tank (main.rs:177-196)."""
    return [
        FluidRect(rect=(0.1, 0.7, 0.5, 1.0), jitter=0.05),
        BoundaryThickLine(start=(0.0, 2.5), end=(2.0, 2.5), thickness=4),
        BoundaryThickLine(start=(0.0, 0.0), end=(2.0, 0.0), thickness=4),
        BoundaryThickLine(start=(0.0, 0.0), end=(0.0, 2.5), thickness=4),
        BoundaryThickLine(start=(2.0, 0.0), end=(2.0, 2.5), thickness=4),
        BoundaryThickLine(start=(0.0, 0.6), end=(1.75, 0.5), thickness=2),
        BoundaryThickLine(start=(0.0, 2.5), end=(2.0, 2.5), thickness=2),
        BoundaryThickLine(start=(-2.0, -0.5), end=(4.0, -0.5), thickness=4),
    ]


# ------------------------------------------------------------------ components


@dataclass(frozen=True)
class FluidConfig:
    """ConstantFluidProperties args (main.rs:85-89 defaults)."""

    smoothing_factor: float = 2.0
    particle_density: float = 10000.0
    fluid_density: float = 100.0


@dataclass(frozen=True)
class ViscosityConfig:
    """XSPH (main.rs:93, xsph.rs:14) or physical (physical.rs:14, main.rs:95-96)."""

    kind: str = "xsph"  # "xsph" | "physical"
    xsph_epsilon: float = 0.05
    fluid_viscosity: float = 1.0016e-3  # Pa*s, water at 20C


@dataclass(frozen=True)
class TimestepConfig:
    """SimulationStepConfig (timemanager.rs:38-59; defaults main.rs:115-129).

    `cfl_factor` None -> solver-specific default (0.2 WCSPH / 1.5 DFSPH)."""

    kind: str = "adaptive"  # "adaptive" | "fixed"
    fixed_timestep: float = 1.0 / 3000.0
    timestep_max: float = 1.0 / 120.0 / 3.0
    timestep_min: float = 1.0 / 60.0 / 400.0
    cfl_factor: Optional[float] = None
    target_frame_length: Optional[float] = None


@dataclass(frozen=True)
class SolverConfig:
    """Solver selection + solver-specific knobs.

    kind: "dfsph" (faithful table layout), "dfsph_dense" (sorted-carry dense
    layout), "dfsph_padded" (padded-resident carry - the TPU fast path),
    "wcsph", "wcsph_dense".
    DFSPH tolerances per dfsph.rs:49-55; WCSPH compressibility per wscsph.rs:39-49.
    """

    kind: str = "dfsph_padded"
    # wcsph | wcsph_dense | wcsph_padded | dfsph | dfsph_dense | dfsph_padded
    # | dfsph_plane | wcsph_plane (plane-resident slot-major Pallas carries,
    #   single device)
    max_avg_density_error: float = 0.01 / 100.0
    max_density_iterations: int = 200
    max_divergence_error: float = 0.1 / 100.0
    max_divergence_iterations: int = 400
    boundary_force_factor: float = 1.0
    target_density_variation: float = 0.01
    expected_max_flow_speed: float = 1.0
    dense_occupancy: int = 8
    # None: fit the boundary slot axis to its exact max cell occupancy
    dense_boundary_occupancy: Optional[int] = None
    dense_ny_multiple: int = 1
    # k-step neighbor rebuild (dense DFSPH only): 1 = conformance (the reference
    # rebuilds every step); k > 1 is the opt-in Verlet-style speed mode, see
    # PERF.md and models/dfsph_dense.py for the bounded-deviation contract
    rebuild_every: int = 1
    # Route fluid-fluid pair passes and the padded-resident re-bucket through
    # the slot-major Pallas kernels (ops/pallas_slotmajor.py) — the fastest
    # measured single-device path (PERF.md round 3). Dense/padded solvers only;
    # requires a TPU backend (or Pallas interpret mode elsewhere).
    use_pallas_slotmajor: bool = False
    # Performance knobs of the dense/plane grids (DenseGridConfig twins; the
    # conformance defaults match the grid's). A JSON config can reproduce the
    # measured-best bench settings: pair_dtype="bfloat16",
    # pallas_pf_stat_chunk_lanes=128 (PERF.md round 4).
    # "float32" (exact, conformance) | "bfloat16" (cell-relative operand
    # planes; kernel math stays f32 on the pf path)
    pair_dtype: str = "float32"
    # pf-kernel adaptive-bound chunk width in lanes (multiple of 128);
    # None = full-width bands
    pallas_pf_chunk_lanes: Optional[int] = None
    # chunk width for the fluid-BOUNDARY passes only; -1/None = inherit
    pallas_pf_stat_chunk_lanes: Optional[int] = -1
    # chunk width for the plane re-bucket only; -1/None = inherit
    pallas_pf_rebucket_chunk_lanes: Optional[int] = -1
    # pf slot-loop unrolling: "auto" | True | False (see DenseGridConfig)
    pallas_pf_unroll: Union[bool, str] = "auto"
    # slot-major Pallas band height
    pallas_sm_row_block: int = 8


@dataclass(frozen=True)
class SimulationConfig:
    fluid: FluidConfig = field(default_factory=FluidConfig)
    viscosity: ViscosityConfig = field(default_factory=ViscosityConfig)
    timestep: TimestepConfig = field(default_factory=TimestepConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    scene: List[SceneOp] = field(default_factory=default_scene)
    gravity: Tuple[float, float] = (0.0, -9.81)

    # ------------------------------------------------------------ serialization

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SimulationConfig":
        def build(klass, sub):
            fields = {f.name for f in dataclasses.fields(klass)}
            unknown = set(sub) - fields
            if unknown:
                raise ValueError(f"unknown {klass.__name__} keys: {sorted(unknown)}")
            return klass(**{
                k: tuple(v) if isinstance(v, list) and k in
                ("rect", "start", "end", "gravity") else v
                for k, v in sub.items()
            })

        scene = [
            build(_SCENE_OPS[op.get("op", "fluid_rect")], op)
            for op in d.get("scene", [])
        ] or default_scene()
        return cls(
            fluid=build(FluidConfig, d.get("fluid", {})),
            viscosity=build(ViscosityConfig, d.get("viscosity", {})),
            timestep=build(TimestepConfig, d.get("timestep", {})),
            solver=build(SolverConfig, d.get("solver", {})),
            scene=scene,
            gravity=tuple(d.get("gravity", (0.0, -9.81))),
        )

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "SimulationConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    # ------------------------------------------------------------------ factory

    def build_world(self) -> FluidParticleWorld:
        world = FluidParticleWorld(
            self.fluid.smoothing_factor,
            self.fluid.particle_density,
            self.fluid.fluid_density,
        )
        for op in self.scene:
            if isinstance(op, FluidRect):
                world.add_fluid_rect(op.rect, op.jitter)
            elif isinstance(op, BoundaryLine):
                world.add_boundary_line(op.start, op.end)
            elif isinstance(op, BoundaryThickLine):
                world.add_boundary_thick_line(op.start, op.end, op.thickness)
            else:  # pragma: no cover
                raise TypeError(f"unknown scene op {op!r}")
        return world

    def build(self):
        """Returns (world, solver, boundary, carry) ready to step. The carry
        init is jitted: eager interpret-mode Pallas kernels (plane kinds off
        TPU) cost minutes, while the identical kernels compile+run in
        seconds under jit."""
        import jax

        from .models.viscosity import PhysicalViscosityModel, XSPHViscosityModel
        from .timemanager import AdaptiveTimeStep, FixedTimeStep

        world = self.build_world()
        h = world.properties.smoothing_length

        if self.viscosity.kind == "xsph":
            viscosity = XSPHViscosityModel(
                smoothing_length=h, epsilon=self.viscosity.xsph_epsilon
            )
        elif self.viscosity.kind == "physical":
            viscosity = PhysicalViscosityModel(
                smoothing_length=h, fluid_viscosity=self.viscosity.fluid_viscosity
            )
        else:
            raise ValueError(f"unknown viscosity kind {self.viscosity.kind!r}")

        cfl_default = (
            0.2 if self.solver.kind.startswith("wcsph") else 1.5
        )  # main.rs:115-118
        if self.timestep.kind == "fixed":
            step_config = FixedTimeStep(self.timestep.fixed_timestep)
        elif self.timestep.kind == "adaptive":
            step_config = AdaptiveTimeStep(
                timestep_max=self.timestep.timestep_max,
                timestep_min=self.timestep.timestep_min,
                cfl_factor=(
                    self.timestep.cfl_factor
                    if self.timestep.cfl_factor is not None
                    else cfl_default
                ),
                target_frame_length=self.timestep.target_frame_length,
            )
        else:
            raise ValueError(f"unknown timestep kind {self.timestep.kind!r}")

        sc = self.solver

        def _grid_knobs(grid):
            """Apply the SolverConfig's DenseGridConfig perf knobs."""
            return dataclasses.replace(
                grid,
                pair_dtype=sc.pair_dtype,
                pallas_pf_chunk_lanes=sc.pallas_pf_chunk_lanes,
                pallas_pf_stat_chunk_lanes=sc.pallas_pf_stat_chunk_lanes,
                pallas_sm_row_block=sc.pallas_sm_row_block,
            )

        if sc.kind in ("wcsph_dense", "wcsph_padded", "wcsph_plane"):
            from .models.wcsph_dense import WCSPHDenseSolver, WCSPHPaddedSolver

            grid = _grid_knobs(world.dense_grid(
                occupancy=sc.dense_occupancy, ny_multiple=sc.dense_ny_multiple
            ))
            if sc.use_pallas_slotmajor or sc.kind == "wcsph_plane":
                grid = dataclasses.replace(grid, use_pallas_slotmajor=True)
            if sc.kind == "wcsph_plane":
                from .models.wcsph_plane import WCSPHPlaneSolver as wcls
            else:
                wcls = (
                    WCSPHPaddedSolver if sc.kind == "wcsph_padded"
                    else WCSPHDenseSolver
                )
            solver = wcls(
                viscosity_model=viscosity,
                properties=world.properties,
                grid=grid,
                step_config=step_config,
                boundary_force_factor=sc.boundary_force_factor,
                target_density_variation=sc.target_density_variation,
                expected_max_flow_speed=sc.expected_max_flow_speed,
                gravity=self.gravity,
            )
            boundary = world.boundary_dense(grid, sc.dense_boundary_occupancy)
            if sc.kind == "wcsph_plane":
                # the plane solver steps against the boundary's prebuilt
                # plane-form geometry (built once per boundary change)
                boundary = solver.boundary_planes(boundary)
            carry = jax.jit(solver.init_carry)(world.initial_state())
        elif sc.kind == "wcsph":
            from .models.wcsph import WCSPHSolver

            solver = WCSPHSolver(
                viscosity_model=viscosity,
                properties=world.properties,
                grid=world.grid,
                step_config=step_config,
                boundary_force_factor=sc.boundary_force_factor,
                target_density_variation=sc.target_density_variation,
                expected_max_flow_speed=sc.expected_max_flow_speed,
                gravity=self.gravity,
            )
            boundary = world.boundary_grid()
            carry = jax.jit(solver.init_carry)(world.initial_state())
        elif sc.kind == "dfsph":
            from .models.dfsph import DFSPHSolver

            solver = DFSPHSolver(
                viscosity_model=viscosity,
                properties=world.properties,
                grid=world.grid,
                step_config=step_config,
                max_avg_density_error=sc.max_avg_density_error,
                max_density_iterations=sc.max_density_iterations,
                max_divergence_error=sc.max_divergence_error,
                max_divergence_iterations=sc.max_divergence_iterations,
                gravity=self.gravity,
            )
            boundary = world.boundary_grid()
            carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
        elif sc.kind in ("dfsph_dense", "dfsph_padded", "dfsph_plane"):
            from .models.dfsph_dense import DFSPHDenseSolver, DFSPHPaddedSolver

            grid = _grid_knobs(world.dense_grid(
                occupancy=sc.dense_occupancy, ny_multiple=sc.dense_ny_multiple
            ))
            if sc.use_pallas_slotmajor or sc.kind == "dfsph_plane":
                grid = dataclasses.replace(grid, use_pallas_slotmajor=True)
            if sc.kind == "dfsph_plane":
                from .models.dfsph_plane import DFSPHPlaneSolver as cls
            else:
                cls = (
                    DFSPHPaddedSolver if sc.kind == "dfsph_padded"
                    else DFSPHDenseSolver
                )
            solver = cls(
                viscosity_model=viscosity,
                properties=world.properties,
                grid=grid,
                step_config=step_config,
                max_avg_density_error=sc.max_avg_density_error,
                max_density_iterations=sc.max_density_iterations,
                max_divergence_error=sc.max_divergence_error,
                max_divergence_iterations=sc.max_divergence_iterations,
                gravity=self.gravity,
                rebuild_every=sc.rebuild_every,
            )
            boundary = world.boundary_dense(grid, sc.dense_boundary_occupancy)
            if sc.kind == "dfsph_plane":
                # the plane solver steps against the boundary's prebuilt
                # plane-form geometry (built once per boundary change)
                boundary = solver.boundary_planes(boundary)
            carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
        else:
            raise ValueError(f"unknown solver kind {sc.kind!r}")

        return world, solver, boundary, carry
