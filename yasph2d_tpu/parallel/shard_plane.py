"""Spatially sharded plane-resident solvers — the multi-chip Pallas fast path.

The plane-resident solvers (models/dfsph_plane.py, models/wcsph_plane.py) keep
all state in slot-major plane form and run every pair pass and the re-bucket
inside slot-major Pallas kernels. This module shards them over cell rows with
the same one-cell-row halo contract as parallel/shard_dense.py, with ALL
collectives OUTSIDE the kernels:

- `ops/pallas_slotmajor._pf_block_source` fills its boundary rows from the
  neighbor shards with ONE packed `lax.ppermute` pair per source build
  (geometry once per rebuild, values once per pass / loop iteration);
- band skip flags see the neighbor's seam-row occupancy (`pass_flags(grid=...)`),
  cached per rebuild in PlaneCtx.flags_dyn;
- `pf_rebucket`'s halo rows ARE the cross-shard migration (structural, no
  buffers), exactly like dense_grid.rebucket;
- residual averages / CFL / drop counts psum/pmax through the same
  `_SpatialCollectives` hooks as the padded shard solvers.

Requires the per-shard row count to be divisible by the slot-major row block
(NYP == ny per shard, so exchanged rows are grid-adjacent) —
`make_local_plane_grid` picks compliant blocks.

Reference: the rayon data-parallel stages of neighborhood_search.rs /
dfsph.rs / wscsph.rs, re-expressed as SPMD spatial decomposition (SURVEY.md
§5 distributed backend).
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..models.dfsph_plane import DFSPHPlaneSolver
from ..models.wcsph_plane import WCSPHPlaneSolver
from ..ops.dense_grid import DenseGridConfig
from ..ops.pallas_slotmajor import pf_dims
from ..units import INDEX, REAL
from .shard_dense import (
    SPACE_AXIS,
    ShardedDFSPHDense,
    _SpatialCollectives,
    make_local_grid,
)

P = jax.sharding.PartitionSpec


def make_local_plane_grid(full_grid: DenseGridConfig, n_shards: int,
                          axis: str = SPACE_AXIS) -> DenseGridConfig:
    """make_local_grid + slot-major row blocks that divide the shard height
    (NYP == ny per shard, so `_pf_halo`'s exchanged rows are grid-adjacent).

    Build the FULL grid with `ny_multiple = n_shards * pallas_sm_row_block`
    (world.dense_grid) to keep the configured row block: otherwise this
    shrinks it to the largest divisor of the shard height, and a narrow
    block (e.g. 5 of 8 sublane rows at ny=325, n=1) costs real kernel
    throughput — measured as most of the apparent n=1 wrapper overhead
    (PERF.md round 5). The padding rows sit at the global domain top,
    mask-dead, physics-inert."""
    grid_l = make_local_grid(full_grid, n_shards, axis)
    ny_l = grid_l.ny
    br = min(grid_l.pallas_sm_row_block, ny_l)
    while ny_l % br:
        br -= 1
    return dataclasses.replace(grid_l, pallas_sm_row_block=br)


class _PlaneCollectives(_SpatialCollectives):
    """Collective overrides of the plane solvers' reduction hooks (the plane
    twins of _SpatialCollectives' vector-last hooks; _count_live/_sum_counts
    are layout-agnostic and inherit the psum versions directly)."""

    # pf_* kernels support halo collectives (see ops/pallas_slotmajor.py);
    # lifts the padded solvers' single-device slot-major assert
    _pf_sharded_ok = True

    def _rebucket_row0(self):
        return jax.lax.axis_index(self._axis).astype(INDEX) * self.grid.ny

    def _mean_live_pf(self, value, ctx, n_particles):
        # global residual average (dfsph.rs:221, 376-377): identical loop-exit
        # decision on every shard
        total = jax.lax.psum(
            jnp.sum(jnp.where(ctx.mask, value, 0.0)), self._axis
        )
        return total / jnp.asarray(n_particles, REAL)

    def _max_velocity_pf(self, vstar, mask):
        v_est_sq = jnp.where(mask, jnp.sum(vstar * vstar, axis=0), 0.0)
        return jnp.sqrt(jax.lax.pmax(jnp.max(v_est_sq), self._axis))

    def _max_vel_from_sq(self, v_est_sq):
        return jnp.sqrt(jax.lax.pmax(jnp.max(v_est_sq), self._axis))


@dataclasses.dataclass(frozen=True)
class DFSPHPlaneShardSolver(_PlaneCollectives, DFSPHPlaneSolver):
    """Plane-resident DFSPH under spatial sharding. Migration is structural
    through pf_rebucket's halo rows (no buffers, no caps), like
    DFSPHPaddedShardSolver; per-step cross-shard capacity is the edge row's
    slot count per direction."""


@dataclasses.dataclass(frozen=True)
class WCSPHPlaneShardSolver(_PlaneCollectives, WCSPHPlaneSolver):
    """Plane-resident WCSPH under spatial sharding: pmax CFL + structural
    re-bucket migration are the only collectives (WCSPH has no residual
    loops)."""


class _ShardedPlaneBase(ShardedDFSPHDense):
    """Host-facing driver for the plane-resident shard solvers: same
    distribution machinery as ShardedDFSPHDense, with plane-form leaf specs
    and the boundary's plane geometry built INSIDE shard_map at init (its
    seam rows are a collective exchange)."""

    def __init__(self, viscosity_model, properties, full_grid: DenseGridConfig,
                 step_config, mesh, capacity=None, **solver_kwargs):
        mesh_axis = mesh.axis_names[0]
        n_shards = mesh.devices.size
        grid_l = make_local_plane_grid(full_grid, n_shards, mesh_axis)
        # bypass the base __init__'s make_local_grid with a pre-built solver
        self.mesh = mesh
        self.n_shards = n_shards
        self.full_grid = full_grid
        self.capacity = capacity
        self.solver = self.SOLVER_CLS(
            viscosity_model=viscosity_model, properties=properties, grid=grid_l,
            step_config=step_config, **solver_kwargs,
        )
        self._boundary = None
        self._init_jit = None
        self._sim_cache = {}

    # ------------------------------------------------------------- leaf specs

    def _specs_for(self, shapes, n_local):
        g = self.solver.grid
        nbr, nyp, nxp, nxs = pf_dims(g, g.pallas_sm_row_block)

        def leaf_spec(l):
            s = l.shape
            if len(s) == 0:
                return P()
            if len(s) >= 2 and s[0] == g.ny and s[1] == g.nx:
                return P(SPACE_AXIS)  # dense (ny, nx, ...) boundary leaves
            if len(s) == 5 and s[4] in (nxp, nxs):
                return P(None, None, SPACE_AXIS)  # blocked geom: band axis
            if len(s) == 4 and s[3] == nxp:
                return P(None, None, SPACE_AXIS)  # (2, P, NYP, NXP) vectors
            if len(s) == 3 and s[2] == nxp:
                return P(None, SPACE_AXIS)  # (P, NYP, NXP) scalar planes
            if len(s) == 2 and s[0] == nbr:
                return P(SPACE_AXIS)  # (nbr, 1) flags / (nbr, ncb) col chunks
            if len(s) == 1 and s[0] in (nbr, 1):
                # (nbr,) band bits / slot-loop bounds; (1,) per-shard seam
                # edge bits (PFGeom.edge_below/above)
                return P(SPACE_AXIS)
            if s[0] == n_local:
                return P(SPACE_AXIS)  # per-particle state blocks
            return P()

        return jax.tree_util.tree_map(leaf_spec, shapes)

    # ------------------------------------------------------------------- init

    def _twin(self):
        grid_l = dataclasses.replace(self.solver.grid, halo_axis=None)
        return self.TWIN_CLS(
            viscosity_model=self.solver.viscosity_model,
            properties=self.solver.properties, grid=grid_l,
            step_config=self.solver.step_config,
        )

    def init(self, state, boundary, use_jit: bool = True):
        """Distribute + shard_map'ed (boundary_planes, init_carry). Returns
        (carry, boundary_planes) placed on the mesh; pass boundary_planes to
        simulate(). `use_jit=False` runs init eagerly (CPU tests: the Pallas
        kernels then run in interpret mode without a whole-init compile)."""
        state = self.distribute(state)
        n_local = state.positions.shape[0] // self.n_shards
        twin = self._twin()
        local_state = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(
                (n_local,) + a.shape[1:], a.dtype
            ),
            state,
        )
        local_boundary = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(
                ((self.solver.grid.ny,) + a.shape[1:]) if a.ndim >= 2
                else a.shape,
                a.dtype,
            ),
            boundary,
        )

        def build(st, bd):
            bpl = self.solver.boundary_planes(bd)
            return self.solver.init_carry(st, bpl), bpl

        def twin_build(st, bd):
            bpl = twin.boundary_planes(bd)
            return twin.init_carry(st, bpl), bpl

        carry_shapes, bpl_shapes = jax.eval_shape(
            twin_build, local_state, local_boundary
        )
        self._carry_specs_cached = self._specs_for(carry_shapes, n_local)
        self._boundary_specs = self._specs_for(bpl_shapes, n_local)
        state_specs = self._specs_for(local_state, n_local)
        in_boundary_specs = self._specs_for(local_boundary, n_local)
        fn = self._shard_map(
            build,
            in_specs=(state_specs, in_boundary_specs),
            out_specs=(self._carry_specs_cached, self._boundary_specs),
        )
        return (jax.jit(fn) if use_jit else fn)(state, boundary)

    def step_fn(self):
        """UN-jitted shard_map'ed solver.step (eager CPU drives; prefer
        simulate_fn on TPU). Call after init()."""
        from ..utils.diagnostics import Diagnostics

        diag_specs = jax.tree_util.tree_map(lambda _: P(), Diagnostics.zeros())
        return self._shard_map(
            self.solver.step,
            in_specs=(self._carry_specs_cached, self._boundary_specs),
            out_specs=(self._carry_specs_cached, diag_specs),
        )


class ShardedDFSPHPlane(_ShardedPlaneBase):
    SOLVER_CLS = DFSPHPlaneShardSolver
    TWIN_CLS = DFSPHPlaneSolver


class ShardedWCSPHPlane(_ShardedPlaneBase):
    SOLVER_CLS = WCSPHPlaneShardSolver
    TWIN_CLS = WCSPHPlaneSolver
