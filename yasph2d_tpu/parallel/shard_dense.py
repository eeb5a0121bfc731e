"""shard_map spatial decomposition of the dense DFSPH solver (SURVEY.md §7 stage 8).

The reference is single-process (rayon) with no distributed backend (SURVEY.md §2);
this module is the TPU-native scaling path. It replaced round 1's pjit auto-SPMD
particle-dimension sharding (retired in round 3), whose global cell-key sort
forced a full all-gather every step. Design:

- the dense grid's cell rows split evenly over a 1D 'space' mesh axis;
- pair passes fetch their +-1 source cell rows from the neighbor shards with ONE
  `lax.ppermute` halo exchange per pass (ops/dense_grid.pair_reduce with
  grid.halo_axis set) — this includes the per-iteration velocity/k-value halos
  inside the DFSPH pressure loops;
- the residual averages of the pressure loops are `lax.psum` all-reduces (the
  reference's `par_iter().sum()/len`, dfsph.rs:221, 376-377), so every shard exits
  the while_loop on the same iteration;
- the CFL max-velocity estimate is a `lax.pmax`.

Two shard solvers share those collectives:

- **DFSPHPaddedShardSolver / ShardedDFSPHPadded** (the fast path): the
  padded-resident carry; cross-shard particle migration is STRUCTURAL — the
  windowed re-bucket's halo rows carry boundary-crossing particles to the
  neighbor shard with no buffers and no caps (ops/dense_grid.rebucket).
- **DFSPHShardMapSolver / ShardedDFSPHDense** (conformance bridge): sorted-carry
  blocks per shard with LOCAL lax.sort (no global sort, no all-gather) and
  bounded fixed-size ppermute migration buffers; buffer overflow degrades
  gracefully and is counted in Diagnostics.migration_drops.

Validated against the single-device solvers on the 8-device virtual CPU mesh
(tests/test_shard_dense.py, tests/test_shard_padded.py), including HLO
inspections that the compiled steps contain collective-permutes and NO
all-gather.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models.dfsph_dense import (
    BoundaryDense,
    DFSPHDenseSolver,
    DFSPHPaddedSolver,
)
from ..models.wcsph_dense import WCSPHPaddedSolver
from ..ops.dense_grid import DenseGridConfig
from ..units import INDEX, REAL
from ..utils.diagnostics import Diagnostics
from ..world import ParticleState

SPACE_AXIS = "space"


def make_space_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SPACE_AXIS,))


def make_local_grid(full_grid: DenseGridConfig, n_shards: int,
                    axis: str = SPACE_AXIS) -> DenseGridConfig:
    """Per-shard grid config: ny is one shard's row count, halo_axis enables the
    ppermute halo exchange in pair_reduce, origin stays GLOBAL (each shard derives
    its row offset from lax.axis_index)."""
    assert full_grid.ny % n_shards == 0, (
        f"grid ny={full_grid.ny} must divide over {n_shards} shards "
        "(build with world.dense_grid(ny_multiple=n_shards))"
    )
    ny_l = full_grid.ny // n_shards
    rb = min(full_grid.row_block or ny_l, ny_l)
    while ny_l % rb:  # largest divisor <= requested row_block (halo alignment)
        rb -= 1
    return dataclasses.replace(
        full_grid, ny=ny_l, row_block=rb, halo_axis=(axis, n_shards)
    )


class _SpatialCollectives:
    """Collective overrides of the dense solvers' single-device reduction hooks,
    shared by the sorted-carry and padded-resident shard solvers. Host classes
    carry the LOCAL grid (make_local_grid) and run inside shard_map."""

    @property
    def _axis(self):
        return self.grid.halo_axis[0]

    @property
    def _n_shards(self):
        return self.grid.halo_axis[1]

    def _global_cells(self, positions):
        g = self.grid
        inv = jnp.asarray(1.0 / g.cell_size, dtype=REAL)
        origin = jnp.asarray(g.origin, dtype=REAL)
        coords = jnp.floor((positions - origin) * inv).astype(INDEX)
        cx = jnp.clip(coords[..., 0], 0, g.nx - 1)
        cy = jnp.clip(coords[..., 1], 0, g.ny * self._n_shards - 1)
        return cx, cy

    def _sort(self, pytree, positions, alive):
        """LOCAL cell sort: keys are row-major within this shard's row slice; dead
        particles (and strays outside the slice, which migration handles) clamp
        into the slice. Replaces the global sort — no cross-shard data movement."""
        g = self.grid
        row0 = jax.lax.axis_index(self._axis).astype(INDEX) * g.ny
        cx, cy = self._global_cells(positions)
        ly = jnp.clip(cy - row0, 0, g.ny - 1)
        keys = jnp.where(alive, ly * g.nx + cx, g.num_cells)
        n = positions.shape[0]
        sorted_keys, perm = jax.lax.sort(
            (keys.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        return jax.tree_util.tree_map(lambda a: a[perm], pytree), sorted_keys

    def _mean_live(self, value_pad, ctx, n_particles):
        # the reference's global residual average (dfsph.rs:221, 376-377): psum of
        # per-shard partial sums -> identical exit decision on every shard
        total = jax.lax.psum(
            jnp.sum(jnp.where(ctx.mask, value_pad, 0.0)), self._axis
        )
        return total / jnp.asarray(n_particles, REAL)

    def _count_live(self, alive):
        return jax.lax.psum(jnp.sum(alive).astype(REAL), self._axis)

    def _max_velocity(self, vstar_pad, mask):
        """CFL estimate over live PADDED slots, maxed across shards. Same
        semantics as the base class (dfsph_dense.py): overflow-dropped particles
        are excluded — they receive gravity-only predictions and no pair forces,
        so they cannot exceed the live max by more than one gravity kick."""
        v_est_sq = jnp.where(mask, jnp.sum(vstar_pad * vstar_pad, axis=-1), 0.0)
        return jnp.sqrt(jax.lax.pmax(jnp.max(v_est_sq), self._axis))

    def _sum_counts(self, count):
        return jax.lax.psum(count, self._axis)


@dataclasses.dataclass(frozen=True)
class DFSPHPaddedShardSolver(_SpatialCollectives, DFSPHPaddedSolver):
    """Padded-resident DFSPH under spatial sharding: the multi-chip fast path.

    Particle migration is STRUCTURAL here — there are no per-particle blocks, no
    send buffers, and no migration_slots cap: a particle advecting across the
    shard boundary is simply re-bucketed into the neighbor shard's edge cells
    through the same one-cell-row `lax.ppermute` halo every pair pass already
    uses (ops/dense_grid.rebucket with grid.halo_axis set). Per-step capacity is
    bounded by the edge row's slot count (nx * P per direction), orders of
    magnitude above the sorted path's fixed buffers; overflow shows up as
    ordinary occupancy drops in Diagnostics.neighbor_drops.

    On stale steps (rebuild_every > 1) cell assignment — including shard
    assignment — is frozen exactly like the single-device padded solver: a
    boundary-crossing particle stays clamped in the old shard's edge cells until
    the next rebuild (bounded-deviation contract of DFSPHDenseSolver.rebuild_every).
    """

    def _rebucket_row0(self):
        g = self.grid
        return jax.lax.axis_index(self._axis).astype(INDEX) * g.ny


@dataclasses.dataclass(frozen=True)
class DFSPHShardMapSolver(_SpatialCollectives, DFSPHDenseSolver):
    """Sorted-carry dense DFSPH with the spatial-decomposition hooks filled in
    with collectives (the conformance-bridge shard path; DFSPHPaddedShardSolver
    is the fast path).

    `grid` must be the LOCAL grid from make_local_grid. All `step`/`init_carry`/
    `simulate` methods must run INSIDE shard_map (use ShardedDFSPHDense below);
    they are ordinary SPMD functions of this shard's block.
    """

    migration_slots: int = 256

    # ------------------------------------------------------------- migration

    def _migrate(self, tree, positions, alive):
        """Bounded particle migration to adjacent shards (the 'bounded per-step
        send buffers' of SURVEY.md §5). tree = (*data_leaves, alive); both
        directions move at most `migration_slots` particles per step.

        Migration runs only on REBUILD steps (the base step() calls _migrate
        inside the `if rebuild:` branch): with rebuild_every > 1, particles that
        advect past the shard's row slice on a stale step stay on the old shard,
        clamped into its border cells, until the next rebuild — the same bounded
        staleness the single-device solver accepts for cell assignment
        (DFSPHDenseSolver.rebuild_every), bounded by tests/test_shard_dense.py's
        stale-rebuild parity test."""
        g = self.grid
        axis, n_shards = g.halo_axis
        m = self.migration_slots
        row0 = jax.lax.axis_index(axis).astype(INDEX) * g.ny
        _cx, cy = self._global_cells(positions)
        ly = cy - row0
        go_up = alive & (ly >= g.ny)
        go_down = alive & (ly < 0)

        fwd = [(i, i + 1) for i in range(n_shards - 1)]
        bwd = [(i + 1, i) for i in range(n_shards - 1)]
        *data, _ = tree

        def pack_and_send(flags, perm):
            order = jnp.argsort(~flags)  # stable: senders first
            idx = order[:m]
            valid = flags[idx]  # front-loaded ones
            unsent = jnp.sum(flags, dtype=jnp.int32) - jnp.sum(
                valid, dtype=jnp.int32
            )
            # one ppermute per direction: every float leaf plus the valid flags
            # travel in a single (m, K+1) f32 buffer (collective launches have
            # fixed latency — see ops/dense_grid.halo2d_multi)
            cols = [a[idx].reshape(m, -1).astype(REAL) for a in data]
            packed = jnp.concatenate(cols + [valid[:, None].astype(REAL)], axis=-1)
            # ppermute fills unaddressed edge shards with zeros -> valid False
            packed_r = jax.lax.ppermute(packed, axis, perm)
            buf_r, o = [], 0
            for a in data:
                k = 1
                for s in a.shape[1:]:
                    k *= s
                buf_r.append(
                    packed_r[:, o : o + k].reshape((m,) + a.shape[1:]).astype(a.dtype)
                )
                o += k
            valid_r = packed_r[:, -1] > 0.5
            sent = jnp.zeros_like(flags).at[idx].set(valid)
            return buf_r, valid_r, sent, unsent

        buf_up, valid_up, sent_up, drop_up = pack_and_send(go_up, fwd)
        buf_dn, valid_dn, sent_dn, drop_dn = pack_and_send(go_down, bwd)

        stay_alive = alive & ~sent_up & ~sent_dn
        n_local = positions.shape[0]

        # merge: alive-first stable compaction of (local + incoming); the fixed
        # capacity keeps shapes static — live particles beyond capacity are
        # dropped and counted (raise capacity slack if this ever fires)
        big = [
            jnp.concatenate([a, up, dn], axis=0)
            for a, up, dn in zip(data, buf_up, buf_dn)
        ]
        big_alive = jnp.concatenate([stay_alive, valid_up, valid_dn], axis=0)
        order = jnp.argsort(~big_alive)
        keep = order[:n_local]
        new_tree = tuple(a[keep] for a in big) + (big_alive[keep],)
        capacity_drops = jnp.sum(big_alive, dtype=jnp.int32) - jnp.sum(
            big_alive[keep], dtype=jnp.int32
        )
        drops = jax.lax.psum(drop_up + drop_dn + capacity_drops, axis)
        return new_tree, drops


class ShardedDFSPHDense:
    """Host-facing driver: distributes a scene over the mesh and exposes jitted
    shard_map wrappers of init_carry / simulate.

    Usage:
        full_grid = world.dense_grid(occupancy=8, ny_multiple=len(devices))
        sharded = ShardedDFSPHDense(
            viscosity_model=..., properties=..., full_grid=full_grid,
            step_config=..., mesh=make_space_mesh())
        carry = sharded.init(world.initial_state(), world.boundary_dense(full_grid))
        carry, diag = sharded.simulate(carry, num_steps)
    """

    SOLVER_CLS = DFSPHShardMapSolver
    TWIN_CLS = DFSPHDenseSolver  # single-shard twin used for carry leaf shapes

    def __init__(self, viscosity_model, properties, full_grid: DenseGridConfig,
                 step_config, mesh: Mesh, capacity: Optional[int] = None,
                 migration_slots: int = 256, **solver_kwargs):
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self.full_grid = full_grid
        self.capacity = capacity
        grid_l = make_local_grid(full_grid, self.n_shards, mesh.axis_names[0])
        if any(
            f.name == "migration_slots" for f in dataclasses.fields(self.SOLVER_CLS)
        ):
            solver_kwargs = dict(solver_kwargs, migration_slots=migration_slots)
        self.solver = self.SOLVER_CLS(
            viscosity_model=viscosity_model, properties=properties, grid=grid_l,
            step_config=step_config,
            **solver_kwargs,
        )
        self._boundary = None
        self._init_jit = None
        self._sim_cache = {}

    # --------------------------------------------------------- distribution

    def distribute(self, state: ParticleState) -> ParticleState:
        """Host-side: bucket particles into their owning shard's block (fixed
        capacity, dead-padded), concatenated shard-major so the global array
        shards evenly over the mesh."""
        g = self.full_grid
        pos = np.asarray(state.positions)
        vel = np.asarray(state.velocities)
        dens = np.asarray(state.densities)
        alive = np.asarray(state.alive)
        cy = np.clip(
            np.floor((pos[:, 1] - g.origin[1]) / g.cell_size).astype(np.int64),
            0, g.ny - 1,
        )
        ny_l = g.ny // self.n_shards
        shard = np.clip(cy // ny_l, 0, self.n_shards - 1)
        counts = np.bincount(shard[alive], minlength=self.n_shards)
        cap = self.capacity
        if cap is None:
            # slack absorbs migration imbalance over the run
            cap = int(counts.max() * 1.25) + 64
        assert counts.max() <= cap, f"shard overflow: {counts.max()} > {cap}"
        blocks = {"positions": [], "velocities": [], "densities": [], "alive": []}
        for d in range(self.n_shards):
            sel = np.flatnonzero((shard == d) & alive)
            k = sel.size
            bp = np.zeros((cap, 2), np.float32)
            bv = np.zeros((cap, 2), np.float32)
            bd = np.zeros((cap,), np.float32)
            ba = np.zeros((cap,), bool)
            bp[:k], bv[:k], bd[:k], ba[:k] = pos[sel], vel[sel], dens[sel], True
            blocks["positions"].append(bp)
            blocks["velocities"].append(bv)
            blocks["densities"].append(bd)
            blocks["alive"].append(ba)
        return ParticleState(
            **{k: jnp.asarray(np.concatenate(v)) for k, v in blocks.items()}
        )

    # -------------------------------------------------------------- wrappers

    def _specs_for(self, shapes, n_local):
        g = self.solver.grid

        def leaf_spec(l):
            s = l.shape
            if len(s) == 0:
                return P()
            if len(s) >= 2 and s[0] == g.ny and s[1] == g.nx:
                return P(SPACE_AXIS)
            if s[0] == g.num_cells:  # flat (C, P) slot arrays
                return P(SPACE_AXIS)
            if s[0] == n_local:
                return P(SPACE_AXIS)
            return P()

        return jax.tree_util.tree_map(leaf_spec, shapes)

    def _shard_map(self, f, in_specs, out_specs):
        try:
            return _shard_map(f, mesh=self.mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:  # older jax: check_rep
            return _shard_map(f, mesh=self.mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

    def _carry_specs(self, state: ParticleState, boundary: BoundaryDense):
        """Leaf specs of the carry, via a single-shard eval_shape (the halo-free
        twin solver has identical output SHAPES per shard)."""
        n_local = state.positions.shape[0] // self.n_shards
        grid_l = dataclasses.replace(self.solver.grid, halo_axis=None)
        twin = self.TWIN_CLS(
            viscosity_model=self.solver.viscosity_model,
            properties=self.solver.properties, grid=grid_l,
            step_config=self.solver.step_config,
        )
        local_state = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct((n_local,) + a.shape[1:], a.dtype), state
        )
        local_boundary = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(
                ((grid_l.ny,) + a.shape[1:]) if a.ndim >= 2 else a.shape, a.dtype
            ),
            boundary,
        )
        shapes = jax.eval_shape(twin.init_carry, local_state, local_boundary)
        return self._specs_for(shapes, n_local), n_local

    def init(self, state: ParticleState, boundary: BoundaryDense):
        """Distribute + shard_map'ed init_carry. Returns (carry, boundary) placed
        on the mesh; keep `boundary` for simulate()."""
        state = self.distribute(state)
        carry_specs, n_local = self._carry_specs(state, boundary)
        state_specs = self._specs_for(
            jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(
                    (a.shape[0] // self.n_shards,) + a.shape[1:], a.dtype
                ),
                state,
            ),
            n_local,
        )
        boundary_specs = self._specs_for(
            jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(
                    ((self.solver.grid.ny,) + a.shape[1:]) if a.ndim >= 2
                    else a.shape,
                    a.dtype,
                ),
                boundary,
            ),
            n_local,
        )
        self._carry_specs_cached = carry_specs
        self._boundary_specs = boundary_specs
        fn = self._shard_map(
            self.solver.init_carry,
            in_specs=(state_specs, boundary_specs),
            out_specs=carry_specs,
        )
        return jax.jit(fn)(state, boundary), boundary

    def simulate_fn(self, num_steps: int):
        """Jitted shard_map'ed solver.simulate with a static step count."""
        if num_steps not in self._sim_cache:
            diag_specs = jax.tree_util.tree_map(lambda _: P(), Diagnostics.zeros())

            def f(carry, boundary):
                return self.solver.simulate(carry, boundary, num_steps)

            fn = self._shard_map(
                f,
                in_specs=(self._carry_specs_cached, self._boundary_specs),
                out_specs=(self._carry_specs_cached, diag_specs),
            )
            self._sim_cache[num_steps] = jax.jit(fn)
        return self._sim_cache[num_steps]

    def simulate(self, carry, boundary, num_steps: int):
        return self.simulate_fn(num_steps)(carry, boundary)


@dataclasses.dataclass(frozen=True)
class WCSPHPaddedShardSolver(_SpatialCollectives, WCSPHPaddedSolver):
    """Padded-resident WCSPH under spatial sharding: ppermute halos in the
    window passes and the re-bucket (structural migration), pmax CFL. WCSPH has
    no residual loops, so these are the only collectives."""

    def _rebucket_row0(self):
        g = self.grid
        return jax.lax.axis_index(self._axis).astype(INDEX) * g.ny


class ShardedDFSPHPadded(ShardedDFSPHDense):
    """Host-facing driver for the padded-resident shard solver (the multi-chip
    fast path): same distribution/wrapper machinery as ShardedDFSPHDense, with
    structural halo migration instead of bounded send buffers."""

    SOLVER_CLS = DFSPHPaddedShardSolver
    TWIN_CLS = DFSPHPaddedSolver


class ShardedWCSPHPadded(ShardedDFSPHDense):
    """Host-facing driver for the sharded padded WCSPH (same distribution and
    shard_map machinery; WCSPH carries no boundary-dependent warm state)."""

    SOLVER_CLS = WCSPHPaddedShardSolver
    TWIN_CLS = WCSPHPaddedSolver
