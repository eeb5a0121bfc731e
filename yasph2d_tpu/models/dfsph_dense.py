"""DFSPH on the dense padded cell grid — the TPU fast path.

Same algorithm as models/dfsph.py (Bender & Koschier, reference: src/sph/solver/
dfsph.rs — see that module for the step-by-step reference mapping), different data
layout: every pair interaction runs in the dense (ny, nx, P) slot layout of
ops/dense_grid.py, where a 3x3 cell neighborhood is NINE STATIC SLICES instead of a
gather through neighbor-index tables. The pressure loops carry their state in padded
layout, so a loop iteration is pure fused VPU arithmetic — no gather, no scatter, no
searchsorted anywhere in the iterated hot path.

Layout discipline:
- carry state lives in SORTED particle order ((N,) arrays, cell-sorted each step,
  identity-unstable across steps exactly like the reference and the table solver);
- a per-step `DenseCtx` freezes the padded geometry (built once per neighborhood
  rebuild); sorted <-> padded conversions are two cheap (N,)-gathers at loop
  boundaries only;
- residual means divide by the live particle count (reference averages over
  particles: dfsph.rs:221, 376-377).

Validated by cross-checking against the faithful table solver (tests/test_dfsph_dense.py).
"""

import dataclasses
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..units import REAL
from typing import Optional

from ..ops.dense_grid import (
    DenseGridConfig,
    SlotGrid,
    build_slot_grid,
    cached_pair_reduce,
    cell_keys,
    pad_to_slots,
    rebucket,
    sort_by_dense_keys,
    pair_map,
    pair_reduce,
    slots_to_sorted,
)
from ..ops.pallas_slotmajor import SMGeom, build_geom, pass_flags, sm_pair_reduce
from ..ops.smoothing_kernels import WendlandQuinticC2
from ..timemanager import StepConfig, TimeState, update_simulation_step
from ..utils.diagnostics import Diagnostics
from ..world import GRAVITY, FluidProperties, ParticleState
from .viscosity import ViscosityModel

ALPHA_EPSILON = 1e-6  # dfsph.rs:71


class BoundaryDense(NamedTuple):
    """Static (boundary) index space in dense layout; built on boundary change."""

    pos_pad: jax.Array  # (ny, nx, Pb, 2)
    mask: jax.Array  # (ny, nx, Pb) bool
    num_dropped: jax.Array  # () int32


def build_boundary_dense(
    boundary_positions: jax.Array, grid: DenseGridConfig, occupancy=None
) -> BoundaryDense:
    """Build the static index space. `occupancy=None` sizes the slot axis to the
    boundary's TRUE maximum cell occupancy (static geometry, known exactly) — the
    candidate axis of every fluid-vs-boundary pair pass scales with it, so a tight
    fit beats a safe default."""
    import numpy as np

    keys_host = np.asarray(cell_keys(boundary_positions, grid))
    if occupancy is None:
        counts = np.bincount(keys_host) if keys_host.size else np.zeros(1, np.int64)
        occupancy = max(int(counts.max()), 1)
        occupancy += (-occupancy) % 2  # even: friendlier sublane tiling
    bgrid = dataclasses.replace(grid, occupancy=occupancy)
    keys = cell_keys(boundary_positions, bgrid)
    order = jnp.argsort(keys)
    sorted_pos = boundary_positions[order]
    slots = build_slot_grid(keys[order], bgrid)
    return BoundaryDense(
        pos_pad=pad_to_slots(sorted_pos, slots, bgrid),
        mask=slots.slot_mask.reshape(bgrid.ny, bgrid.nx, occupancy),
        num_dropped=slots.num_dropped,
    )


class DenseCtx(NamedTuple):
    """Per-rebuild pair context: everything that is invariant while positions are
    frozen (the table solver's _PairCache analog, plus the layout itself).

    All position-only pair quantities — density sums, alpha terms, neighbor counts,
    static gradient sums — come out of exactly TWO pair passes (one against the fluid
    grid, one against the boundary grid), minimizing window materialization traffic.
    """

    slots: Optional[SlotGrid]  # None on the padded-resident path
    pos_pad: jax.Array  # (ny, nx, P, 2)
    mask: jax.Array  # (ny, nx, P) bool
    sum_grad_stat: jax.Array  # (ny, nx, P, 2): sum of grad W to boundary neighbors
    neighbor_total: jax.Array  # (ny, nx, P) f32: dyn+static neighbor counts
    densities_pad: jax.Array  # (ny, nx, P): clamped density per slot
    alpha_pad: jax.Array  # (ny, nx, P): DFSPH alpha per slot
    grad_dyn: Optional[jax.Array]  # (ny, nx, P, 9P, 2) masked dyn-pair gradients,
    # cached for the pressure loops (None unless cache_loop_gradients or
    # mxu_loop_gradients is on; bf16 under mxu_loop_gradients)
    sum_grad_dyn: Optional[jax.Array]  # (ny, nx, P, 2) row sums of grad_dyn in
    # f32 (mxu_loop_gradients only): the v_i / k_i terms of the loop passes
    num_dropped: jax.Array  # () int32
    sm: Optional[SMGeom] = None  # blocked slot-major geometry planes
    # (use_pallas_slotmajor only): shared by every fluid-fluid pass this rebuild


class DFSPHDenseCarry(NamedTuple):
    """Solver state between steps. Loop state is carried in BOTH layouts where
    each is consumed: slot-pad gathers cost ~6 ms per million OUTPUT rows on TPU
    (PERF.md round-2 trace), and the slot grid holds ~10x more slots than
    particles, so every avoided pad matters. The divergence loop's padded output
    IS next step's velocity input (the slot layout only changes at the mid-step
    rebuild), so `v_pad`, `kappa_pad`, `stiff_pad` carry padded and the sorted
    twins exist only where the sorted pipeline (advection/sort/scene API) needs
    them."""

    particles: ParticleState  # sorted layout
    alpha: jax.Array  # (N,) sorted
    warmstart_stiffness: jax.Array  # (N,) sorted (rebuild re-pack input)
    v_pad: jax.Array  # (ny, nx, P, 2) in ctx.slots layout (== velocities)
    kappa_pad: jax.Array  # (ny, nx, P) in ctx.slots layout
    stiff_pad: jax.Array  # (ny, nx, P) in ctx.slots layout (stale-step input)
    ctx: DenseCtx
    prev_density_iterations: jax.Array  # () int32
    prev_divergence_iterations: jax.Array  # () int32
    time: TimeState


@dataclass(frozen=True)
class DFSPHDenseSolver:
    """Configuration + pure jittable step (tolerances as dfsph.rs:49-55)."""

    viscosity_model: ViscosityModel
    properties: FluidProperties
    grid: DenseGridConfig
    step_config: StepConfig
    # Cache per-pair kernel gradients for the pressure loops (~9P x slot-count x 8
    # bytes of HBM). Measured SLOWER than recomputation on the TPU at 100k particles
    # (110 vs 87 ms/step): the cached path forgoes empty-block skipping and pays the
    # cache traffic. Kept as an option; default off.
    cache_loop_gradients: bool = False
    # MXU formulation of the pressure-loop passes (round-3 verdict item 1): cache
    # the masked pair gradients G (ny, nx, P, 9P, 2) in bfloat16 at rebuild, and
    # run each loop iteration's velocity-divergence / k-correction as batched
    # lax.dot_general contractions over the (9P, 2) candidate axes with float32
    # accumulation — MXU work instead of VPU broadcast-reduce. bf16 G rounds the
    # gradients by ~0.4%, so this is NOT the conformance path (iteration counts
    # can shift by 1 near tolerance boundaries); measurement recorded in PERF.md.
    mxu_loop_gradients: bool = False
    # Band size for the padded-resident re-bucket (None = grid.row_block). The
    # re-bucket's per-band fixed costs (output layout copies, skip-branch
    # zeros) differ from the pair passes', so its optimum differs; see PERF.md.
    rebucket_row_block: Optional[int] = None
    # Re-sort + rebuild the slot grid every k-th step only (opt-in, Verlet-list
    # style). Stale steps keep the previous cell assignment but refresh every
    # position-dependent quantity (densities, alpha, gradient sums) with the TRUE
    # advected positions, so pair GEOMETRY stays exact — only pairs that entered
    # the support radius from OUTSIDE the stale 3x3 cell window are missed. CFL
    # bounds per-step displacement to a fraction of a cell, so the miss window is
    # narrow; the deviation is bounded by tests/test_dfsph_dense.py. The reference
    # rebuilds every step (neighborhood_search.rs) — 1 is the conformance default.
    rebuild_every: int = 1
    max_avg_density_error: float = 0.01 / 100.0
    max_density_iterations: int = 200
    max_divergence_error: float = 0.1 / 100.0
    max_divergence_iterations: int = 400
    gravity: tuple = GRAVITY

    # pf_* (plane-form) slot-major kernels support halo collectives; the
    # vector-last sm_* kernels this class uses do not. The plane shard solvers
    # (parallel/shard_plane.py) flip this to lift the halo assert.
    _pf_sharded_ok = False
    # pf_* kernels support bf16 operand planes (cell-relative rebase, f32
    # math); the sm_* kernels do not. The plane solvers flip this.
    _pf_bf16_ok = False

    def __post_init__(self):
        object.__setattr__(
            self, "kernel", WendlandQuinticC2(self.properties.smoothing_length)
        )
        assert abs(self.grid.cell_size - self.properties.smoothing_length) < 1e-12
        if self.grid.pair_dtype != "float32":
            assert not self.grid.use_pallas and not self.cache_loop_gradients, (
                "bfloat16 pair math is only implemented for the XLA pair_reduce path"
            )
        if self.mxu_loop_gradients:
            assert not self.cache_loop_gradients and not self.grid.use_pallas, (
                "mxu_loop_gradients excludes the other loop-pass variants"
            )
            assert self.grid.halo_axis is None, (
                "mxu_loop_gradients: pair_map has no halo exchange (single-chip "
                "experiment; see PERF.md)"
            )
        if self.grid.use_pallas_slotmajor:
            assert not self.grid.use_pallas and not self.cache_loop_gradients \
                and not self.mxu_loop_gradients, (
                    "use_pallas_slotmajor excludes the other pair-pass variants"
                )
            assert self.grid.halo_axis is None or self._pf_sharded_ok, (
                "the vector-last slot-major (sm_*) path has no halo "
                "collectives; sharded slot-major runs through the plane-form "
                "solvers (parallel/shard_plane.py)"
            )
            assert self.grid.pair_dtype == "float32" or self._pf_bf16_ok, (
                "the vector-last slot-major (sm_*) kernels compute in float32 "
                "planes; bf16 operand planes need the plane-form solvers"
            )
        if self.grid.use_pallas:
            from functools import partial

            from ..ops.pallas_pair import pallas_pair_reduce

            object.__setattr__(
                self, "_reduce",
                partial(pallas_pair_reduce, block_rows=self.grid.pallas_block_rows),
            )
        else:
            object.__setattr__(self, "_reduce", pair_reduce)

    # ------------------------------------------------------------------ layout

    def _sort(self, pytree, positions, alive):
        return sort_by_dense_keys(pytree, positions, self.grid, alive)

    def _ctx(self, sorted_positions, sorted_keys, boundary: BoundaryDense) -> DenseCtx:
        """Build the per-rebuild context with exactly two pair passes.

        Each pass emits every position-only per-pair quantity at once: W (density,
        fluidparticleworld.rs:197-231), m*gradW vector + squared-norm sums (alpha,
        dfsph.rs:68-97), and pair counts (deficiency guard, dfsph.rs:260-264).
        """
        g = self.grid
        with jax.named_scope("NeighborhoodSearch.update_dynamic"):
            slots = build_slot_grid(sorted_keys, g)
        pos_pad = pad_to_slots(sorted_positions, slots, g)
        return self._ctx_from_slots(pos_pad, slots, boundary)

    def _ctx_from_slots(self, pos_pad, slots: SlotGrid,
                        boundary: BoundaryDense, dropped_base=None) -> DenseCtx:
        """Pair-context build from an existing slot layout and already-padded
        positions (the hot path packs positions into one wide slot gather with
        the other rebuild-crossing state; see `step`)."""
        g = self.grid
        mask = slots.slot_mask.reshape(g.ny, g.nx, g.occupancy)
        if dropped_base is None:
            # boundary drops are computed host-side on the FULL grid and arrive
            # replicated — only the per-shard fluid drops need the global sum
            dropped_base = self._sum_counts(slots.num_dropped) + boundary.num_dropped
        return self._ctx_from_padded(pos_pad, mask, boundary, dropped_base,
                                     slots=slots)

    def _ctx_from_padded(self, pos_pad, mask, boundary: BoundaryDense,
                         dropped, slots=None) -> DenseCtx:
        """Pair-context build purely from padded geometry (the padded-resident
        carry path needs no SlotGrid: `slots` stays None there and sorted-layout
        conversions are unavailable by construction)."""
        g = self.grid
        m = float(self.properties.particle_mass)  # python float: folds into fn traces

        def terms(ri_to_rj, r_sq, r):
            mgrad = self.kernel.gradient(ri_to_rj, r_sq, r) * m
            return {
                "w": self.kernel.evaluate(r_sq, r),
                "vec": mgrad,
                "sq": jnp.sum(mgrad * mgrad, axis=-1),
                "count": jnp.ones_like(r_sq),
            }

        sm = None
        with jax.named_scope("FluidParticleWorld.update_densities+alpha"):
            if g.use_pallas_slotmajor:
                br = g.pallas_sm_row_block
                sm = build_geom(pos_pad, mask, br)

                def ctx_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
                    w = self.kernel.evaluate(r_sq, r)
                    mgc = self.kernel.gradient_coefficient(r_sq, r) * m
                    gx = mgc * dx
                    gy = mgc * dy
                    return (w, gx, gy, gx * gx + gy * gy, jnp.ones_like(r_sq))

                w_, gx_, gy_, sq_, cnt_ = sm_pair_reduce(
                    ctx_terms, 5, sm, sm, pass_flags(sm, sm), g, br
                )
                dyn = {
                    "w": w_,
                    "vec": jnp.stack([gx_, gy_], axis=-1),
                    "sq": sq_,
                    "count": cnt_,
                }
            else:
                dyn = self._reduce(terms, pos_pad, mask, pos_pad, mask, g)
            gb = g
            if g.boundary_col_block is not None:
                gb = dataclasses.replace(g, col_block=g.boundary_col_block)
            stat = self._reduce(terms, pos_pad, mask, boundary.pos_pad, boundary.mask, gb)

        zero = jnp.zeros((), dtype=REAL)
        dens_pad = m * (self.kernel.evaluate(zero, zero) + dyn["w"] + stat["w"])
        dens_pad = jnp.maximum(dens_pad, jnp.asarray(self.properties.fluid_density, REAL))
        # overflow-dropped particles read back as rho0 / zero-alpha (graceful)

        vec = dyn["vec"] + stat["vec"]
        denom = jnp.sum(vec * vec, axis=-1) + dyn["sq"] + stat["sq"]
        alpha_pad = 1.0 / jnp.maximum(denom, jnp.asarray(ALPHA_EPSILON, REAL))

        grad_dyn = None
        sum_grad_dyn = None
        if self.mxu_loop_gradients:
            grad_dyn = pair_map(
                lambda ri, r_sq, r: self.kernel.gradient(ri, r_sq, r).astype(
                    jnp.bfloat16
                ),
                pos_pad, mask, pos_pad, mask, g,
            )
            # f32 row sums for the v_i / k_i terms (exact: reuse the ctx pass's
            # dyn vector sum, which is m * sum grad)
            sum_grad_dyn = dyn["vec"] / m
        elif self.cache_loop_gradients:
            grad_dyn = pair_map(
                lambda ri, r_sq, r: self.kernel.gradient(ri, r_sq, r),
                pos_pad, mask, pos_pad, mask, g,
            )

        return DenseCtx(
            slots=slots,
            pos_pad=pos_pad,
            mask=mask,
            sum_grad_stat=stat["vec"] / m,
            neighbor_total=dyn["count"] + stat["count"],
            densities_pad=dens_pad,
            alpha_pad=alpha_pad,
            grad_dyn=grad_dyn,
            sum_grad_dyn=sum_grad_dyn,
            num_dropped=dropped,
            sm=sm,
        )

    # --------------------------------------------------------------- pair ops

    def _density(self, ctx: DenseCtx, boundary: BoundaryDense) -> jax.Array:
        """Clamped density per particle, sorted layout (computed in _ctx)."""
        rho0 = jnp.asarray(self.properties.fluid_density, REAL)
        return slots_to_sorted(ctx.densities_pad, ctx.slots, self.grid, fallback=rho0)

    def _alpha(self, ctx: DenseCtx, boundary: BoundaryDense) -> jax.Array:
        """DFSPH alpha per particle, sorted layout (computed in _ctx)."""
        return slots_to_sorted(ctx.alpha_pad, ctx.slots, self.grid)

    def _velocity_divergence(self, ctx: DenseCtx, v_pad):
        """sum_dyn (vi - vj).grad + vi.sum_grad_stat (dfsph.rs:99-126, 249-280)."""
        g = self.grid

        if self.mxu_loop_gradients:
            # sum_j (v_i - v_j).grad = v_i . sum_j grad  -  sum_j v_j . grad;
            # the second term is a batched (P x 18P) @ (18P x 1) contraction
            # over the cached bf16 G with f32 accumulation (MXU)
            from ..ops.dense_grid import neighbor_windows

            vwin = neighbor_windows(v_pad).astype(jnp.bfloat16)
            term2 = jax.lax.dot_general(
                ctx.grad_dyn, vwin,
                dimension_numbers=(((3, 4), (2, 3)), ((0, 1), (0, 1))),
                preferred_element_type=REAL,
            )  # (ny, nx, P)
            dyn = (
                jnp.sum(v_pad * ctx.sum_grad_dyn, axis=-1) - term2
            )
            return dyn + jnp.sum(v_pad * ctx.sum_grad_stat, axis=-1)

        if ctx.sm is not None:
            def div_sm(dx, dy, r_sq, r, scalars, q_planes, s_planes):
                gc = self.kernel.gradient_coefficient(r_sq, r)
                return (
                    ((q_planes[0] - s_planes[0]) * dx
                     + (q_planes[1] - s_planes[1]) * dy) * gc,
                )

            (dyn,) = sm_pair_reduce(
                div_sm, 1, ctx.sm, ctx.sm, pass_flags(ctx.sm, ctx.sm), g,
                g.pallas_sm_row_block, q_vals=(v_pad,), s_vals=(v_pad,),
            )
        elif ctx.grad_dyn is not None:
            def div_cached(grads, v_i, v_j):
                return jnp.sum((v_i - v_j) * grads, axis=-1)

            dyn = cached_pair_reduce(
                div_cached, ctx.grad_dyn, source_values=(v_pad,),
                query_values=(v_pad,),
            )
        else:
            def div(ri_to_rj, r_sq, r, v_i, v_j):
                grad = self.kernel.gradient(ri_to_rj, r_sq, r)
                return jnp.sum((v_i - v_j) * grad, axis=-1)

            dyn = self._reduce(
                div, ctx.pos_pad, ctx.mask, ctx.pos_pad, ctx.mask, g,
                source_values=(v_pad,), query_values=(v_pad,),
            )
        return dyn + jnp.sum(v_pad * ctx.sum_grad_stat, axis=-1)

    def _k_correction(self, ctx: DenseCtx, k_pad):
        """sum_dyn (ki + kj) grad + ki * sum_grad_stat (dfsph.rs:128-161)."""
        g = self.grid

        if self.mxu_loop_gradients:
            # sum_j (k_i + k_j) grad = k_i sum_j grad + sum_j k_j grad; second
            # term: batched (P x 9P) @ (9P x 2)-shaped contraction on the MXU
            from ..ops.dense_grid import neighbor_windows

            kwin = neighbor_windows(k_pad).astype(jnp.bfloat16)
            term2 = jax.lax.dot_general(
                ctx.grad_dyn, kwin,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=REAL,
            )  # (ny, nx, P, 2), f32 accumulation
            return (
                k_pad[..., None] * (ctx.sum_grad_dyn + ctx.sum_grad_stat) + term2
            )

        if ctx.sm is not None:
            def corr_sm(dx, dy, r_sq, r, scalars, q_planes, s_planes):
                kk = (q_planes[0] + s_planes[0]) * self.kernel.gradient_coefficient(
                    r_sq, r
                )
                return (kk * dx, kk * dy)

            cx, cy = sm_pair_reduce(
                corr_sm, 2, ctx.sm, ctx.sm, pass_flags(ctx.sm, ctx.sm), g,
                g.pallas_sm_row_block, q_vals=(k_pad,), s_vals=(k_pad,),
            )
            dyn = jnp.stack([cx, cy], axis=-1)
        elif ctx.grad_dyn is not None:
            def corr_cached(grads, k_i, k_j):
                return (k_i + k_j)[..., None] * grads

            dyn = cached_pair_reduce(
                corr_cached, ctx.grad_dyn, source_values=(k_pad,),
                query_values=(k_pad,),
            )
        else:
            def corr(ri_to_rj, r_sq, r, k_i, k_j):
                grad = self.kernel.gradient(ri_to_rj, r_sq, r)
                return (k_i + k_j)[..., None] * grad

            dyn = self._reduce(
                corr, ctx.pos_pad, ctx.mask, ctx.pos_pad, ctx.mask, g,
                source_values=(k_pad,), query_values=(k_pad,),
            )
        return dyn + k_pad[..., None] * ctx.sum_grad_stat

    def _viscosity_pass(self, ctx: DenseCtx, v_pad, rho_pad, dt):
        """Viscous acceleration over dynamic neighbors (fluidparticleworld.rs /
        the viscosity models' accumulate loops); (ny, nx, P, 2)."""
        g = self.grid
        m = self.properties.particle_mass

        if ctx.sm is not None:
            def visc_sm(dx, dy, r_sq, r, scalars, q_planes, s_planes):
                c = self.viscosity_model.viscous_coefficient(
                    scalars[0], r_sq, r, m, s_planes[2]
                )
                return (
                    c * (s_planes[0] - q_planes[0]),
                    c * (s_planes[1] - q_planes[1]),
                )

            ax, ay = sm_pair_reduce(
                visc_sm, 2, ctx.sm, ctx.sm, pass_flags(ctx.sm, ctx.sm), g,
                g.pallas_sm_row_block, q_vals=(v_pad,),
                s_vals=(v_pad, rho_pad), scalars=(dt,),
            )
            return jnp.stack([ax, ay], axis=-1)

        def visc(ri_to_rj, r_sq, r, dt_s, v_i, v_j, rho_j):
            return self.viscosity_model.compute_viscous_acceleration(
                dt_s, r_sq, r, m, rho_j, v_j - v_i
            )

        return self._reduce(
            visc, ctx.pos_pad, ctx.mask, ctx.pos_pad, ctx.mask, g,
            source_values=(v_pad, rho_pad), query_values=(v_pad,),
            scalar_args=(dt,),
        )

    # --- single-device reduction hooks; the shard_map solver overrides these with
    # --- collective versions (lax.psum / lax.pmax over the spatial mesh axis)

    def _mean_live(self, value_pad, ctx: DenseCtx, n_particles):
        total = jnp.sum(jnp.where(ctx.mask, value_pad, 0.0))
        return total / jnp.asarray(n_particles, REAL)

    def _count_live(self, alive):
        """Live-particle count used as the residual-average denominator."""
        return jnp.sum(alive).astype(REAL)

    def _max_velocity(self, vstar_pad, mask):
        """CFL velocity estimate over live slots (reference: dfsph.rs:474-477).

        Operates in PADDED layout: overflow-dropped particles (rank >= P, zero in
        healthy runs) are excluded from the estimate — they receive a gravity-only
        prediction and no pair forces, so their speed cannot exceed the live max
        by more than one step's gravity kick."""
        v_est_sq = jnp.where(mask, jnp.sum(vstar_pad * vstar_pad, axis=-1), 0.0)
        return jnp.sqrt(jnp.max(v_est_sq))

    def _sum_counts(self, count):
        """Global sum of a per-shard diagnostic counter (identity single-device)."""
        return count

    def _migrate(self, tree, positions, alive):
        """Move particles that advected off this shard's row slice to the neighbor
        shard (shard_map solver). Single-device: nothing to do.

        Returns (tree, migration_drops)."""
        return tree, jnp.zeros((), dtype=jnp.int32)

    # ------------------------------------------------------------ density loop

    def _correct_density_error(self, dt, dens_pad, alpha_pad, v_pad, kappa_pad,
                               prev_iterations, ctx: DenseCtx, n_particles):
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        m = jnp.asarray(self.properties.particle_mass, dtype=REAL)
        inv_dt = 1.0 / dt
        tol = jnp.asarray(self.max_avg_density_error, dtype=REAL)

        def warmstart(v):
            k = 0.5 * jnp.maximum(kappa_pad, -0.5 * rho0 * rho0)
            return v - inv_dt * m * self._k_correction(ctx, k)

        v_pad = jax.lax.cond(prev_iterations > 1, warmstart, lambda v: v, v_pad)
        kappa_pad = jnp.zeros_like(kappa_pad)

        def body(state):
            v, k_sum, num, _avg = state
            delta = self._velocity_divergence(ctx, v)
            err = jnp.maximum(dens_pad + delta * m * dt, rho0) - rho0
            ki = err * alpha_pad
            k_sum = k_sum + ki
            v = v - inv_dt * m * self._k_correction(ctx, ki)
            avg = self._mean_live(err, ctx, n_particles)
            return v, k_sum, num + 1, avg

        def cond(state):
            _v, _k, num, avg = state
            return (num == 0) | (
                ((avg / rho0) * dt >= tol) & (num <= self.max_density_iterations)
            )

        return jax.lax.while_loop(
            cond, body, (v_pad, kappa_pad, jnp.int32(0), jnp.asarray(jnp.inf, REAL))
        )

    # --------------------------------------------------------- divergence loop

    def _correct_divergence_error(self, dt, alpha_pad, v_pad, stiff_pad,
                                  prev_iterations, ctx: DenseCtx, n_particles):
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        m = jnp.asarray(self.properties.particle_mass, dtype=REAL)
        tol = jnp.asarray(self.max_divergence_error, dtype=REAL)

        def warmstart(v):
            s = 0.5 * jnp.maximum(stiff_pad, -0.5 * rho0 * rho0)
            return v - m * self._k_correction(ctx, s)

        v_pad = jax.lax.cond(prev_iterations > 1, warmstart, lambda v: v, v_pad)
        stiff_pad = jnp.zeros_like(stiff_pad)

        def body(state):
            v, s_sum, num, _avg = state
            delta = self._velocity_divergence(ctx, v) * m
            delta = jnp.maximum(delta, 0.0)
            # particle-deficiency guard (<9 total neighbors, dfsph.rs:260-264)
            delta = jnp.where(ctx.neighbor_total < 9, 0.0, delta)
            ki = delta * alpha_pad
            s_sum = s_sum + ki
            v = v - m * self._k_correction(ctx, ki)
            avg = self._mean_live(delta, ctx, n_particles) / rho0
            return v, s_sum, num + 1, avg

        def cond(state):
            _v, _s, num, avg = state
            return (num == 0) | (
                (avg * dt >= tol) & (num <= self.max_divergence_iterations)
            )

        return jax.lax.while_loop(
            cond, body, (v_pad, stiff_pad, jnp.int32(0), jnp.asarray(jnp.inf, REAL))
        )

    # -------------------------------------------------------------------- init

    def init_carry(self, state: ParticleState, boundary: BoundaryDense) -> DFSPHDenseCarry:
        (state,), sorted_keys = self._sort((state,), state.positions, state.alive)
        ctx = self._ctx(state.positions, sorted_keys, boundary)
        densities = self._density(ctx, boundary)
        alpha = self._alpha(ctx, boundary)
        n = state.positions.shape[0]
        g = self.grid
        # two DISTINCT zero buffers: aliased leaves break donate_argnums
        # ("attempt to donate the same buffer twice") on eager init_carry
        return DFSPHDenseCarry(
            particles=state._replace(densities=densities),
            alpha=alpha,
            warmstart_stiffness=jnp.zeros((n,), dtype=REAL),
            v_pad=pad_to_slots(state.velocities, ctx.slots, g),
            kappa_pad=jnp.zeros((g.ny, g.nx, g.occupancy), dtype=REAL),
            stiff_pad=jnp.zeros((g.ny, g.nx, g.occupancy), dtype=REAL),
            ctx=ctx,
            prev_density_iterations=jnp.int32(1),
            prev_divergence_iterations=jnp.int32(0),
            time=TimeState.initial(self.step_config),
        )

    # -------------------------------------------------------------------- step

    def step(self, carry: DFSPHDenseCarry, boundary: BoundaryDense,
             rebuild: bool = True):
        """One simulation step; ordering identical to models/dfsph.py `step`
        (reference: dfsph.rs:414-525). `rebuild` is STATIC: False skips the
        re-sort / slot rebuild / migration (rebuild_every > 1 stale steps)."""
        g = self.grid
        particles = carry.particles
        positions, velocities, densities, alive = particles
        ctx = carry.ctx
        time_state = carry.time
        dt = time_state.dt
        # residual averages divide by the LIVE count (reference averages over its
        # exact particle count, dfsph.rs:221,376-377; padding must not dilute them)
        n = self._count_live(alive)

        # --- non-pressure forces (gravity + viscosity, dynamic neighbors only)
        # velocities and the kappa warm-start arrive PADDED from the carry (they
        # were produced in this very slot layout by the previous step's loops):
        # zero slot gathers to start the step
        v_pad = carry.v_pad
        kappa_pad = carry.kappa_pad
        rho_pad = ctx.densities_pad  # carried from last rebuild (== particles.densities)

        with jax.named_scope("DFSPH.non_pressure_forces"):
            visc_pad = self._viscosity_pass(ctx, v_pad, rho_pad, dt)
        # acceleration, CFL estimate, and v* prediction all stay in PADDED layout
        # (no sorted round-trip): the slot mask covers exactly the live in-grid
        # particles, so masking replaces the alive-gating of the sorted path.
        gvec = jnp.asarray(self.gravity, dtype=REAL)
        accel_pad = visc_pad + gvec

        # --- CFL with old-dt estimate (dfsph.rs:472-481); live slots only
        vstar_pad = v_pad + accel_pad * dt
        max_velocity = self._max_velocity(vstar_pad, ctx.mask)
        time_state = update_simulation_step(
            self.step_config, time_state,
            self.properties.particle_radius * 2.0, max_velocity,
        )
        dt = time_state.dt

        # --- predict v* with the NEW dt, then constant-density loop in padded layout
        pred_pad = v_pad + accel_pad * dt
        dens_pad = rho_pad
        alpha_pad = ctx.alpha_pad
        with jax.named_scope("DFSPH.correct_density_error"):
            pred_pad, kappa_pad, density_iters, avg_density_error = (
                self._correct_density_error(
                    dt, dens_pad, alpha_pad, pred_pad, kappa_pad,
                    carry.prev_density_iterations, ctx, n,
                )
            )
        # one packed unpad for (v*, kappa). Overflow-dropped particles have no
        # slot: they fall back to a gravity-only prediction (their viscosity
        # contribution is zero — they are in nobody's window), zero kappa; dead
        # (padding) particles stay frozen (zero velocity, no gravity) — otherwise
        # their free-fall would inflate the CFL v_max and decay dt.
        fallback_pred = jnp.where(alive[:, None], velocities + gvec * dt, velocities)
        pk = jnp.concatenate([pred_pad, kappa_pad[..., None]], axis=-1)
        fb = jnp.concatenate(
            [fallback_pred, jnp.zeros_like(fallback_pred[:, :1])], axis=1
        )
        pk_sorted = slots_to_sorted(pk, ctx.slots, g, fallback=fb)
        predicted = pk_sorted[..., :2]
        kappa = pk_sorted[..., 2]

        # --- advect + migrate (shard_map only) + re-sort + rebuild ctx
        # (dfsph.rs:499-512); stale steps (rebuild=False) keep the sort order and
        # slot assignment and only refresh the position-dependent pair context
        positions = positions + predicted * dt
        if rebuild:
            # every array that crosses the rebuild travels in ONE f32 matrix:
            # slot-pad gather cost scales with OUTPUT ROWS, not columns (PERF.md),
            # so [pos(2) | v*(2) | kappa | stiffness | alive] pays a single
            # gather; alive rides as an f32 0/1 column so the re-sort permutes
            # ONE matrix (a separate bool leaf cost its own 10 ms gather at 1M)
            packed = jnp.concatenate(
                [positions, predicted, kappa[:, None],
                 carry.warmstart_stiffness[:, None],
                 alive.astype(REAL)[:, None]], axis=1,
            )
            tree = (packed, alive)
            tree, migration_drops = self._migrate(tree, positions, alive)
            packed_m, alive_m = tree
            # migration may deaden sent-away rows: refresh the alive column
            packed_m = jnp.concatenate(
                [packed_m[:, :6], alive_m.astype(REAL)[:, None]], axis=1
            )
            (packed,), sorted_keys = self._sort(
                (packed_m,), packed_m[:, :2], alive_m
            )
            alive = packed[:, 6] > 0.5
            positions = packed[:, :2]
            predicted = packed[:, 2:4]
            with jax.named_scope("NeighborhoodSearch.update_dynamic"):
                slots = build_slot_grid(sorted_keys, g)
            # banded gather skips empty cell-row bands (most of the domain is air)
            pad6 = pad_to_slots(packed[:, :6], slots, g, row_block=g.row_block)
            pos_pad = pad6[..., :2]
            pred_pad = pad6[..., 2:4]
            kappa_pad = pad6[..., 4]  # next step's density warm-start, new slots
            stiff_pad = pad6[..., 5]
            ctx = self._ctx_from_slots(pos_pad, slots, boundary)
        else:
            migration_drops = jnp.zeros((), dtype=jnp.int32)
            # slots unchanged: advect the padded positions in place; the density
            # loop's padded v* and the carried padded warm-starts remain valid
            pos_pad = ctx.pos_pad + pred_pad * dt
            stiff_pad = carry.stiff_pad
            ctx = self._ctx_from_slots(
                pos_pad, ctx.slots, boundary, dropped_base=ctx.num_dropped
            )

        # --- divergence-free loop in padded layout (dfsph.rs:521); the
        # densities/alpha unpad (dfsph.rs:516-518) shares the post-loop gather
        alpha_pad = ctx.alpha_pad
        with jax.named_scope("DFSPH.correct_divergence_error"):
            pred_pad, stiff_pad, divergence_iters, avg_divergence = (
                self._correct_divergence_error(
                    dt, alpha_pad, pred_pad, stiff_pad,
                    carry.prev_divergence_iterations, ctx, n,
                )
            )
        # ONE packed unpad for everything leaving slot layout this step:
        # [v*(2) | stiffness | density | alpha] (all in the post-rebuild slots)
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        out_pad = jnp.concatenate(
            [pred_pad, stiff_pad[..., None], ctx.densities_pad[..., None],
             ctx.alpha_pad[..., None]], axis=-1,
        )
        zeros1 = jnp.zeros_like(predicted[:, :1])
        fb_out = jnp.concatenate(
            [predicted, zeros1, jnp.full_like(zeros1, rho0), zeros1], axis=1
        )
        out_sorted = slots_to_sorted(out_pad, ctx.slots, g, fallback=fb_out)
        predicted = out_sorted[..., :2]
        stiffness = out_sorted[..., 2]
        densities = out_sorted[..., 3]
        alpha = out_sorted[..., 4]

        new_carry = DFSPHDenseCarry(
            particles=ParticleState(positions, predicted, densities, alive),
            alpha=alpha,
            warmstart_stiffness=stiffness,
            v_pad=pred_pad,  # next step consumes it in this exact slot layout
            kappa_pad=kappa_pad,
            stiff_pad=stiff_pad,
            ctx=ctx,
            prev_density_iterations=density_iters,
            prev_divergence_iterations=divergence_iters,
            time=time_state,
        )
        diagnostics = Diagnostics(
            dt=dt,
            max_velocity=max_velocity,
            # BOTH grids this step consumed: the carried-in ctx (non-pressure
            # forces + density loop) and the post-advection rebuild (divergence
            # loop + next step) — otherwise drops in the initial/carried build
            # would be invisible to every step's report
            neighbor_drops=jnp.maximum(carry.ctx.num_dropped, ctx.num_dropped),
            density_iterations=density_iters,
            divergence_iterations=divergence_iters,
            avg_density_error=avg_density_error,
            avg_divergence=avg_divergence,
            migration_drops=migration_drops,
        )
        return new_carry, diagnostics

    def simulate(self, carry: DFSPHDenseCarry, boundary: BoundaryDense, num_steps: int):
        """Run `num_steps` steps on device. The returned Diagnostics AGGREGATES
        across all steps (Diagnostics.accumulate): a one-step cell overflow or
        residual spike anywhere in the run is visible in the result.

        With rebuild_every == k > 1, steps run in blocks of one rebuild step
        followed by k-1 stale steps (python-unrolled inside the jit); any
        remainder steps rebuild unconditionally."""

        def one(c, agg, rebuild):
            c = c._replace(time=c.time.account_step())
            c, diag = self.step(c, boundary, rebuild=rebuild)
            return c, agg.accumulate(diag)

        k = max(int(self.rebuild_every), 1)

        def body(_, loop_carry):
            c, agg = loop_carry
            for j in range(k):
                c, agg = one(c, agg, rebuild=(j == 0))
            return c, agg

        n_blocks, rem = divmod(num_steps, k)
        out = jax.lax.fori_loop(0, n_blocks, body, (carry, Diagnostics.zeros()))
        for _ in range(rem):
            out = one(out[0], out[1], rebuild=True)
        return out


class DFSPHPaddedCarry(NamedTuple):
    """Padded-RESIDENT solver state: nothing ever leaves the (ny, nx, P) slot
    layout between steps. The round-2 device trace showed the sorted<->padded
    plumbing (banded rebuild gather ~50 ms, packed unpads ~39 ms, cell-key sort
    ~23 ms of a 231 ms step at 1M) costing ~2x the pair arithmetic itself; this
    carry removes ALL of it — the per-step neighborhood rebuild becomes one
    windowed re-bucket (ops/dense_grid.rebucket) in slot space."""

    ctx: DenseCtx  # slots=None: padded geometry only
    v_pad: jax.Array  # (ny, nx, P, 2)
    kappa_pad: jax.Array  # (ny, nx, P) density-loop warm start
    stiff_pad: jax.Array  # (ny, nx, P) divergence-loop warm start
    prev_density_iterations: jax.Array  # () int32
    prev_divergence_iterations: jax.Array  # () int32
    time: TimeState


@dataclass(frozen=True)
class DFSPHPaddedSolver(DFSPHDenseSolver):
    """DFSPH with the padded-resident carry: the TPU fast path.

    Same pair passes, pressure loops, and reference semantics as
    DFSPHDenseSolver (which this extends); only the layout lifecycle differs:

    - state (positions, velocities, warm starts) lives permanently in the
      dense (ny, nx, P) slot layout; there is no sorted particle array, no
      per-step lax.sort, and no pad/unpad gathers;
    - the post-advection neighborhood rebuild (dfsph.rs:512) is a windowed
      re-bucket: each particle moves to the cell containing its new position,
      which the CFL bound keeps inside the old cell's 3x3 neighborhood
      (ops/dense_grid.rebucket);
    - cell-occupancy overflow at re-bucket REMOVES the overflowing particles
      (counted in Diagnostics.neighbor_drops) instead of parking them outside
      the grid as the sorted path does — healthy runs keep this at zero, and
      world.dense_grid() sizes occupancy so the bench scenes never drop;
    - particle identity is not stable across steps (as in the reference, whose
      Morton re-sort has the same contract: neighborhood_search.rs:90-166).

    Host/app boundaries use `export_state` (flat slot-order ParticleState with
    the slot mask as `alive`).
    """

    def _rebucket_row0(self):
        """Global cell-row offset of this shard (None on a single device)."""
        return None

    def init_carry(self, state: ParticleState, boundary: BoundaryDense
                   ) -> DFSPHPaddedCarry:
        base = super().init_carry(state, boundary)
        ctx = base.ctx._replace(slots=None, grad_dyn=base.ctx.grad_dyn)
        return DFSPHPaddedCarry(
            ctx=ctx,
            v_pad=base.v_pad,
            kappa_pad=base.kappa_pad,
            stiff_pad=base.stiff_pad,
            prev_density_iterations=base.prev_density_iterations,
            prev_divergence_iterations=base.prev_divergence_iterations,
            time=base.time,
        )

    def export_state(self, carry: DFSPHPaddedCarry) -> ParticleState:
        """Flat slot-order view for host/app/checkpoint boundaries: N = ny*nx*P
        rows, `alive` = slot mask. Dead rows hold zeros / rho0."""
        g = self.grid
        mask = carry.ctx.mask.reshape(-1)
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        return ParticleState(
            positions=carry.ctx.pos_pad.reshape(-1, 2),
            velocities=jnp.where(
                mask[:, None], carry.v_pad.reshape(-1, 2), 0.0
            ),
            densities=jnp.where(
                mask, carry.ctx.densities_pad.reshape(-1), rho0
            ),
            alive=mask,
        )

    def step(self, carry: DFSPHPaddedCarry, boundary: BoundaryDense,
             rebuild: bool = True):
        """One simulation step, ordering identical to DFSPHDenseSolver.step
        (reference: dfsph.rs:414-525), with the sort/pad/unpad chain replaced
        by one re-bucket."""
        g = self.grid
        ctx = carry.ctx
        time_state = carry.time
        dt = time_state.dt
        n = self._count_live(ctx.mask)

        v_pad = carry.v_pad
        kappa_pad = carry.kappa_pad
        rho_pad = ctx.densities_pad

        with jax.named_scope("DFSPH.non_pressure_forces"):
            visc_pad = self._viscosity_pass(ctx, v_pad, rho_pad, dt)
        gvec = jnp.asarray(self.gravity, dtype=REAL)
        accel_pad = visc_pad + gvec

        # --- CFL with old-dt estimate (dfsph.rs:472-481)
        vstar_pad = v_pad + accel_pad * dt
        max_velocity = self._max_velocity(vstar_pad, ctx.mask)
        time_state = update_simulation_step(
            self.step_config, time_state,
            self.properties.particle_radius * 2.0, max_velocity,
        )
        dt = time_state.dt

        # --- predict v* with the NEW dt, constant-density loop (dfsph.rs:484-496)
        pred_pad = v_pad + accel_pad * dt
        with jax.named_scope("DFSPH.correct_density_error"):
            pred_pad, kappa_pad, density_iters, avg_density_error = (
                self._correct_density_error(
                    dt, rho_pad, ctx.alpha_pad, pred_pad, kappa_pad,
                    carry.prev_density_iterations, ctx, n,
                )
            )

        # --- advect + re-bucket (dfsph.rs:499-512). Dead slots are masked out of
        # the re-bucket by construction (code 0); on stale steps the layout is
        # kept and only the position-dependent pair context refreshes.
        pos_pad = ctx.pos_pad + pred_pad * dt
        if rebuild:
            with jax.named_scope("NeighborhoodSearch.update_dynamic"):
                extra = jnp.concatenate(
                    [pred_pad, kappa_pad[..., None], carry.stiff_pad[..., None]],
                    axis=-1,
                )
                if g.use_pallas_slotmajor:
                    from ..ops.pallas_slotmajor import sm_rebucket

                    pos_pad, mask, extra, drops = sm_rebucket(
                        pos_pad, ctx.mask, extra, g,
                        br=self.rebucket_row_block or g.pallas_sm_row_block,
                    )
                else:
                    pos_pad, mask, extra, drops = rebucket(
                        pos_pad, ctx.mask, extra, g,
                        row_block=self.rebucket_row_block or g.row_block,
                        row0=self._rebucket_row0(),
                    )
            pred_pad = extra[..., :2]
            kappa_pad = extra[..., 2]
            stiff_pad = extra[..., 3]
            step_drops = self._sum_counts(drops)
            ctx = self._ctx_from_padded(
                pos_pad, mask, boundary, step_drops + boundary.num_dropped
            )
        else:
            stiff_pad = carry.stiff_pad
            ctx = self._ctx_from_padded(
                pos_pad, ctx.mask, boundary, ctx.num_dropped
            )

        # --- divergence-free loop (dfsph.rs:521)
        with jax.named_scope("DFSPH.correct_divergence_error"):
            pred_pad, stiff_pad, divergence_iters, avg_divergence = (
                self._correct_divergence_error(
                    dt, ctx.alpha_pad, pred_pad, stiff_pad,
                    carry.prev_divergence_iterations, ctx, n,
                )
            )

        new_carry = DFSPHPaddedCarry(
            ctx=ctx,
            v_pad=pred_pad,
            kappa_pad=kappa_pad,
            stiff_pad=stiff_pad,
            prev_density_iterations=density_iters,
            prev_divergence_iterations=divergence_iters,
            time=time_state,
        )
        diagnostics = Diagnostics(
            dt=dt,
            max_velocity=max_velocity,
            # re-bucket losses are PERMANENT (unlike the sorted path's parked
            # overflow), so this reports the drops the step itself caused; the
            # boundary build's drops ride along so they are never invisible
            neighbor_drops=ctx.num_dropped,
            density_iterations=density_iters,
            divergence_iterations=divergence_iters,
            avg_density_error=avg_density_error,
            avg_divergence=avg_divergence,
            migration_drops=jnp.zeros((), dtype=jnp.int32),
        )
        return new_carry, diagnostics
