"""DFSPH solver: Bender & Koschier divergence-free SPH.

TPU-native counterpart of the reference solver (reference: src/sph/solver/dfsph.rs,
"Divergence-Free SPH for Incompressible and Viscous Fluids"). Both pressure loops
(constant-density and divergence-free), their SPlisHSPlasH-style warm starts, the
alpha factors, the particle-deficiency guard, and the adaptive CFL update compile into
ONE jitted step: the iterative loops are `lax.while_loop`s with on-device residual
means, so a step never syncs with the host regardless of iteration count.

Structure vs reference (dfsph.rs):
- lazy warm-up on particle-count change (:419-428)   -> host-side `init_carry`
- compute_alpha_factors (:68-97)                     -> `_alpha_from_tables`
- non-pressure forces, dynamic neighbors only (:437-469), CFL with old-dt velocity
  estimate (:472-481), predict v* with new dt (:484-492) -> same ordering
- correct_density_error (:195-247) do-while          -> lax.while_loop, body-first
- advect (:499-510), neighborhood rebuild co-sorting v* (:512) -> sort whole carry
- densities + alpha recompute (:516-518)             -> same
- correct_divergence_error (:346-402)                -> lax.while_loop
- velocity swap (:524)                               -> carry update

TPU-specific optimization (math-identical): kernel gradients of every live pair are
invariant during a pressure loop (positions are frozen), so `_PairCache` precomputes
masked grad_ij for dynamic pairs and the static gradient SUM per particle once, and
the loop bodies reduce to neighbor gathers + FMAs. Per-pair velocity/k differences are
kept per-pair (no regrouping) to avoid f32 cancellation drift vs the reference.

Deliberate divergence, documented: the reference does NOT co-sort warmstart_kappa /
warmstart_stiffness when the advection re-sort permutes particles (dfsph.rs:512 passes
only predicted velocities), so its warm starts are applied through a stale permutation.
We co-sort them with the carry — strictly more faithful to the warm-start's intent.
"""

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..units import REAL
from ..ops import pair
from ..ops.neighborhood import CellGrid, GridConfig, Neighborhood
from ..ops.smoothing_kernels import SmoothingKernel, WendlandQuinticC2
from ..timemanager import StepConfig, TimeState, update_simulation_step
from ..utils.diagnostics import Diagnostics
from ..world import (
    FluidProperties,
    ParticleState,
    GRAVITY,
    update_densities,
    update_neighborhood,
)
from .viscosity import ViscosityModel

ALPHA_EPSILON = 1e-6  # reference: dfsph.rs:71


class DFSPHCarry(NamedTuple):
    """Step-to-step state.

    The neighborhood, densities and alpha factors are those computed at the END of the
    previous step (post-advection), exactly like the reference where the step begins
    consuming last step's rebuild (dfsph.rs:437 onward). Warm-start kappa/stiffness
    carry across steps; prev_* iteration counts gate the warm starts (dfsph.rs:199,354).
    """

    particles: ParticleState
    alpha: jax.Array  # (N,)
    warmstart_kappa: jax.Array  # (N,) density-loop stiffness sums
    warmstart_stiffness: jax.Array  # (N,) divergence-loop stiffness sums
    neighborhood: Neighborhood
    prev_density_iterations: jax.Array  # () int32
    prev_divergence_iterations: jax.Array  # () int32
    time: TimeState


class _PairCache(NamedTuple):
    """Per-pair quantities invariant while positions are frozen."""

    grad_dyn: jax.Array  # (N, Kd, 2) masked kernel gradients to dynamic neighbors
    sum_grad_stat: jax.Array  # (N, 2) summed kernel gradients to static neighbors


@dataclass(frozen=True)
class DFSPHSolver:
    """Static configuration + the pure jittable step.

    Tolerances default to the reference's (dfsph.rs:49-55): average density error
    0.01/100 per second with <= 200 iterations; divergence error 0.1/100 per second
    with <= 400 iterations. Kernel defaults to WendlandQuinticC2 (hardwired in the
    reference via a type alias, dfsph.rs:11).
    """

    viscosity_model: ViscosityModel
    properties: FluidProperties
    grid: GridConfig
    step_config: StepConfig
    max_avg_density_error: float = 0.01 / 100.0
    max_density_iterations: int = 200
    max_divergence_error: float = 0.1 / 100.0
    max_divergence_iterations: int = 400
    gravity: tuple = GRAVITY

    def __post_init__(self):
        object.__setattr__(
            self, "kernel", WendlandQuinticC2(self.properties.smoothing_length)
        )

    # ----------------------------------------------------------------- helpers

    def _pair_cache(self, positions, neighborhood, boundary_positions) -> _PairCache:
        dyn, stat = neighborhood.dynamic, neighborhood.static

        pos_j = pair.gather(positions, dyn.idx)
        ri_to_rj, r_sq, r = pair.pair_geometry(positions, pos_j)
        grad_dyn = self.kernel.gradient(ri_to_rj, r_sq, r)
        grad_dyn = jnp.where(dyn.mask[..., None], grad_dyn, 0.0)

        bpos_j = pair.gather(boundary_positions, stat.idx)
        b_to_j, b_r_sq, b_r = pair.pair_geometry(positions, bpos_j)
        grad_stat = self.kernel.gradient(b_to_j, b_r_sq, b_r)
        sum_grad_stat = pair.masked_sum(grad_stat, stat.mask)

        return _PairCache(grad_dyn=grad_dyn, sum_grad_stat=sum_grad_stat)

    def _alpha_from_tables(self, positions, boundary_positions, neighborhood,
                           cache: _PairCache) -> jax.Array:
        """alpha_i = 1 / max(|sum m grad|^2 + sum |m grad|^2, eps)
        (reference: compute_alpha_factors, dfsph.rs:68-97; static gradients enter
        both the vector sum and the square sum, so this needs one per-pair static
        pass — it runs once per step, outside the pressure loops)."""
        m = jnp.asarray(self.properties.particle_mass, dtype=REAL)
        mgrad = cache.grad_dyn * m
        grad_sum = jnp.sum(mgrad, axis=1)
        grad_sq_sum = jnp.sum(jnp.sum(mgrad * mgrad, axis=-1), axis=1)

        stat = neighborhood.static
        bpos_j = pair.gather(boundary_positions, stat.idx)
        b_to_j, b_r_sq, b_r = pair.pair_geometry(positions, bpos_j)
        mgrad_s = self.kernel.gradient(b_to_j, b_r_sq, b_r) * m
        mgrad_s = jnp.where(stat.mask[..., None], mgrad_s, 0.0)
        grad_sum = grad_sum + jnp.sum(mgrad_s, axis=1)
        grad_sq_sum = grad_sq_sum + jnp.sum(jnp.sum(mgrad_s * mgrad_s, axis=-1), axis=1)

        denom = jnp.sum(grad_sum * grad_sum, axis=-1) + grad_sq_sum
        return 1.0 / jnp.maximum(denom, jnp.asarray(ALPHA_EPSILON, dtype=REAL))

    def _k_correction(self, k, neighborhood, cache: _PairCache):
        """delta_i = sum_dyn (ki + kj) grad_ij + ki * sum_stat grad_ij
        — shared shape of every velocity correction (dfsph.rs:128-161, 163-193,
        282-344). Returns (N, 2); caller scales by mass and (1/dt) as needed."""
        dyn = neighborhood.dynamic
        k_j = pair.gather(k, dyn.idx)
        coef = jnp.where(dyn.mask, k[:, None] + k_j, 0.0)
        delta = jnp.sum(coef[..., None] * cache.grad_dyn, axis=1)
        return delta + k[:, None] * cache.sum_grad_stat

    def _velocity_divergence(self, velocities, neighborhood, cache: _PairCache):
        """delta_i = sum_dyn (vi - vj) . grad_ij + vi . sum_stat grad_ij
        (boundary neighbors have velocity zero) — shared by density error
        (dfsph.rs:99-126) and density change (dfsph.rs:249-280). Returns (N,)."""
        dyn = neighborhood.dynamic
        v_j = pair.gather(velocities, dyn.idx)
        dv = velocities[:, None, :] - v_j
        per_pair = jnp.sum(dv * cache.grad_dyn, axis=-1)  # grads masked already
        delta = jnp.sum(jnp.where(dyn.mask, per_pair, 0.0), axis=1)
        return delta + jnp.sum(velocities * cache.sum_grad_stat, axis=-1)

    # ------------------------------------------------------------ density loop

    def _correct_density_error(self, dt, densities, alpha, velocities, kappa,
                               prev_iterations, neighborhood, cache: _PairCache,
                               n_live=None):
        """Constant-density pressure loop with warm start
        (reference: correct_density_error, dfsph.rs:163-247)."""
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        m = jnp.asarray(self.properties.particle_mass, dtype=REAL)
        inv_dt = 1.0 / dt
        tol = jnp.asarray(self.max_avg_density_error, dtype=REAL)
        # residual average over LIVE particles (the reference's exact count,
        # dfsph.rs:221; padding particles contribute zero error but must not
        # dilute the denominator)
        inv_n = 1.0 / (
            n_live if n_live is not None
            else jnp.asarray(velocities.shape[0], dtype=REAL)
        )

        # Warm start (gated on last step needing >1 iteration, dfsph.rs:197-206);
        # kappa pre-clamp 0.5*max(k, -0.5*rho0^2) from SPlisHSPlasH.
        def warmstart(v):
            k = 0.5 * jnp.maximum(kappa, -0.5 * rho0 * rho0)
            return v - inv_dt * m * self._k_correction(k, neighborhood, cache)

        velocities = jax.lax.cond(
            prev_iterations > 1, warmstart, lambda v: v, velocities
        )
        kappa = jnp.zeros_like(kappa)

        def body(state):
            v, k_sum, num, _avg = state
            # rho* = rho + dt * m * div; err = max(rho*, rho0) - rho0 (dfsph.rs:99-126)
            delta = self._velocity_divergence(v, neighborhood, cache)
            err = jnp.maximum(densities + delta * m * dt, rho0) - rho0
            # ki = err * alpha; v -= (1/dt) * m * sum (ki+kj) grad (dfsph.rs:128-161)
            ki = err * alpha
            k_sum = k_sum + ki
            v = v - inv_dt * m * self._k_correction(ki, neighborhood, cache)
            avg = jnp.sum(err) * inv_n
            return v, k_sum, num + 1, avg

        def cond(state):
            _v, _k, num, avg = state
            rel = avg / rho0
            return (num == 0) | (
                (rel * dt >= tol) & (num <= self.max_density_iterations)
            )

        velocities, kappa, num, avg = jax.lax.while_loop(
            cond, body, (velocities, kappa, jnp.int32(0), jnp.asarray(jnp.inf, REAL))
        )
        return velocities, kappa, num, avg

    # --------------------------------------------------------- divergence loop

    def _correct_divergence_error(self, dt, alpha, velocities, stiffness,
                                  prev_iterations, neighborhood, cache: _PairCache,
                                  n_live=None):
        """Divergence-free loop with warm start
        (reference: correct_divergence_error, dfsph.rs:282-402)."""
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        m = jnp.asarray(self.properties.particle_mass, dtype=REAL)
        tol = jnp.asarray(self.max_divergence_error, dtype=REAL)
        inv_n = 1.0 / (
            n_live if n_live is not None
            else jnp.asarray(velocities.shape[0], dtype=REAL)
        )
        total_neighbors = neighborhood.dynamic.count + neighborhood.static.count

        def warmstart(v):
            s = 0.5 * jnp.maximum(stiffness, -0.5 * rho0 * rho0)
            return v - m * self._k_correction(s, neighborhood, cache)

        velocities = jax.lax.cond(
            prev_iterations > 1, warmstart, lambda v: v, velocities
        )
        stiffness = jnp.zeros_like(stiffness)

        def body(state):
            v, s_sum, num, _avg = state
            # density change, with particle-deficiency guard (<9 total neighbors -> 0,
            # dfsph.rs:260-264) and density-loss clamp (dfsph.rs:278)
            delta = self._velocity_divergence(v, neighborhood, cache) * m
            delta = jnp.maximum(delta, 0.0)
            delta = jnp.where(total_neighbors < 9, 0.0, delta)
            ki = delta * alpha
            s_sum = s_sum + ki
            v = v - m * self._k_correction(ki, neighborhood, cache)
            avg = jnp.sum(delta) * inv_n / rho0
            return v, s_sum, num + 1, avg

        def cond(state):
            _v, _s, num, avg = state
            return (num == 0) | (
                (avg * dt >= tol) & (num <= self.max_divergence_iterations)
            )

        velocities, stiffness, num, avg = jax.lax.while_loop(
            cond, body, (velocities, stiffness, jnp.int32(0), jnp.asarray(jnp.inf, REAL))
        )
        return velocities, stiffness, num, avg

    # -------------------------------------------------------------------- init

    def init_carry(self, state: ParticleState, boundary: CellGrid) -> DFSPHCarry:
        """Warm-up: neighborhood + densities + alpha for the initial particle set
        (reference: lazy warm-up on particle-count change, dfsph.rs:419-428, plus
        clear_cached_data, dfsph.rs:406-412)."""
        state, positions, neighborhood = update_neighborhood(
            state, state.positions, boundary, self.grid
        )
        state = state._replace(positions=positions)
        densities = update_densities(
            positions, neighborhood, boundary.positions, self.kernel,
            self.properties.particle_mass, self.properties.fluid_density,
        )
        cache = self._pair_cache(positions, neighborhood, boundary.positions)
        alpha = self._alpha_from_tables(
            positions, boundary.positions, neighborhood, cache
        )
        n = positions.shape[0]
        return DFSPHCarry(
            particles=state._replace(densities=densities),
            alpha=alpha,
            warmstart_kappa=jnp.zeros((n,), dtype=REAL),
            warmstart_stiffness=jnp.zeros((n,), dtype=REAL),
            neighborhood=neighborhood,
            prev_density_iterations=jnp.int32(1),  # dfsph.rs:52
            prev_divergence_iterations=jnp.int32(0),  # dfsph.rs:56
            time=TimeState.initial(self.step_config),
        )

    # -------------------------------------------------------------------- step

    def step(self, carry: DFSPHCarry, boundary: CellGrid):
        """One simulation step (reference: dfsph.rs:414-525). `carry.time` must
        already be advanced (`account_step`). Returns (carry, Diagnostics)."""
        particles = carry.particles
        positions, velocities, densities, alive = particles
        neighborhood = carry.neighborhood
        time_state = carry.time
        dt = time_state.dt
        n_live = jnp.sum(alive).astype(REAL)
        m = self.properties.particle_mass

        cache = self._pair_cache(positions, neighborhood, boundary.positions)

        # --- non-pressure forces: gravity + viscosity over DYNAMIC neighbors only
        # (dfsph.rs:437-469)
        dyn = neighborhood.dynamic
        pos_j = pair.gather(positions, dyn.idx)
        vel_j = pair.gather(velocities, dyn.idx)
        rho_j = pair.gather(densities, dyn.idx)
        _, r_sq, r = pair.pair_geometry(positions, pos_j)
        visc = self.viscosity_model.compute_viscous_acceleration(
            dt, r_sq, r, m, rho_j, vel_j - velocities[:, None, :]
        )
        accel = pair.masked_sum(visc, dyn.mask) + jnp.asarray(
            self.gravity, dtype=REAL
        )[None, :]
        # dead (padding) particles are frozen: no gravity, no advection
        accel = jnp.where(alive[:, None], accel, 0.0)

        # --- CFL with the old-dt velocity estimate (dfsph.rs:472-481); live only
        v_estimate = velocities + accel * dt
        v_est_sq = jnp.where(alive, jnp.sum(v_estimate * v_estimate, axis=-1), 0.0)
        max_velocity = jnp.sqrt(jnp.max(v_est_sq))
        time_state = update_simulation_step(
            self.step_config, time_state,
            self.properties.particle_radius * 2.0, max_velocity,
        )
        dt = time_state.dt

        # --- predict velocities with the NEW dt (dfsph.rs:484-492)
        predicted = velocities + accel * dt

        # --- constant-density loop (dfsph.rs:496)
        predicted, kappa, density_iters, avg_density_error = (
            self._correct_density_error(
                dt, densities, carry.alpha, predicted, carry.warmstart_kappa,
                carry.prev_density_iterations, neighborhood, cache, n_live,
            )
        )

        # --- advect (dfsph.rs:499-510)
        positions = positions + predicted * dt

        # --- neighborhood rebuild; co-sort everything that persists (dfsph.rs:512)
        (
            (positions, predicted, kappa, stiffness, alive),
            positions_sorted,
            neighborhood,
        ) = update_neighborhood(
            (positions, predicted, kappa, carry.warmstart_stiffness, alive),
            positions, boundary, self.grid,
        )
        positions = positions_sorted

        # --- densities + alpha (dfsph.rs:516-518)
        densities = update_densities(
            positions, neighborhood, boundary.positions, self.kernel,
            m, self.properties.fluid_density,
        )
        cache = self._pair_cache(positions, neighborhood, boundary.positions)
        alpha = self._alpha_from_tables(
            positions, boundary.positions, neighborhood, cache
        )

        # --- divergence-free loop (dfsph.rs:521)
        predicted, stiffness, divergence_iters, avg_divergence = (
            self._correct_divergence_error(
                dt, alpha, predicted, stiffness,
                carry.prev_divergence_iterations, neighborhood, cache, n_live,
            )
        )

        # --- velocities <- v* (dfsph.rs:524)
        new_carry = DFSPHCarry(
            particles=ParticleState(positions, predicted, densities, alive),
            alpha=alpha,
            warmstart_kappa=kappa,
            warmstart_stiffness=stiffness,
            neighborhood=neighborhood,
            prev_density_iterations=density_iters,
            prev_divergence_iterations=divergence_iters,
            time=time_state,
        )
        diagnostics = Diagnostics(
            dt=dt,
            max_velocity=max_velocity,
            # both neighbor tables this step consumed: the carried-in one and the
            # post-advection rebuild (see dfsph_dense.step)
            neighbor_drops=jnp.maximum(
                carry.neighborhood.dynamic.num_dropped
                + carry.neighborhood.static.num_dropped,
                neighborhood.dynamic.num_dropped
                + neighborhood.static.num_dropped,
            ),
            density_iterations=density_iters,
            divergence_iterations=divergence_iters,
            avg_density_error=avg_density_error,
            avg_divergence=avg_divergence,
            migration_drops=jnp.zeros((), dtype=jnp.int32),
        )
        return new_carry, diagnostics

    def simulate(self, carry: DFSPHCarry, boundary: CellGrid, num_steps: int):
        """Run `num_steps` steps fully on device (lax.fori_loop), advancing the clock
        before each step like the frame loop does. The returned Diagnostics
        AGGREGATES across all steps (Diagnostics.accumulate)."""

        def body(_, loop_carry):
            c, agg = loop_carry
            c = c._replace(time=c.time.account_step())
            c, diag = self.step(c, boundary)
            return c, agg.accumulate(diag)

        return jax.lax.fori_loop(0, num_steps, body, (carry, Diagnostics.zeros()))
