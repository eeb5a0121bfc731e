"""WCSPH solver: Becker & Teschner 2007 weakly compressible SPH.

TPU-native counterpart of the reference solver (reference: src/sph/solver/wscsph.rs).
Tait EOS with gamma=7, leapfrog integration, symmetric pressure forces with the Spiky
kernel, Poly6 density kernel, pluggable viscosity model, Monaghan-Kajtar radial
boundary penalty force. The whole step — leapfrog, neighborhood re-sort + rebuild,
density summation, force accumulation, CFL dt update — is one jitted pure function
`carry -> carry`; there is no host round trip per step.

Structure vs reference:
- wscsph.rs:141-151 leapfrog part 1 (serial loop)        -> fused vector ops pre-sort
- wscsph.rs:153-154 neighborhood + densities              -> world.update_neighborhood
- wscsph.rs:59-118 update_accellerations (rayon gather)   -> masked (N, K) pair tiles
- wscsph.rs:158-167 CFL update with the *old* dt estimate -> same ordering, on device
- wscsph.rs:169-178 leapfrog part 2 with the *new* dt     -> same (quirk kept: the
  second half-kick deliberately uses the freshly updated dt)
"""

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..units import REAL
from ..ops import pair
from ..ops.neighborhood import CellGrid, GridConfig
from ..ops.smoothing_kernels import Poly6, Spiky
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

# gamma hardcoded to 7 as proposed in the paper (reference: wscsph.rs:26)
TAIT_EQUATION_GAMMA = 7


def compute_stiffness(
    properties: FluidProperties,
    target_density_variation: float = 0.01,
    expected_max_flow_speed: float = 1.0,
) -> float:
    """B = rho0 * c^2 / gamma with c = v_max / sqrt(eta)
    (reference: set_compressibility, wscsph.rs:45-49; defaults from wscsph.rs:39)."""
    speed_of_sound = expected_max_flow_speed / (target_density_variation**0.5)
    return properties.fluid_density * speed_of_sound**2 / TAIT_EQUATION_GAMMA


def tait_pressure(stiffness, fluid_density, local_density):
    """Tait EOS with pressure clamp for particle deficiency
    (reference: wscsph.rs:52-57)."""
    ratio = jnp.maximum(local_density / jnp.asarray(fluid_density, dtype=REAL), 1.0)
    return jnp.asarray(stiffness, dtype=REAL) * (ratio**TAIT_EQUATION_GAMMA - 1.0)


class WCSPHCarry(NamedTuple):
    """Step-to-step state: particles + cached accelerations (needed by the leapfrog
    scheme across steps, reference: wscsph.rs:21-22) + the simulation clock."""

    particles: ParticleState
    accelerations: jax.Array  # (N, 2), in the same (sorted) order as particles
    time: TimeState


@dataclass(frozen=True)
class WCSPHSolver:
    """Holds static configuration; `step` is the pure jittable step function.

    `viscosity_model` defaults to XSPH in the reference app (main.rs:93);
    `boundary_force_factor` as in wscsph.rs:35.
    """

    viscosity_model: ViscosityModel
    properties: FluidProperties
    grid: GridConfig
    step_config: StepConfig
    boundary_force_factor: float = 1.0
    target_density_variation: float = 0.01
    expected_max_flow_speed: float = 1.0
    gravity: tuple = GRAVITY

    def __post_init__(self):
        h = self.properties.smoothing_length
        object.__setattr__(self, "density_kernel", Poly6(h))
        object.__setattr__(self, "pressure_kernel", Spiky(h))
        object.__setattr__(
            self,
            "stiffness",
            compute_stiffness(
                self.properties,
                self.target_density_variation,
                self.expected_max_flow_speed,
            ),
        )

    def init_carry(self, state: ParticleState) -> WCSPHCarry:
        """clear_cached_data equivalent (wscsph.rs:122-124): zero accelerations."""
        return WCSPHCarry(
            particles=state,
            accelerations=jnp.zeros_like(state.velocities),
            time=TimeState.initial(self.step_config),
        )

    # ------------------------------------------------------------------- forces

    def _accelerations(self, positions, velocities, densities, pressures,
                       neighborhood, boundary_positions, dt):
        """Pressure + viscosity + boundary forces (reference: wscsph.rs:59-118)."""
        mass = self.properties.particle_mass
        dyn = neighborhood.dynamic
        stat = neighborhood.static

        # --- dynamic neighbors: symmetric pressure force + viscosity model
        pos_j = pair.gather(positions, dyn.idx)
        vel_j = pair.gather(velocities, dyn.idx)
        rho_j = pair.gather(densities, dyn.idx)
        p_j = pair.gather(pressures, dyn.idx)
        ri_to_rj, r_sq, r = pair.pair_geometry(positions, pos_j)

        # "good way" to do symmetric forces: -m (pi + pj) / (2 rhoi rhoj)
        # (wscsph.rs:66-69, 100-101)
        coef = (
            jnp.asarray(-mass, dtype=REAL)
            * (pressures[:, None] + p_j)
            / (2.0 * densities[:, None] * rho_j)
        )
        accel_pairs = coef[..., None] * self.pressure_kernel.gradient(ri_to_rj, r_sq, r)
        accel_pairs = accel_pairs + self.viscosity_model.compute_viscous_acceleration(
            dt, r_sq, r, mass, rho_j, vel_j - velocities[:, None, :]
        )
        accel = pair.masked_sum(accel_pairs, dyn.mask)

        # --- static neighbors: Monaghan-Kajtar radial boundary force
        # (wscsph.rs:108-116): a -= f * W(r) / r^2 * ri_to_rj
        bpos_j = pair.gather(boundary_positions, stat.idx)
        b_to_j, b_r_sq, b_r = pair.pair_geometry(positions, bpos_j)
        w = self.pressure_kernel.evaluate(b_r_sq, b_r)
        radial = (
            jnp.asarray(-self.boundary_force_factor, dtype=REAL) * w / b_r_sq
        )[..., None] * b_to_j
        accel = accel + pair.masked_sum(radial, stat.mask)

        return accel + jnp.asarray(self.gravity, dtype=REAL)[None, :]

    # --------------------------------------------------------------------- step

    def step(self, carry: WCSPHCarry, boundary: CellGrid):
        """One simulation step (reference: wscsph.rs:126-179).

        `carry.time` must already be advanced by `TimeState.account_step()` (the frame
        loop's contract). Returns (carry, Diagnostics).
        """
        particles, accel, time_state = carry
        alive = particles.alive
        dt = time_state.dt

        # leapfrog part 1: v at t+0.5, pos at t+1 (wscsph.rs:141-151)
        velocities = particles.velocities + 0.5 * dt * accel
        positions = particles.positions + velocities * dt

        # neighborhood rebuild re-sorts all attributes (wscsph.rs:153); accelerations
        # are recomputed from scratch below so they need no co-sort (the reference
        # also passes no extra attributes here).
        (positions, velocities, alive), positions_sorted, neighborhood = (
            update_neighborhood(
                (positions, velocities, alive), positions, boundary, self.grid
            )
        )
        positions = positions_sorted

        densities = update_densities(
            positions,
            neighborhood,
            boundary.positions,
            self.density_kernel,
            self.properties.particle_mass,
            self.properties.fluid_density,
        )
        pressures = tait_pressure(
            self.stiffness, self.properties.fluid_density, densities
        )
        accel = self._accelerations(
            positions, velocities, densities, pressures,
            neighborhood, boundary.positions, dt,
        )
        # dead (padding) particles are frozen: no gravity, no advection
        accel = jnp.where(alive[:, None], accel, 0.0)

        # CFL dt update uses the *old* dt velocity estimate (wscsph.rs:158-167)
        v_estimate = velocities + accel * dt
        v_est_sq = jnp.where(alive, jnp.sum(v_estimate * v_estimate, axis=-1), 0.0)
        max_velocity = jnp.sqrt(jnp.max(v_est_sq))
        time_state = update_simulation_step(
            self.step_config,
            time_state,
            self.properties.particle_radius * 2.0,
            max_velocity,
        )

        # leapfrog part 2 with the NEW dt (quirk kept from wscsph.rs:169-178)
        velocities = velocities + 0.5 * time_state.dt * accel

        new_carry = WCSPHCarry(
            particles=ParticleState(positions, velocities, densities, alive),
            accelerations=accel,
            time=time_state,
        )
        diagnostics = Diagnostics.zeros()._replace(
            dt=dt,
            max_velocity=max_velocity,
            neighbor_drops=neighborhood.dynamic.num_dropped
            + neighborhood.static.num_dropped,
        )
        return new_carry, diagnostics

    def simulate(self, carry: WCSPHCarry, boundary: CellGrid, num_steps: int):
        """Run `num_steps` steps fully on device under one jit (lax.fori_loop),
        accounting the clock before each step like the frame loop does. The
        returned Diagnostics AGGREGATES across all steps."""

        def body(_, loop_carry):
            c, agg = loop_carry
            c = c._replace(time=c.time.account_step())
            c, diag = self.step(c, boundary)
            return c, agg.accumulate(diag)

        return jax.lax.fori_loop(0, num_steps, body, (carry, Diagnostics.zeros()))
