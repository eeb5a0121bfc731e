"""DFSPH solver end-to-end tests.

Pins the physics the reference only eyeballs (SURVEY.md section 4 gap): residual
convergence below the configured tolerances, incompressibility, stability, and
warm-start bookkeeping.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yasph2d_tpu.models.dfsph import DFSPHSolver
from yasph2d_tpu.models.viscosity import PhysicalViscosityModel, XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep, FixedTimeStep
from yasph2d_tpu.world import FluidParticleWorld

from test_wcsph import small_dam_break


def make_solver(world, step_config=None, viscosity=None):
    h = world.properties.smoothing_length
    return DFSPHSolver(
        viscosity_model=viscosity or XSPHViscosityModel(smoothing_length=h),
        properties=world.properties,
        grid=world.grid,
        step_config=step_config
        or AdaptiveTimeStep(
            timestep_max=1.0 / 360.0,
            timestep_min=1.0 / 24000.0,
            cfl_factor=1.5,  # reference DFSPH cfl (main.rs:115-118)
        ),
    )


def run_steps(solver, world, n):
    boundary = world.boundary_grid()
    carry = solver.init_carry(world.initial_state(), boundary)
    simulate = jax.jit(solver.simulate, static_argnums=2)
    return simulate(carry, boundary, n)


@pytest.mark.slow
def test_dam_break_stability_and_convergence():
    world = small_dam_break()
    solver = make_solver(world)
    carry, diag = run_steps(solver, world, 200)

    pos = np.asarray(carry.particles.positions)
    vel = np.asarray(carry.particles.velocities)
    rho = np.asarray(carry.particles.densities)

    assert np.isfinite(pos).all() and np.isfinite(vel).all() and np.isfinite(rho).all()
    assert pos[:, 0].min() > -0.3 and pos[:, 0].max() < 2.3
    assert pos[:, 1].min() > -0.8 and pos[:, 1].max() < 2.8
    # DFSPH keeps the fluid much closer to incompressible than WCSPH
    assert rho.min() >= 100.0
    assert rho.max() < 110.0, f"over-compressed: {rho.max()}"

    # diag aggregates across all 200 steps: iteration counts are sums, drops and
    # residuals are per-step maxima (Diagnostics.accumulate)
    assert int(diag.density_iterations) <= 200 * solver.max_density_iterations
    assert int(diag.divergence_iterations) <= 200 * solver.max_divergence_iterations
    assert int(diag.neighbor_drops) == 0  # across ALL steps now, not just the last

    # last-step residuals met their tolerances (one explicit extra step)
    carry = carry._replace(time=carry.time.account_step())
    _, step_diag = jax.jit(solver.step)(carry, world.boundary_grid())
    dt = float(step_diag.dt)
    assert int(step_diag.density_iterations) <= solver.max_density_iterations
    assert int(step_diag.divergence_iterations) <= solver.max_divergence_iterations
    assert (
        float(step_diag.avg_density_error) / 100.0 * dt
        < solver.max_avg_density_error
    )
    assert float(step_diag.avg_divergence) * dt < solver.max_divergence_error
    # the dam has collapsed (rect bottom started at y=0.7)
    assert pos[:, 1].min() < 0.65


def test_warmstart_gating_counts():
    """prev-iteration counts carried for warm-start gating (dfsph.rs:199, 354)."""
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(world)
    carry, _ = run_steps(solver, world, 5)
    assert int(carry.prev_density_iterations) >= 1
    assert int(carry.prev_divergence_iterations) >= 1
    # warm-start accumulators are finite and were co-sorted without corruption
    assert np.isfinite(np.asarray(carry.warmstart_kappa)).all()
    assert np.isfinite(np.asarray(carry.warmstart_stiffness)).all()


@pytest.mark.slow
def test_resting_fluid_stays_at_rest_density():
    """A settled pool: densities within the density-error tolerance of rho0 and small
    velocities (regression for residual trajectories, SURVEY.md section 4 gaps)."""
    world = FluidParticleWorld(2.0, 900.0, 100.0)
    # Shallow pool sitting directly on the floor. Thick lines extend to the LEFT of
    # the start->end direction (reference: fluidparticleworld.rs:168-176), so the
    # side walls are ordered to grow AWAY from the fluid — otherwise the wall
    # overlaps the pool and embedded particles explode outward.
    world.add_fluid_rect((0.0, 0.02, 1.0, 0.15), 0.01)
    world.add_boundary_thick_line((-0.2, 0.0), (1.2, 0.0), 3)
    world.add_boundary_thick_line((0.0, 0.5), (0.0, 0.0), 3)
    world.add_boundary_thick_line((1.0, 0.0), (1.0, 0.5), 3)
    solver = make_solver(world)
    carry, diag = run_steps(solver, world, 150)
    rho = np.asarray(carry.particles.densities)
    vel = np.asarray(carry.particles.velocities)
    assert np.isfinite(vel).all()
    assert rho.max() < 105.0
    # settled: no particle faster than ~0.5 m/s after 150 adaptive steps
    assert np.sqrt((vel * vel).sum(-1)).max() < 0.5


def test_physical_viscosity_model_runs():
    """High-viscosity config (reference main.rs:95-96 constructs mu=0.01)."""
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(
        world,
        viscosity=PhysicalViscosityModel(
            smoothing_length=world.properties.smoothing_length, fluid_viscosity=0.01
        ),
    )
    carry, _ = run_steps(solver, world, 30)
    assert np.isfinite(np.asarray(carry.particles.positions)).all()
    assert np.isfinite(np.asarray(carry.particles.velocities)).all()


@pytest.mark.slow
def test_fixed_timestep_deterministic():
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(world, step_config=FixedTimeStep(1.0 / 3000.0))
    boundary = world.boundary_grid()

    def run():
        carry = solver.init_carry(world.initial_state(), boundary)
        carry, _ = jax.jit(solver.simulate, static_argnums=2)(carry, boundary, 40)
        return np.asarray(carry.particles.positions)

    np.testing.assert_array_equal(run(), run())
