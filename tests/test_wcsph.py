"""WCSPH solver end-to-end tests on a scaled-down dam-break scene.

The reference has no solver-level tests (SURVEY.md section 4 gap); these regression
tests pin the physics: stability (finite, contained, bounded compression) and the
adaptive dt staying within its configured bounds over hundreds of steps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.models.wcsph import WCSPHSolver, compute_stiffness, tait_pressure
from yasph2d_tpu.timemanager import AdaptiveTimeStep, FixedTimeStep
from yasph2d_tpu.world import FluidParticleWorld


def small_dam_break(particle_density=1600.0):
    """Reference default scene (main.rs:177-196) at reduced particle density so the
    CPU test backend stays fast."""
    world = FluidParticleWorld(2.0, particle_density, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 4)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 4)
    world.add_boundary_thick_line((0.0, 0.0), (0.0, 2.5), 4)
    world.add_boundary_thick_line((2.0, 0.0), (2.0, 2.5), 4)
    world.add_boundary_thick_line((0.0, 0.6), (1.75, 0.5), 2)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 2)
    world.add_boundary_thick_line((-2.0, -0.5), (4.0, -0.5), 4)
    return world


def make_solver(world, step_config=None):
    h = world.properties.smoothing_length
    return WCSPHSolver(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties,
        grid=world.grid,
        step_config=step_config
        or AdaptiveTimeStep(
            timestep_max=1.0 / 360.0,
            timestep_min=1.0 / 24000.0,
            cfl_factor=0.2,  # reference WCSPH cfl (main.rs:115-118)
        ),
    )


def test_tait_pressure():
    world = small_dam_break()
    b = compute_stiffness(world.properties)
    assert abs(b - 100.0 * 100.0 / 7.0) < 1e-6  # c = 1/sqrt(0.01) = 10
    rho0 = 100.0
    assert float(tait_pressure(b, rho0, jnp.float32(rho0))) == 0.0
    assert float(tait_pressure(b, rho0, jnp.float32(0.5 * rho0))) == 0.0  # clamped
    expected = b * (1.01**7 - 1.0)
    assert abs(float(tait_pressure(b, rho0, jnp.float32(1.01 * rho0))) - expected) < 0.05


def test_dam_break_stability():
    world = small_dam_break()
    solver = make_solver(world)
    boundary = world.boundary_grid()
    carry = solver.init_carry(world.initial_state())

    simulate = jax.jit(solver.simulate, static_argnums=2)
    carry, diag = simulate(carry, boundary, 300)

    pos = np.asarray(carry.particles.positions)
    vel = np.asarray(carry.particles.velocities)
    rho = np.asarray(carry.particles.densities)

    assert np.isfinite(pos).all() and np.isfinite(vel).all() and np.isfinite(rho).all()
    # contained in the tank (walls at x=0,2; floors at y=0,-0.5; lid at y=2.5)
    assert pos[:, 0].min() > -0.3 and pos[:, 0].max() < 2.3
    assert pos[:, 1].min() > -0.8 and pos[:, 1].max() < 2.8
    # weak compressibility: densities stay near rho0
    assert rho.min() >= 100.0  # clamp floor
    assert rho.max() < 135.0, f"over-compressed: {rho.max()}"
    # dt within configured bounds
    assert 1.0 / 24000.0 - 1e-9 <= float(carry.time.dt) <= 1.0 / 360.0 + 1e-9
    assert int(carry.time.num_steps) == 300
    # fluid has actually fallen (dam collapse): the rect bottom started at y=0.7
    assert pos[:, 1].min() < 0.65
    assert float(carry.time.total_simulated_time) > 0.05
    assert int(diag.neighbor_drops) == 0


def test_fixed_timestep_deterministic():
    """Same scene, same fixed dt -> bitwise identical trajectories (determinism as a
    testing stance, SURVEY.md section 4.6)."""
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(world, step_config=FixedTimeStep(1.0 / 3000.0))
    boundary = world.boundary_grid()

    def run():
        carry = solver.init_carry(world.initial_state())
        carry, _ = jax.jit(solver.simulate, static_argnums=2)(carry, boundary, 50)
        return np.asarray(carry.particles.positions)

    np.testing.assert_array_equal(run(), run())


def test_gravity_free_fall_matches_leapfrog():
    """A single particle with no neighbors free-falls. The solver starts with ZERO
    cached accelerations (reference: clear_cached_data, wscsph.rs:122-124), so the
    first drift moves nothing and the closed form is y_n = y0 - g/2 (n^2 - n) dt^2
    (one dt of 'lost' fall vs the continuum g/2 t^2)."""
    world = FluidParticleWorld(2.0, 400.0, 100.0)
    world.add_fluid_rect((0.0, 0.0, 0.01, 0.01), 0.0)
    assert world.num_dynamic_particles == 1
    dt = 1.0 / 1000.0
    solver = make_solver(world, step_config=FixedTimeStep(dt))
    carry = solver.init_carry(world.initial_state())
    y0 = float(carry.particles.positions[0, 1])
    n = 100
    carry, _ = jax.jit(solver.simulate, static_argnums=2)(carry, world.boundary_grid(), n)
    expected = y0 - 0.5 * 9.81 * (n * n - n) * dt * dt
    assert abs(float(carry.particles.positions[0, 1]) - expected) < 1e-4
