"""Dense-layout DFSPH solver: cross-validation against the faithful table solver.

The two implementations share the algorithm but differ in data layout and summation
order; trajectories agree to float32 tolerance over short horizons and in aggregate
statistics over longer ones.
"""

import numpy as np
import jax
import pytest

from yasph2d_tpu.models.dfsph import DFSPHSolver
from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep, FixedTimeStep

from test_wcsph import small_dam_break


def make_pair(world, step_config):
    h = world.properties.smoothing_length
    table = DFSPHSolver(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties,
        grid=world.grid,
        step_config=step_config,
    )
    dense_grid = world.dense_grid(occupancy=12)
    dense = DFSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties,
        grid=dense_grid,
        step_config=step_config,
    )
    return table, dense, dense_grid


def sorted_rows(a):
    a = np.asarray(a)
    return a[np.lexsort(a.T)]


@pytest.mark.slow
def test_dense_matches_table_short_horizon():
    world = small_dam_break(particle_density=1600.0)
    table, dense, dense_grid = make_pair(world, FixedTimeStep(1.0 / 3000.0))

    tc = table.init_carry(world.initial_state(), world.boundary_grid())
    dc = dense.init_carry(world.initial_state(), world.boundary_dense(dense_grid))

    # identical initial densities and alpha (same math, different layout/order)
    np.testing.assert_allclose(
        sorted_rows(tc.particles.positions), sorted_rows(dc.particles.positions),
        rtol=0, atol=0,
    )
    ti = np.argsort(np.asarray(tc.particles.positions)[:, 0] * 1e3
                    + np.asarray(tc.particles.positions)[:, 1])
    di = np.argsort(np.asarray(dc.particles.positions)[:, 0] * 1e3
                    + np.asarray(dc.particles.positions)[:, 1])
    np.testing.assert_allclose(
        np.asarray(tc.particles.densities)[ti], np.asarray(dc.particles.densities)[di],
        rtol=1e-5, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(tc.alpha)[ti], np.asarray(dc.alpha)[di], rtol=1e-3, atol=1e-9
    )

    # 10 fixed steps: trajectories still within float drift of each other
    tc, tdiag = jax.jit(table.simulate, static_argnums=2)(tc, world.boundary_grid(), 10)
    dc, ddiag = jax.jit(dense.simulate, static_argnums=2)(
        dc, world.boundary_dense(dense_grid), 10
    )
    assert int(tdiag.neighbor_drops) == 0 and int(ddiag.neighbor_drops) == 0
    tp, dp = sorted_rows(tc.particles.positions), sorted_rows(dc.particles.positions)
    np.testing.assert_allclose(tp, dp, rtol=0, atol=5e-4)
    assert int(tdiag.density_iterations) == int(ddiag.density_iterations)
    assert int(tdiag.divergence_iterations) == int(ddiag.divergence_iterations)


@pytest.mark.slow
def test_dense_long_run_stable_and_incompressible():
    world = small_dam_break(particle_density=1600.0)
    _, dense, dense_grid = make_pair(
        world, AdaptiveTimeStep(1 / 360, 1 / 24000, cfl_factor=1.5)
    )
    bd = world.boundary_dense(dense_grid)
    dc = dense.init_carry(world.initial_state(), bd)
    dc, diag = jax.jit(dense.simulate, static_argnums=2)(dc, bd, 200)

    pos = np.asarray(dc.particles.positions)
    rho = np.asarray(dc.particles.densities)
    assert np.isfinite(pos).all()
    assert rho.min() >= 100.0 and rho.max() < 110.0
    assert pos[:, 0].min() > -0.3 and pos[:, 0].max() < 2.3
    assert int(diag.neighbor_drops) == 0
    assert pos[:, 1].min() < 0.65  # dam collapsed


def test_dense_grid_covers_scene():
    world = small_dam_break(particle_density=1600.0)
    g = world.dense_grid()
    assert g.contains((0.0, 0.0, 2.0, 2.5))
    h = world.properties.smoothing_length
    assert abs(g.cell_size - h) < 1e-9


@pytest.mark.slow
def test_dense_solver_without_boundary():
    """Fluid-only scene (no boundary particles): the dense path must build and step
    (regression: pad_to_slots crashed on an empty index space)."""
    from yasph2d_tpu.world import FluidParticleWorld

    world = FluidParticleWorld(2.0, 900.0, 100.0)
    world.add_fluid_rect((0.0, 0.0, 0.3, 0.3), 0.01)
    grid = world.dense_grid(occupancy=12, margin_cells=4)
    _, dense, _ = (None, DFSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=grid,
        step_config=FixedTimeStep(1.0 / 3000.0),
    ), None)
    boundary = world.boundary_dense(grid)
    carry = dense.init_carry(world.initial_state(), boundary)
    carry, diag = jax.jit(dense.simulate, static_argnums=2)(carry, boundary, 5)
    assert np.isfinite(np.asarray(carry.particles.positions)).all()
    # free-falling blob: densities clamp at rho0, no boundary drops
    assert np.asarray(carry.particles.densities).min() >= 100.0


@pytest.mark.slow
def test_rebuild_every_k_bounded_deviation():
    """Opt-in k-step rebuild (rebuild_every > 1): stale steps keep the previous
    cell assignment but refresh all pair geometry with true positions, so the
    only physics deviation comes from pairs entering the support radius from
    outside the stale 3x3 window. Per-particle trajectories diverge chaotically
    (the dam-break's initial density shock drives |v| ~ 35 m/s, ~0.2 cells per
    step), so the bound is on AGGREGATE observables over a 100-step adaptive
    horizon: simulated time, center of mass, kinetic energy, compression."""
    import dataclasses

    world = small_dam_break(particle_density=1600.0)
    _, dense, dense_grid = make_pair(
        world, AdaptiveTimeStep(1 / 360, 1 / 24000, cfl_factor=1.5)
    )
    bd = world.boundary_dense(dense_grid)
    h = world.properties.smoothing_length

    def run(solver):
        c = solver.init_carry(world.initial_state(), bd)
        c, d = jax.jit(solver.simulate, static_argnums=2)(c, bd, 100)
        return c, d

    c1, d1 = run(dense)
    c3, d3 = run(dataclasses.replace(dense, rebuild_every=3))
    assert int(d1.neighbor_drops) == 0 and int(d3.neighbor_drops) == 0

    p1, p3 = np.asarray(c1.particles.positions), np.asarray(c3.particles.positions)
    v1, v3 = np.asarray(c1.particles.velocities), np.asarray(c3.particles.velocities)
    rho3 = np.asarray(c3.particles.densities)
    assert np.isfinite(p3).all() and np.isfinite(rho3).all()
    # same simulated time within 2% (dt trajectories may differ slightly)
    t1, t3 = float(c1.time.total_simulated_time), float(c3.time.total_simulated_time)
    assert abs(t3 - t1) < 0.02 * t1
    # center of mass within a fraction of h (measured ~0.001 h at k=3)
    com = np.linalg.norm(p1.mean(0) - p3.mean(0))
    assert com < 0.1 * h, f"k=3 center-of-mass drift {com} > 0.1 h"
    # kinetic energy within 5% (measured ~0.03%)
    ke1, ke3 = float(0.5 * (v1**2).sum()), float(0.5 * (v3**2).sum())
    assert abs(ke3 - ke1) < 0.05 * ke1
    # incompressibility and containment preserved
    assert rho3.min() >= 100.0 and rho3.max() < 110.0
    assert p3[:, 0].min() > -0.3 and p3[:, 0].max() < 2.3


def test_rebuild_every_one_is_identical():
    """rebuild_every=1 must be bit-identical to the default path (same trace)."""
    import dataclasses

    world = small_dam_break(particle_density=1600.0)
    _, dense, dense_grid = make_pair(world, FixedTimeStep(1.0 / 3000.0))
    bd = world.boundary_dense(dense_grid)
    c0 = dense.init_carry(world.initial_state(), bd)
    ka = dataclasses.replace(dense, rebuild_every=1)
    ca, _ = jax.jit(dense.simulate, static_argnums=2)(c0, bd, 7)
    cb, _ = jax.jit(ka.simulate, static_argnums=2)(c0, bd, 7)
    np.testing.assert_array_equal(
        np.asarray(ca.particles.positions), np.asarray(cb.particles.positions)
    )
