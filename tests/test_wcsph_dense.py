"""Dense-layout WCSPH: cross-validation against the faithful table solver."""

import pytest
import numpy as np
import jax

from yasph2d_tpu.models.wcsph import WCSPHSolver
from yasph2d_tpu.models.wcsph_dense import WCSPHDenseSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep, FixedTimeStep

from test_wcsph import small_dam_break


def make_pair(world, step_config):
    h = world.properties.smoothing_length
    table = WCSPHSolver(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties,
        grid=world.grid,
        step_config=step_config,
    )
    dense_grid = world.dense_grid(occupancy=12)
    dense = WCSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties,
        grid=dense_grid,
        step_config=step_config,
    )
    return table, dense, dense_grid


def sorted_rows(a):
    a = np.asarray(a)
    return a[np.lexsort(a.T)]


def test_wcsph_dense_matches_table_short_horizon():
    world = small_dam_break(particle_density=1600.0)
    table, dense, dense_grid = make_pair(world, FixedTimeStep(1.0 / 3000.0))

    tc = table.init_carry(world.initial_state())
    dc = dense.init_carry(world.initial_state())
    tb = world.boundary_grid()
    db = world.boundary_dense(dense_grid)

    tc, tdiag = jax.jit(table.simulate, static_argnums=2)(tc, tb, 15)
    dc, ddiag = jax.jit(dense.simulate, static_argnums=2)(dc, db, 15)
    assert int(tdiag.neighbor_drops) == 0 and int(ddiag.neighbor_drops) == 0

    tp, dp = sorted_rows(tc.particles.positions), sorted_rows(dc.particles.positions)
    np.testing.assert_allclose(tp, dp, rtol=0, atol=5e-4)
    np.testing.assert_allclose(
        np.sort(np.asarray(tc.particles.densities)),
        np.sort(np.asarray(dc.particles.densities)),
        rtol=1e-4, atol=5e-2,
    )


@pytest.mark.slow
def test_wcsph_dense_dam_break_stability():
    world = small_dam_break(particle_density=1600.0)
    _, dense, dense_grid = make_pair(
        world, AdaptiveTimeStep(1 / 360, 1 / 24000, cfl_factor=0.2)
    )
    db = world.boundary_dense(dense_grid)
    dc = dense.init_carry(world.initial_state())
    dc, diag = jax.jit(dense.simulate, static_argnums=2)(dc, db, 300)

    pos = np.asarray(dc.particles.positions)
    rho = np.asarray(dc.particles.densities)
    assert np.isfinite(pos).all()
    assert pos[:, 0].min() > -0.3 and pos[:, 0].max() < 2.3
    assert rho.min() >= 100.0 and rho.max() < 135.0
    assert int(diag.neighbor_drops) == 0
    assert pos[:, 1].min() < 0.65  # dam collapsed


def test_wcsph_padded_matches_dense():
    """Padded-resident WCSPH vs the sorted-carry dense solver: same window
    passes, different layout lifecycle (re-bucket vs sort+pad/unpad). Per-cell
    candidate order differs, so agreement is to f32 drift."""
    from yasph2d_tpu.models.wcsph_dense import WCSPHPaddedSolver

    world = small_dam_break(particle_density=1600.0)
    # dt small enough that the jittered start does not shock (WCSPH at
    # 1/3000 launches startup-pressure spikes that amplify f32 drift
    # chaotically; the app's adaptive policy starts at 1/24000 for the
    # same reason)
    _, dense, dense_grid = make_pair(world, FixedTimeStep(1.0 / 24000.0))
    padded = WCSPHPaddedSolver(
        viscosity_model=dense.viscosity_model, properties=world.properties,
        grid=dense_grid, step_config=dense.step_config,
    )
    db = world.boundary_dense(dense_grid)

    dc = dense.init_carry(world.initial_state())
    pc = jax.jit(padded.init_carry)(world.initial_state())
    assert int(np.asarray(pc.mask).sum()) == world.num_dynamic_particles

    dc, ddiag = jax.jit(dense.simulate, static_argnums=2)(dc, db, 30)
    pc, pdiag = jax.jit(padded.simulate, static_argnums=2)(pc, db, 30)
    assert int(ddiag.neighbor_drops) == 0 and int(pdiag.neighbor_drops) == 0
    np.testing.assert_allclose(float(dc.time.dt), float(pc.time.dt), rtol=1e-5)

    ps = padded.export_state(pc)
    alive = np.asarray(ps.alive)
    pp = np.asarray(ps.positions)[alive]
    dp = sorted_rows(dc.particles.positions)
    np.testing.assert_allclose(sorted_rows(pp), dp, rtol=0, atol=5e-4)
    np.testing.assert_allclose(
        np.sort(np.asarray(ps.densities)[alive]),
        np.sort(np.asarray(dc.particles.densities)),
        rtol=1e-4, atol=5e-2,
    )


def test_wcsph_padded_adaptive_long_run():
    """Adaptive-dt stability + particle conservation on the padded WCSPH."""
    from yasph2d_tpu.models.wcsph_dense import WCSPHPaddedSolver

    world = small_dam_break(particle_density=1600.0)
    _, dense, dense_grid = make_pair(
        world,
        AdaptiveTimeStep(timestep_max=1 / 360, timestep_min=1 / 24000,
                         cfl_factor=0.2),
    )
    padded = WCSPHPaddedSolver(
        viscosity_model=dense.viscosity_model, properties=world.properties,
        grid=dense_grid, step_config=dense.step_config,
    )
    db = world.boundary_dense(dense_grid)
    pc = jax.jit(padded.init_carry)(world.initial_state())
    n0 = int(np.asarray(pc.mask).sum())
    pc, pdiag = jax.jit(padded.simulate, static_argnums=2)(pc, db, 150)
    assert int(pdiag.neighbor_drops) == 0
    assert int(np.asarray(pc.mask).sum()) == n0
    ps = padded.export_state(pc)
    pos = np.asarray(ps.positions)[np.asarray(ps.alive)]
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() > -0.6 and pos[:, 1].max() < 2.6
