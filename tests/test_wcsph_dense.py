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
