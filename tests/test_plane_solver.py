"""Plane-resident DFSPH (DFSPHPlaneSolver) vs the padded slot-major solver.

The plane solver shares the slot-major kernels' (qp, view, sp) accumulation
order with DFSPHPaddedSolver(use_pallas_slotmajor=True); the fluid-BOUNDARY
ctx pass moves from the XLA pair_reduce into the same kernel, so f32 boundary
sums accumulate in a different order — agreement is to float32 drift, not
bitwise. Iteration counts and drop counts must match exactly on this scene.

TPU-only (same rationale as test_pallas_slotmajor's solver test): in interpret
mode the jitted solver inlines the fully-unrolled 9 x Ps x P kernel graph per
pass and the COMPILE alone exceeds an hour. The kernel-level PF-vs-sm
bit-equality is pinned on every backend in tests/test_pallas_plane.py.
"""

import dataclasses

import jax
import numpy as np
import pytest

from yasph2d_tpu.models.dfsph_dense import DFSPHPaddedSolver
from yasph2d_tpu.models.dfsph_plane import DFSPHPlaneSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep, FixedTimeStep

from test_wcsph import small_dam_break

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="jitted slot-major solvers compile >1 h in interpret mode; "
    "kernel-level PF equivalence is covered by test_pallas_plane.py",
)


def make_pair(world, step_config):
    h = world.properties.smoothing_length
    grid = dataclasses.replace(
        world.dense_grid(occupancy=12), use_pallas_slotmajor=True
    )
    common = dict(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties, grid=grid, step_config=step_config,
    )
    return DFSPHPaddedSolver(**common), DFSPHPlaneSolver(**common), grid


def live_rows(state):
    alive = np.asarray(state.alive)
    rows = np.concatenate(
        [np.asarray(state.positions), np.asarray(state.densities)[:, None]],
        axis=1,
    )[alive]
    return rows[np.lexsort(rows.T)]


@pytest.mark.slow
@pytest.mark.parametrize("step_config", [
    FixedTimeStep(1.0 / 3000.0),
    AdaptiveTimeStep(timestep_max=1 / 360, timestep_min=1 / 24000, cfl_factor=1.5),
], ids=["fixed", "adaptive"])
def test_plane_matches_padded_slotmajor(step_config):
    world = small_dam_break(particle_density=1600.0)
    padded, plane, grid = make_pair(world, step_config)
    boundary = world.boundary_dense(grid)
    bpl = plane.boundary_planes(boundary)

    pc = jax.jit(padded.init_carry)(world.initial_state(), boundary)
    fc = jax.jit(plane.init_carry)(world.initial_state(), bpl)

    pc, pdiag = jax.jit(padded.simulate, static_argnums=2)(pc, boundary, 10)
    fc, fdiag = jax.jit(plane.simulate, static_argnums=2)(fc, bpl, 10)

    assert int(pdiag.neighbor_drops) == 0 and int(fdiag.neighbor_drops) == 0
    assert int(pdiag.density_iterations) == int(fdiag.density_iterations)
    assert int(pdiag.divergence_iterations) == int(fdiag.divergence_iterations)
    np.testing.assert_allclose(float(pc.time.dt), float(fc.time.dt), rtol=1e-5)

    prows = live_rows(padded.export_state(pc))
    frows = live_rows(plane.export_state(fc))
    assert prows.shape == frows.shape
    np.testing.assert_allclose(prows[:, :2], frows[:, :2], rtol=0, atol=5e-4)
    np.testing.assert_allclose(prows[:, 2], frows[:, 2], rtol=2e-4, atol=5e-2)


@pytest.mark.slow
def test_plane_conserves_particles():
    world = small_dam_break(particle_density=1600.0)
    _, plane, grid = make_pair(
        world,
        AdaptiveTimeStep(timestep_max=1 / 360, timestep_min=1 / 24000,
                         cfl_factor=1.5),
    )
    bpl = plane.boundary_planes(world.boundary_dense(grid))
    c = jax.jit(plane.init_carry)(world.initial_state(), bpl)
    n0 = int(np.asarray(c.ctx.mask).sum())
    assert n0 == world.num_dynamic_particles
    c, d = jax.jit(plane.simulate, static_argnums=2)(c, bpl, 25)
    assert int(d.neighbor_drops) == 0
    assert int(np.asarray(c.ctx.mask).sum()) == n0
    s = plane.export_state(c)
    pos = np.asarray(s.positions)[np.asarray(s.alive)]
    assert np.isfinite(pos).all()


def test_plane_config_build_and_step():
    """SolverConfig(kind='dfsph_plane') builds and steps through the
    declarative surface."""
    from yasph2d_tpu.config import (
        BoundaryThickLine, FluidConfig, FluidRect, SimulationConfig,
        SolverConfig, TimestepConfig,
    )

    cfg = SimulationConfig(
        fluid=FluidConfig(particle_density=1600.0),
        timestep=TimestepConfig(kind="fixed", fixed_timestep=1.0 / 3000.0),
        solver=SolverConfig(kind="dfsph_plane", dense_occupancy=12),
        scene=[
            FluidRect(rect=(0.1, 0.7, 0.5, 1.0), jitter=0.05),
            BoundaryThickLine(start=(0.0, 0.0), end=(2.0, 0.0), thickness=4),
            BoundaryThickLine(start=(0.0, 0.0), end=(0.0, 2.5), thickness=4),
            BoundaryThickLine(start=(2.0, 0.0), end=(2.0, 2.5), thickness=4),
            BoundaryThickLine(start=(-2.0, -0.5), end=(4.0, -0.5), thickness=4),
        ],
    )
    world, solver, boundary, carry = cfg.build()
    assert isinstance(solver, DFSPHPlaneSolver)
    carry, diag = jax.jit(solver.simulate, static_argnums=2)(carry, boundary, 3)
    assert int(diag.neighbor_drops) == 0
    s = solver.export_state(carry)
    assert int(np.asarray(s.alive).sum()) == world.num_dynamic_particles
