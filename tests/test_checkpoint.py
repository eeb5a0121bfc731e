"""Checkpoint / resume round-trip: saving mid-simulation and resuming must produce
the same trajectory as running straight through (fixed dt => bitwise identical)."""

import numpy as np
import jax
import pytest

from yasph2d_tpu.models.dfsph import DFSPHSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import FixedTimeStep
from yasph2d_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

from test_wcsph import small_dam_break


def make_solver(world):
    return DFSPHSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=world.grid,
        step_config=FixedTimeStep(1.0 / 3000.0),
    )


@pytest.mark.slow
def test_checkpoint_roundtrip_resume(tmp_path):
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(world)
    boundary = world.boundary_grid()
    simulate = jax.jit(solver.simulate, static_argnums=2)

    carry = solver.init_carry(world.initial_state(), boundary)
    carry, _ = simulate(carry, boundary, 20)

    path = tmp_path / "mid.npz"
    save_checkpoint(str(path), carry)

    # straight-through reference
    straight, _ = simulate(carry, boundary, 20)

    # resume from disk into a freshly initialized template
    template = solver.init_carry(world.initial_state(), boundary)
    restored = load_checkpoint(str(path), template)
    resumed, _ = simulate(restored, boundary, 20)

    np.testing.assert_array_equal(
        np.asarray(straight.particles.positions),
        np.asarray(resumed.particles.positions),
    )
    np.testing.assert_array_equal(
        np.asarray(straight.particles.velocities),
        np.asarray(resumed.particles.velocities),
    )
    assert int(resumed.time.num_steps) == int(straight.time.num_steps)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(world)
    boundary = world.boundary_grid()
    carry = solver.init_carry(world.initial_state(), boundary)
    path = tmp_path / "ck.npz"
    save_checkpoint(str(path), carry)

    other = small_dam_break(particle_density=400.0)
    other_solver = make_solver(other)
    template = other_solver.init_carry(other.initial_state(), other.boundary_grid())
    with pytest.raises((ValueError, KeyError)):
        load_checkpoint(str(path), template)


@pytest.mark.slow
def test_checkpoint_roundtrip_padded_carry(tmp_path):
    """The padded-resident carry (slot-layout pytree incl. the traced clock and
    warm starts) checkpoints and resumes bitwise-identically at fixed dt."""
    from yasph2d_tpu.models.dfsph_dense import DFSPHPaddedSolver

    world = small_dam_break(particle_density=900.0)
    grid = world.dense_grid(occupancy=12)
    solver = DFSPHPaddedSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties, grid=grid,
        step_config=FixedTimeStep(1.0 / 3000.0),
    )
    boundary = world.boundary_dense(grid)
    simulate = jax.jit(solver.simulate, static_argnums=2)

    carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    carry, _ = simulate(carry, boundary, 15)

    path = tmp_path / "mid_padded.npz"
    save_checkpoint(str(path), carry)
    straight, _ = simulate(carry, boundary, 15)

    template = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    restored = load_checkpoint(str(path), template)
    resumed, _ = simulate(restored, boundary, 15)

    np.testing.assert_array_equal(
        np.asarray(straight.ctx.pos_pad), np.asarray(resumed.ctx.pos_pad)
    )
    np.testing.assert_array_equal(
        np.asarray(straight.v_pad), np.asarray(resumed.v_pad)
    )
    assert float(straight.time.total_simulated_time) == float(
        resumed.time.total_simulated_time
    )


def test_checkpoint_roundtrip_plane_carry(tmp_path):
    """The plane-resident carry (slot-major plane pytree) checkpoints and
    restores bitwise — checkpoint/resume is layout-agnostic across all three
    carry generations. WCSPH plane init is pair-pass-free, so this stays in
    the fast set (stepping the plane solvers is TPU-gated elsewhere)."""
    from yasph2d_tpu.models.wcsph_plane import WCSPHPlaneSolver
    import dataclasses

    world = small_dam_break(particle_density=400.0)
    grid = dataclasses.replace(
        world.dense_grid(occupancy=8), use_pallas_slotmajor=True
    )
    solver = WCSPHPlaneSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties, grid=grid,
        step_config=FixedTimeStep(1.0 / 3000.0),
    )
    carry = solver.init_carry(world.initial_state())

    path = tmp_path / "plane.npz"
    save_checkpoint(str(path), carry)
    restored = load_checkpoint(str(path), carry)
    for g, r in zip(jax.tree_util.tree_leaves(carry),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
