"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8).

Checks that the full DFSPH step compiles and runs under particle-dimension data
parallelism, and that the sharded step computes the SAME physics as the single-device
step (same scene, fixed dt, bitwise comparison is too strict across different
reduction partitions — compare within float32 tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yasph2d_tpu.models.dfsph import DFSPHSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.parallel.sharding import (
    PARTICLE_AXIS,
    carry_shardings,
    make_mesh,
    pad_particle_count,
    replicated,
    shard_carry,
)
from yasph2d_tpu.timemanager import FixedTimeStep
from yasph2d_tpu.world import FluidParticleWorld

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


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(jax.devices()[:8])


def test_padding_is_inert(mesh):
    """Padded (parked) particles must not change the physics of the real ones."""
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(world)
    boundary = world.boundary_grid()

    state = world.initial_state()
    n_real = state.positions.shape[0]
    padded = pad_particle_count(state, 8)
    assert padded.positions.shape[0] % 8 == 0

    c_ref = solver.init_carry(state, boundary)
    c_pad = solver.init_carry(padded, boundary)
    c_ref, _ = jax.jit(solver.simulate, static_argnums=2)(c_ref, boundary, 10)
    c_pad, _ = jax.jit(solver.simulate, static_argnums=2)(c_pad, boundary, 10)

    # parked particles sort to the front (grid_min corner); real particles after.
    # Compare as sets of positions (sort order may differ within equal keys).
    ref = np.asarray(c_ref.particles.positions)
    pad = np.asarray(c_pad.particles.positions)
    real_rows = pad[:, 0] > -50.0
    assert real_rows.sum() == n_real
    ref_sorted = ref[np.lexsort(ref.T)]
    pad_sorted = pad[real_rows][np.lexsort(pad[real_rows].T)]
    np.testing.assert_allclose(ref_sorted, pad_sorted, rtol=0, atol=1e-6)


def test_sharded_step_matches_single_device(mesh):
    world = small_dam_break(particle_density=900.0)
    solver = make_solver(world)
    boundary = world.boundary_grid()
    state = pad_particle_count(world.initial_state(), 8)
    carry = solver.init_carry(state, boundary)

    def steps(carry, boundary):
        c, _ = solver.simulate(carry, boundary, 5)
        return c

    # single device
    c_single = jax.jit(steps)(carry, boundary)

    # 8-device mesh
    s_carry, s_boundary = shard_carry(carry, boundary, mesh)
    sharded = jax.jit(
        steps,
        in_shardings=(carry_shardings(carry, mesh), replicated(boundary, mesh)),
        out_shardings=carry_shardings(carry, mesh),
    )
    c_mesh = sharded(s_carry, s_boundary)

    # the output really is sharded over the particle axis
    shards = c_mesh.particles.positions.sharding
    assert PARTICLE_AXIS in shards.spec

    np.testing.assert_allclose(
        np.asarray(c_single.particles.positions),
        np.asarray(c_mesh.particles.positions),
        rtol=0,
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(c_single.particles.densities),
        np.asarray(c_mesh.particles.densities),
        rtol=1e-5,
        atol=1e-3,
    )


@pytest.mark.slow
def test_dense_sharded_step_matches_single_device(mesh):
    """Spatial sharding of the dense backend: cell rows shard over the mesh; XLA
    turns the neighbor-window slices into halo exchanges. Physics must match the
    single-device dense run."""
    from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver
    from yasph2d_tpu.parallel.sharding import (
        dense_shardings,
        make_space_mesh,
        pad_particles_dense,
        shard_dense,
    )

    mesh = make_space_mesh(jax.devices()[:8])
    world = small_dam_break(particle_density=1600.0)
    grid = world.dense_grid(occupancy=12, ny_multiple=8)
    assert grid.ny % 8 == 0
    solver = DFSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=grid,
        step_config=FixedTimeStep(1.0 / 3000.0),
    )
    boundary = world.boundary_dense(grid)
    state = pad_particles_dense(world.initial_state(), 8, grid)
    carry = solver.init_carry(state, boundary)
    n = state.positions.shape[0]

    def steps(carry, boundary):
        c, _ = solver.simulate(carry, boundary, 5)
        return c

    c_single = jax.jit(steps)(carry, boundary)

    s_carry, s_boundary = shard_dense(carry, boundary, mesh, grid)
    sharded = jax.jit(
        steps,
        in_shardings=(
            dense_shardings(carry, mesh, n, grid.ny, grid.nx),
            dense_shardings(boundary, mesh, -1, grid.ny, grid.nx),
        ),
        out_shardings=dense_shardings(carry, mesh, n, grid.ny, grid.nx),
    )
    c_mesh = sharded(s_carry, s_boundary)

    np.testing.assert_allclose(
        np.asarray(c_single.particles.positions),
        np.asarray(c_mesh.particles.positions),
        rtol=0,
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(c_single.particles.densities),
        np.asarray(c_mesh.particles.densities),
        rtol=1e-5,
        atol=1e-3,
    )
