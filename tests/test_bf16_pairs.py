"""bfloat16 cell-relative pair math (DenseGridConfig.pair_dtype == "bfloat16").

Positions rebased onto cell centers survive bf16's 8-bit mantissa (per-pair
position error ~0.5% of h); reductions accumulate float32. These tests pin:
- pair_reduce bf16 agrees with float32 to the expected relative error;
- a bf16 DFSPH run stays stable, incompressible and close to the f32 trajectory;
- bf16 residuals still converge below the reference tolerances (dfsph.rs:49-55,
  measured by the solver's own exit criterion).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.ops.dense_grid import build_slot_grid, cell_keys, pad_to_slots, pair_reduce
from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2
from yasph2d_tpu.timemanager import FixedTimeStep

from test_wcsph import small_dam_break


def _padded_scene(pair_dtype):
    world = small_dam_break(particle_density=1600.0)
    grid = world.dense_grid(occupancy=12)
    grid = dataclasses.replace(grid, pair_dtype=pair_dtype)
    pos = world.initial_state().positions
    keys = cell_keys(pos, grid)
    order = jnp.argsort(keys)
    pos = pos[order]
    slots = build_slot_grid(keys[order], grid)
    pos_pad = pad_to_slots(pos, slots, grid)
    mask = slots.slot_mask.reshape(grid.ny, grid.nx, grid.occupancy)
    return world, grid, pos_pad, mask


def test_pair_reduce_bf16_matches_f32_within_expected_error():
    world, grid32, pos_pad, mask = _padded_scene("float32")
    grid16 = dataclasses.replace(grid32, pair_dtype="bfloat16")
    kernel = WendlandQuinticC2(world.properties.smoothing_length)

    def terms(ri_to_rj, r_sq, r):
        grad = kernel.gradient(ri_to_rj, r_sq, r)
        return {"w": kernel.evaluate(r_sq, r), "grad": grad}

    f32 = jax.jit(lambda p, m: pair_reduce(terms, p, m, p, m, grid32))(pos_pad, mask)
    bf16 = jax.jit(lambda p, m: pair_reduce(terms, p, m, p, m, grid16))(pos_pad, mask)

    assert f32["w"].dtype == jnp.float32 and bf16["w"].dtype == jnp.float32
    live_w = np.asarray(f32["w"])[np.asarray(mask)]
    live_w16 = np.asarray(bf16["w"])[np.asarray(mask)]
    # per-pair error ~0.5%, ~30 partially-cancelling neighbors -> ~1% on the sum
    scale = np.abs(live_w).max()
    np.testing.assert_allclose(live_w16, live_w, atol=0.02 * scale)

    g = np.asarray(f32["grad"])[np.asarray(mask)]
    g16 = np.asarray(bf16["grad"])[np.asarray(mask)]
    gscale = np.abs(g).max()
    # gradients amplify position error near the support edge ((1-q)^3 with q
    # carrying ~0.5% absolute error): worst observed ~4% of scale on <1% of slots
    np.testing.assert_allclose(g16, g, atol=0.06 * gscale)


def _solver(world, grid):
    return DFSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=grid,
        step_config=FixedTimeStep(1.0 / 3000.0),
    )


@pytest.mark.slow
def test_bf16_dfsph_tracks_f32_and_stays_incompressible():
    world = small_dam_break(particle_density=1600.0)
    grid32 = world.dense_grid(occupancy=12)
    grid16 = dataclasses.replace(grid32, pair_dtype="bfloat16")
    h = world.properties.smoothing_length
    boundary = world.boundary_dense(grid32)

    s32, s16 = _solver(world, grid32), _solver(world, grid16)
    c32 = s32.init_carry(world.initial_state(), boundary)
    c16 = s16.init_carry(world.initial_state(), boundary)

    # initial densities: bf16 noise stays under ~2% of rho0 (observed worst ~0.7%)
    np.testing.assert_allclose(
        np.asarray(c16.particles.densities),
        np.asarray(c32.particles.densities), atol=2.0,
    )

    c32, d32 = jax.jit(s32.simulate, static_argnums=2)(c32, boundary, 10)
    c16, d16 = jax.jit(s16.simulate, static_argnums=2)(c16, boundary, 10)

    # short-horizon particle DISTRIBUTIONS agree to a small fraction of h
    # (row-paired comparison is pairing-unstable: bf16 noise reorders particles
    # within a lattice column, which misaligns lexsort pairs by a full spacing)
    p16, p32 = np.asarray(c16.particles.positions), np.asarray(c32.particles.positions)
    np.testing.assert_allclose(np.sort(p16[:, 0]), np.sort(p32[:, 0]), atol=0.2 * h)
    np.testing.assert_allclose(np.sort(p16[:, 1]), np.sort(p32[:, 1]), atol=0.2 * h)
    assert int(d16.neighbor_drops) == 0

    # longer run: stable, incompressible, residual loops converge (exit criterion
    # enforces the reference tolerances; cap-hit would show as 200*steps iterations)
    # (50 steps: long enough for a cap-hit blowup to be unmistakable)
    c16, d16 = jax.jit(s16.simulate, static_argnums=2)(c16, boundary, 50)
    rho = np.asarray(c16.particles.densities)
    assert np.isfinite(np.asarray(c16.particles.positions)).all()
    assert rho.min() >= 100.0 and rho.max() < 111.0
    assert int(d16.density_iterations) < 90 * s16.max_density_iterations
    assert int(d16.divergence_iterations) < 90 * s16.max_divergence_iterations
