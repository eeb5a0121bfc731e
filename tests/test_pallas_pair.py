"""Pallas pair kernel vs the XLA pair_reduce path (interpret mode on CPU).

Summation order differs (Pallas accumulates per neighbor-cell window; XLA reduces
one 9P axis), so agreement is to float32 tolerance, not bitwise.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from yasph2d_tpu.ops.dense_grid import (
    DenseGridConfig,
    build_slot_grid,
    cell_keys,
    pad_to_slots,
    pair_reduce,
)
from yasph2d_tpu.ops.pallas_pair import pallas_pair_reduce
from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2


def setup(n=500, seed=0):
    h = 0.3
    grid = DenseGridConfig(
        cell_size=h, origin=(0.0, 0.0), nx=10, ny=20, occupancy=8, row_block=6
    )
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(
        (np.asarray(grid.origin) + rng.random((n, 2)) * [grid.nx * h, grid.ny * h])
        .astype(np.float32)
    )
    keys = cell_keys(pos, grid)
    order = jnp.argsort(keys)
    pos, keys = pos[order], keys[order]
    slots = build_slot_grid(keys, grid)
    pp = pad_to_slots(pos, slots, grid)
    mask = slots.slot_mask.reshape(grid.ny, grid.nx, grid.occupancy)
    vel = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    vp = pad_to_slots(vel, slots, grid)
    return grid, pp, mask, vp, WendlandQuinticC2(h)


def test_pallas_matches_xla_multi_output():
    grid, pp, mask, vp, kernel = setup()

    def fn(ri, r_sq, r, v_i, v_j):
        grad = kernel.gradient(ri, r_sq, r)
        return {
            "w": kernel.evaluate(r_sq, r),
            "div": jnp.sum((v_i - v_j) * grad, -1),
            "vec": grad,
        }

    ref = pair_reduce(fn, pp, mask, pp, mask, grid,
                      source_values=(vp,), query_values=(vp,))
    out = pallas_pair_reduce(fn, pp, mask, pp, mask, grid,
                             source_values=(vp,), query_values=(vp,),
                             block_rows=4, interpret=True)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), rtol=1e-4, atol=1e-4
        )


def test_pallas_uneven_blocks_and_scalar_values():
    grid, pp, mask, vp, kernel = setup(seed=3)
    kpad = jnp.sum(vp, axis=-1)  # (ny, nx, P) scalar per slot

    def fn(ri, r_sq, r, k_i, k_j):
        grad = kernel.gradient(ri, r_sq, r)
        return (k_i + k_j)[..., None] * grad

    ref = pair_reduce(fn, pp, mask, pp, mask, grid,
                      source_values=(kpad,), query_values=(kpad,))
    out = pallas_pair_reduce(fn, pp, mask, pp, mask, grid,
                             source_values=(kpad,), query_values=(kpad,),
                             block_rows=7, interpret=True)  # 20/7 -> uneven
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_dense_solver_with_pallas_backend():
    """Full DFSPH dense step through the Pallas kernels matches the XLA path."""
    import dataclasses

    from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver
    from yasph2d_tpu.models.viscosity import XSPHViscosityModel
    from yasph2d_tpu.timemanager import FixedTimeStep
    from yasph2d_tpu.world import FluidParticleWorld

    world = FluidParticleWorld(2.0, 900.0, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 4)
    world.add_boundary_thick_line((-2.0, -0.5), (4.0, -0.5), 4)

    def solver_for(grid):
        return DFSPHDenseSolver(
            viscosity_model=XSPHViscosityModel(
                smoothing_length=world.properties.smoothing_length
            ),
            properties=world.properties,
            grid=grid,
            step_config=FixedTimeStep(1.0 / 3000.0),
        )

    g_xla = world.dense_grid(occupancy=8)
    g_pal = dataclasses.replace(g_xla, use_pallas=True, pallas_block_rows=8)

    runs = {}
    for name, g in (("xla", g_xla), ("pallas", g_pal)):
        s = solver_for(g)
        b = world.boundary_dense(g)
        c = s.init_carry(world.initial_state(), b)
        c, d = jax.jit(s.simulate, static_argnums=2)(c, b, 5)
        runs[name] = (np.asarray(c.particles.positions),
                      np.asarray(c.particles.densities))

    px, rx = runs["xla"]
    pp_, rp = runs["pallas"]
    order = lambda a: a[np.lexsort(a.T)]
    np.testing.assert_allclose(order(px), order(pp_), rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.sort(rx), np.sort(rp), rtol=1e-4, atol=1e-2)
