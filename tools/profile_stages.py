"""Stage-level timing of the dense DFSPH step on the real device.

Times each stage of the step in ISOLATION under its own jit (see PERF.md for why
isolated stage numbers can mislead on fusion boundaries — this is a budget map,
not a promise), plus whole-step variants with the pressure loops pinned to zero
iterations to get fused loop costs by subtraction.

Usage: python tools/profile_stages.py [n_particles]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import double_dam_break
from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.ops import dense_grid as dg
from yasph2d_tpu.timemanager import AdaptiveTimeStep
from yasph2d_tpu.utils import compile_cache

compile_cache.enable()


def timeit(name, fn, *args, reps=20):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    # force full completion on the remote platform via a host transfer
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:50s} {dt:8.2f} ms")
    return dt


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    world = double_dam_break(target)
    grid = world.dense_grid(occupancy=7)
    grid = dataclasses.replace(grid, row_block=16)
    step_config = AdaptiveTimeStep(
        timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0, cfl_factor=1.5
    )
    solver = DFSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=grid,
        step_config=step_config,
    )
    boundary = world.boundary_dense(grid)
    state = world.initial_state()
    carry = jax.jit(solver.init_carry)(state, boundary)
    # settle 50 steps so occupancy patterns are realistic
    simulate = jax.jit(solver.simulate, static_argnums=2)
    carry, _ = simulate(carry, boundary, 50)
    _ = float(carry.time.total_simulated_time)
    print(f"scene: {world.num_dynamic_particles} fluid, grid {grid.nx}x{grid.ny}, "
          f"P={grid.occupancy}, rb={grid.row_block}")

    positions = carry.particles.positions
    velocities = carry.particles.velocities
    alive = carry.particles.alive
    ctx = carry.ctx
    g = solver.grid
    m = float(solver.properties.particle_mass)

    # --- stages
    def sort_stage(pos, vel, al):
        return dg.sort_by_dense_keys((pos, vel, al, vel, vel), pos, g, al)

    timeit("sort (5-array tree)", sort_stage, positions, velocities, alive)

    keys = dg.cell_keys(positions, g, alive)
    skeys = jax.jit(lambda k: jax.lax.sort(k))(keys)

    timeit("build_slot_grid", lambda k: dg.build_slot_grid(k, g), skeys)

    slots = jax.jit(lambda k: dg.build_slot_grid(k, g))(skeys)
    timeit("pad_to_slots (pos)", lambda v: dg.pad_to_slots(v, slots, g), positions)
    timeit("slots_to_sorted", lambda p: dg.slots_to_sorted(p, slots, g),
           ctx.densities_pad)

    timeit("ctx build (2 pair passes + slots)",
           lambda p, k: solver._ctx(p, k, boundary), positions, skeys)

    v_pad = jax.jit(lambda v: dg.pad_to_slots(v, ctx.slots, g))(velocities)

    kern = solver.kernel

    def density_pass(pos_pad, mask):
        def terms(ri, r_sq, r):
            mg = kern.gradient(ri, r_sq, r) * m
            return {"w": kern.evaluate(r_sq, r), "vec": mg,
                    "sq": jnp.sum(mg * mg, axis=-1), "count": jnp.ones_like(r_sq)}
        return dg.pair_reduce(terms, pos_pad, mask, pos_pad, mask, g)

    timeit("ctx dyn pass alone (4 outputs)", density_pass, ctx.pos_pad, ctx.mask)

    def boundary_pass(pos_pad, mask):
        def terms(ri, r_sq, r):
            mg = kern.gradient(ri, r_sq, r) * m
            return {"w": kern.evaluate(r_sq, r), "vec": mg,
                    "sq": jnp.sum(mg * mg, axis=-1), "count": jnp.ones_like(r_sq)}
        return dg.pair_reduce(terms, pos_pad, mask, boundary.pos_pad, boundary.mask, g)

    timeit("ctx boundary pass alone", boundary_pass, ctx.pos_pad, ctx.mask)

    timeit("divergence pass", lambda v: solver._velocity_divergence(ctx, v), v_pad)
    timeit("k_correction pass", lambda k: solver._k_correction(ctx, k),
           ctx.alpha_pad)

    def visc_pass(v):
        def visc(ri, r_sq, r, dt_s, v_i, v_j, rho_j):
            return solver.viscosity_model.compute_viscous_acceleration(
                dt_s, r_sq, r, m, rho_j, v_j - v_i)
        return dg.pair_reduce(visc, ctx.pos_pad, ctx.mask, ctx.pos_pad, ctx.mask, g,
                              source_values=(v, ctx.densities_pad),
                              query_values=(v,), scalar_args=(carry.time.dt,))

    timeit("viscosity pass", visc_pass, v_pad)

    # --- whole step and loop-free step
    def whole(c):
        return solver.step(c, boundary)
    t_full = timeit("WHOLE STEP", whole, carry, reps=10)

    noloop = dataclasses.replace(
        solver, max_density_iterations=0, max_divergence_iterations=0,
        max_avg_density_error=1e9, max_divergence_error=1e9)
    t_min = timeit("step w/ loops at 1 iteration (tol=inf)",
                   lambda c: noloop.step(c, boundary), carry, reps=10)
    print(f"loop surplus (full - minimal): {t_full - t_min:8.2f} ms")


if __name__ == "__main__":
    main()
