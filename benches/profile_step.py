"""Stage-by-stage DFSPH step profiling on the current backend.

Times each pipeline stage as its own jitted function (sort+tables, densities, pair
cache+alpha, viscosity forces, one density-loop iteration, one divergence-loop
iteration) with forced host syncs, then the fused whole step for comparison. Run on
the TPU to find the hot stage; `--trace DIR` additionally captures an xprof trace of
the fused step.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from yasph2d_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()


def _sync(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def _time(label, fn, *args, repeats=10):
    t0 = time.perf_counter()
    out = fn(*args)  # compile
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _sync(out)
    per = (time.perf_counter() - t0) / repeats
    print(json.dumps({"stage": label, "ms": per * 1e3, "compile_s": compile_s}), flush=True)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--particles", type=int, default=100_000)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--backend", default="table", choices=["table", "dense"])
    parser.add_argument("--pallas", action="store_true")
    parser.add_argument("--trace", default=None, help="xprof trace output dir")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from bench import double_dam_break

    if args.backend == "dense":
        return profile_dense(args)
    from yasph2d_tpu.models.dfsph import DFSPHSolver
    from yasph2d_tpu.models.viscosity import XSPHViscosityModel
    from yasph2d_tpu.timemanager import AdaptiveTimeStep
    from yasph2d_tpu.world import update_densities, update_neighborhood
    from yasph2d_tpu.ops import pair

    world = double_dam_break(args.particles)
    solver = DFSPHSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=world.grid,
        step_config=AdaptiveTimeStep(1 / 360, 1 / 24000, 1.5),
    )
    boundary = world.boundary_grid()
    carry = _time("init_carry", jax.jit(solver.init_carry), world.initial_state(), boundary)
    positions = carry.particles.positions
    neighborhood = carry.neighborhood
    m = solver.properties.particle_mass

    # stage: neighborhood rebuild (sort + permute + both tables)
    @jax.jit
    def stage_rebuild(state):
        return update_neighborhood(state, state.positions, boundary, solver.grid)

    _time("rebuild(sort+tables)", stage_rebuild, carry.particles)

    # stage: density summation
    @jax.jit
    def stage_density(p, nbr):
        return update_densities(p, nbr, boundary.positions, solver.kernel, m,
                                solver.properties.fluid_density)

    _time("update_densities", stage_density, positions, neighborhood)

    # stage: pair cache + alpha
    @jax.jit
    def stage_cache_alpha(p, nbr):
        cache = solver._pair_cache(p, nbr, boundary.positions)
        return solver._alpha_from_tables(p, boundary.positions, nbr, cache)

    _time("pair_cache+alpha", stage_cache_alpha, positions, neighborhood)

    # stage: viscosity + gravity forces
    @jax.jit
    def stage_forces(p, v, rho, nbr):
        dyn = nbr.dynamic
        pos_j = pair.gather(p, dyn.idx)
        vel_j = pair.gather(v, dyn.idx)
        rho_j = pair.gather(rho, dyn.idx)
        _, r_sq, r = pair.pair_geometry(p, pos_j)
        visc = solver.viscosity_model.compute_viscous_acceleration(
            jnp.float32(1e-3), r_sq, r, m, rho_j, vel_j - v[:, None, :]
        )
        return pair.masked_sum(visc, dyn.mask)

    _time("viscosity_forces", stage_forces, positions, carry.particles.velocities,
          carry.particles.densities, neighborhood)

    # stage: one density-loop iteration (divergence + correction)
    @jax.jit
    def stage_loop_iter(p, v, rho, alpha, nbr):
        cache = solver._pair_cache(p, nbr, boundary.positions)
        delta = solver._velocity_divergence(v, nbr, cache)
        err = jnp.maximum(rho + delta * m * 1e-3, 100.0) - 100.0
        ki = err * alpha
        return v - 1000.0 * m * solver._k_correction(ki, nbr, cache)

    _time("pressure_loop_iter(incl cache)", stage_loop_iter, positions,
          carry.particles.velocities, carry.particles.densities, carry.alpha,
          neighborhood)

    # fused whole step
    @jax.jit
    def whole(c):
        c = c._replace(time=c.time.account_step())
        return solver.step(c, boundary)

    out = _time("whole_step", whole, carry)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        out = whole(carry)
        _sync(out)
        jax.profiler.stop_trace()
        print(json.dumps({"trace": args.trace}))


def profile_dense(args):
    """Stage timings for the dense backend."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import double_dam_break
    from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver
    from yasph2d_tpu.models.viscosity import XSPHViscosityModel
    from yasph2d_tpu.timemanager import AdaptiveTimeStep

    world = double_dam_break(args.particles)
    grid = world.dense_grid(occupancy=8)
    if args.pallas:
        grid = dataclasses.replace(grid, use_pallas=True)
    solver = DFSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=grid,
        step_config=AdaptiveTimeStep(1 / 360, 1 / 24000, 1.5),
    )
    boundary = world.boundary_dense(grid)
    carry = _time("init_carry", jax.jit(solver.init_carry),
                  world.initial_state(), boundary)
    parts = carry.particles

    @jax.jit
    def stage_sort(state):
        return solver._sort((state,), state.positions)

    (sorted_state,), sorted_keys = _time("sort+permute", stage_sort, parts)

    @jax.jit
    def stage_ctx(pos, keys):
        return solver._ctx(pos, keys, boundary)

    ctx = _time("ctx(slots+2 pair passes)", stage_ctx,
                sorted_state.positions, sorted_keys)

    from yasph2d_tpu.ops.dense_grid import pad_to_slots

    v_pad = pad_to_slots(parts.velocities, ctx.slots, grid)
    k_pad = carry.kappa_pad

    @jax.jit
    def stage_div(v):
        return solver._velocity_divergence(ctx, v)

    _time("velocity_divergence", stage_div, v_pad)

    @jax.jit
    def stage_corr(k):
        return solver._k_correction(ctx, k)

    _time("k_correction", stage_corr, k_pad)

    @jax.jit
    def whole(c):
        c = c._replace(time=c.time.account_step())
        return solver.step(c, boundary)

    out = _time("whole_step", whole, carry)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        out = whole(carry)
        _sync(out)
        jax.profiler.stop_trace()
        print(json.dumps({"trace": args.trace}))


if __name__ == "__main__":
    main()
