"""Isolated pf_rebucket timing at the 1M bench shape across chunk widths.

Isolated-jit numbers on the axon tunnel carry dispatch overhead (PERF.md:
trust whole-step bench / traces for absolutes); this probe is for RELATIVE
comparison of chunk widths on the identical input, with enough reps that the
per-call overhead amortizes. Final numbers of record come from bench.py with
YASPH_BENCH_PF_REBUCKET_CHUNK set.

Usage: python tools/bench_rebucket.py [n_particles] [settle_steps]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import double_dam_break
from yasph2d_tpu.models.dfsph_plane import DFSPHPlaneSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep
from yasph2d_tpu.utils import compile_cache
from yasph2d_tpu.ops.pallas_slotmajor import pf_rebucket

compile_cache.enable()


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    settle = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    world = double_dam_break(target)
    grid = dataclasses.replace(
        world.dense_grid(occupancy=7), use_pallas_slotmajor=True,
        pallas_sm_row_block=8,
    )
    solver = DFSPHPlaneSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties, grid=grid,
        step_config=AdaptiveTimeStep(
            timestep_max=1 / 360, timestep_min=1 / 24000, cfl_factor=1.5
        ),
    )
    boundary = world.boundary_dense(grid)
    bpl = solver.boundary_planes(boundary)
    carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    carry, _ = jax.jit(solver.simulate, static_argnums=2)(carry, bpl, settle)
    _ = float(carry.time.total_simulated_time)

    ctx = carry.ctx
    # a realistic advected position set (one viscosity/gravity + dt move)
    dt = carry.time.dt
    pos = ctx.pos + carry.v * dt
    extra = jnp.concatenate(
        [carry.v, carry.kappa[None], carry.stiff[None]], axis=0
    )

    for width in [None, 512, 256, 128]:
        f = jax.jit(
            lambda pos, mask, extra, width=width: pf_rebucket(
                pos, mask, extra, grid, br=grid.pallas_sm_row_block,
                chunk_lanes=width,
            )
        )
        out = f(pos, ctx.mask, extra)
        # block_until_ready does not reliably block on the axon platform;
        # a scalar host transfer forces completion (see bench.py)
        n_live = float(jnp.sum(out[1]))
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(pos, ctx.mask, extra)
        _ = float(out[3])
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"chunk {str(width):>5}: {ms:7.3f} ms/call  "
              f"(live {n_live:.0f}, dropped {int(out[3])})", flush=True)


if __name__ == "__main__":
    main()
