"""Whole-step benchmark: DFSPH particle-steps/sec on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scene: 100k-particle double dam-break with a static obstacle (BASELINE.json config 4).
The reference publishes no numbers (BASELINE.md), so `vs_baseline` is reported against
the BASELINE.json north-star target of 1e9 particle-steps/sec (value / 1e9).

Env knobs: YASPH_BENCH_PARTICLES (approx fluid count, default 100_000),
YASPH_BENCH_STEPS (timed steps, default 100).
"""

import json
import os
import sys
import time

import jax
import numpy as np

from yasph2d_tpu.utils import compile_cache

compile_cache.enable()


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

from yasph2d_tpu.models.dfsph import DFSPHSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep
from yasph2d_tpu.world import FluidParticleWorld

NORTH_STAR_PARTICLE_STEPS_PER_SEC = 1.0e9


def double_dam_break(target_particles: int) -> FluidParticleWorld:
    """Two fluid columns in a 4m x 2.5m tank with a box obstacle between them."""
    # Two rects of 0.8 x 1.2 m^2; derated lattice density 0.81 * d fills ~target.
    area = 2 * 0.8 * 1.2
    particle_density = target_particles / (area * 0.81)
    world = FluidParticleWorld(2.0, particle_density, 100.0)

    world.add_fluid_rect((0.1, 0.05, 0.8, 1.2), 0.05)
    world.add_fluid_rect((3.1, 0.05, 0.8, 1.2), 0.05)

    # tank (thick lines extend to the LEFT of start->end; order walls to grow outward)
    world.add_boundary_thick_line((0.0, 0.0), (4.0, 0.0), 3)
    world.add_boundary_thick_line((0.0, 2.5), (0.0, 0.0), 3)
    world.add_boundary_thick_line((4.0, 0.0), (4.0, 2.5), 3)
    world.add_boundary_thick_line((4.0, 2.5), (0.0, 2.5), 3)
    # box obstacle between the columns
    world.add_boundary_thick_line((1.7, 0.0), (1.7, 0.45), 2)
    world.add_boundary_thick_line((1.7, 0.45), (2.3, 0.45), 2)
    world.add_boundary_thick_line((2.3, 0.45), (2.3, 0.0), 2)
    return world


def main():
    target = int(os.environ.get("YASPH_BENCH_PARTICLES", 100_000))
    num_steps = int(os.environ.get("YASPH_BENCH_STEPS", 100))
    backend = os.environ.get("YASPH_BENCH_BACKEND", "dense")  # dense | table

    world = double_dam_break(target)
    step_config = AdaptiveTimeStep(
        timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0, cfl_factor=1.5
    )
    viscosity = XSPHViscosityModel(
        smoothing_length=world.properties.smoothing_length
    )
    if backend == "dense":
        from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver

        import dataclasses

        # occupancy 7 measured fastest with zero drops on this scene (see PERF.md);
        # row_block 16 gives fine-grained empty-block skipping
        grid = world.dense_grid(
            occupancy=int(os.environ.get("YASPH_BENCH_OCCUPANCY", 7))
        )
        if os.environ.get("YASPH_BENCH_PALLAS") == "1":
            grid = dataclasses.replace(grid, use_pallas=True)
        grid = dataclasses.replace(
            grid, row_block=int(os.environ.get("YASPH_BENCH_ROW_BLOCK", 16))
        )
        solver = DFSPHDenseSolver(
            viscosity_model=viscosity, properties=world.properties,
            grid=grid, step_config=step_config,
        )
        boundary = world.boundary_dense(grid)
        _log(f"dense grid: {grid.nx}x{grid.ny} cells, occupancy {grid.occupancy}")
    else:
        solver = DFSPHSolver(
            viscosity_model=viscosity, properties=world.properties,
            grid=world.grid, step_config=step_config,
        )
        boundary = world.boundary_grid()
    _log(f"scene: {world.num_dynamic_particles} fluid / "
         f"{world.num_boundary_particles} boundary particles")

    t0 = time.perf_counter()
    carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    _ = float(carry.particles.densities[0])
    _log(f"init_carry: {time.perf_counter() - t0:.1f}s")
    n = int(carry.particles.positions.shape[0])

    # Compile ONE chunk size and reuse it for warm-up and timing (the remote-compile
    # path can be slow; avoid a second compile for a different static step count).
    chunk = 10
    simulate = jax.jit(solver.simulate, static_argnums=2)
    t0 = time.perf_counter()
    carry, _ = simulate(carry, boundary, chunk)
    _ = float(carry.time.total_simulated_time)
    _log(f"compile + first {chunk} steps: {time.perf_counter() - t0:.1f}s")

    num_chunks = max(1, num_steps // chunk)
    t0 = time.perf_counter()
    for _ in range(num_chunks):
        carry, diag = simulate(carry, boundary, chunk)
    # block_until_ready does not reliably block on the experimental remote platform;
    # a host transfer of a scalar from the final carry forces full completion.
    _ = float(carry.time.total_simulated_time)
    elapsed = time.perf_counter() - t0
    num_steps = num_chunks * chunk
    _log(f"{num_steps} steps in {elapsed:.2f}s "
         f"({elapsed / num_steps * 1e3:.2f} ms/step)")

    assert bool(np.isfinite(np.asarray(carry.particles.positions)).all())
    drops = int(diag.neighbor_drops)
    _log(f"neighbor drops (last step): {drops}")
    if drops:
        _log("WARNING: occupancy overflow — physics degraded; raise occupancy")
    value = n * num_steps / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"DFSPH particle-steps/sec ({n} particles, double dam-break, "
                    f"{backend} backend)"
                ),
                "value": value,
                "unit": "particle-steps/sec",
                "vs_baseline": value / NORTH_STAR_PARTICLE_STEPS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
