"""Dense-backend variant sweep on the current device (occupancy, trace capture).

Prints one JSON line per variant. Kept separate from bench.py (whose contract is a
single JSON line for the driver).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from yasph2d_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import double_dam_break  # noqa: E402
from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver  # noqa: E402
from yasph2d_tpu.models.viscosity import XSPHViscosityModel  # noqa: E402
from yasph2d_tpu.timemanager import AdaptiveTimeStep  # noqa: E402


def log(msg):
    print(f"[variants] {msg}", file=sys.stderr, flush=True)


def run_variant(world, occupancy, steps=100, trace_dir=None):
    grid = world.dense_grid(occupancy=occupancy)
    solver = DFSPHDenseSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties,
        grid=grid,
        step_config=AdaptiveTimeStep(1 / 360, 1 / 24000, 1.5),
    )
    boundary = world.boundary_dense(grid)

    t0 = time.perf_counter()
    carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    _ = float(carry.particles.densities[0])
    log(f"occ={occupancy}: init {time.perf_counter() - t0:.0f}s "
        f"(grid {grid.nx}x{grid.ny})")

    chunk = 10
    simulate = jax.jit(solver.simulate, static_argnums=2)
    t0 = time.perf_counter()
    carry, _ = simulate(carry, boundary, chunk)
    _ = float(carry.time.total_simulated_time)
    log(f"occ={occupancy}: compile+{chunk} steps {time.perf_counter() - t0:.0f}s")

    n = int(carry.particles.positions.shape[0])
    num_chunks = max(1, steps // chunk)
    t0 = time.perf_counter()
    for _ in range(num_chunks):
        carry, diag = simulate(carry, boundary, chunk)
    _ = float(carry.time.total_simulated_time)
    elapsed = time.perf_counter() - t0
    drops = int(diag.neighbor_drops)
    assert bool(np.isfinite(np.asarray(carry.particles.positions)).all())
    print(json.dumps({
        "variant": f"dense occ={occupancy}",
        "ms_per_step": elapsed / (num_chunks * chunk) * 1e3,
        "particle_steps_per_sec": n * num_chunks * chunk / elapsed,
        "neighbor_drops": drops,
    }), flush=True)

    if trace_dir:
        try:
            jax.profiler.start_trace(trace_dir)
            carry, _ = simulate(carry, boundary, chunk)
            _ = float(carry.time.total_simulated_time)
            jax.profiler.stop_trace()
            print(json.dumps({"trace": trace_dir}), flush=True)
        except Exception as e:  # noqa: BLE001 - trace support is best-effort here
            log(f"trace failed: {type(e).__name__}: {e}")


def main():
    target = int(os.environ.get("YASPH_BENCH_PARTICLES", 100_000))
    world = double_dam_break(target)
    log(f"scene: {world.num_dynamic_particles} fluid / "
        f"{world.num_boundary_particles} boundary")
    run_variant(world, occupancy=12, trace_dir=os.environ.get("YASPH_TRACE_DIR"))
    run_variant(world, occupancy=8)


if __name__ == "__main__":
    main()
