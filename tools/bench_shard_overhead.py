"""Measure the shard_map wrapper overhead at n_shards=1 on the real chip.

Round-2 verdict item 3 (padded) / round-4 item 5 (plane): the
spatial-decomposition solvers were only ever run on the virtual CPU mesh;
their single-chip overhead vs the plain solvers was unmeasured. An
n_shards=1 shard_map run quantifies the wrapper cost (halo ppermutes
degenerate to self-copies/zeros, psum/pmax to no-ops) for free.

Usage: python tools/bench_shard_overhead.py [n_particles] [steps] [backend]
backend: padded (default) | plane (the flagship Pallas plane carry)
Prints one JSON line with both ms/step figures and the overhead ratio.
"""

import dataclasses
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
from bench import double_dam_break
from yasph2d_tpu.models.dfsph_dense import DFSPHPaddedSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.parallel.shard_dense import ShardedDFSPHPadded, make_space_mesh
from yasph2d_tpu.timemanager import AdaptiveTimeStep
from yasph2d_tpu.utils import compile_cache

compile_cache.enable()


def timed(run, chunk_fn, chunks):
    run()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(chunks):
        chunk_fn()
    return time.perf_counter() - t0


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    backend = sys.argv[3] if len(sys.argv) > 3 else "padded"
    chunk = 10
    chunks = max(1, steps // chunk)

    world = double_dam_break(target)
    if backend == "plane":
        import os

        from yasph2d_tpu.models.dfsph_plane import DFSPHPlaneSolver
        from yasph2d_tpu.parallel.shard_plane import ShardedDFSPHPlane

        # ny_multiple = n_shards * row_block keeps the sharded layout on the
        # SAME 8-row bands as the plain solver (make_local_plane_grid must
        # otherwise shrink the row block to divide the shard height — at the
        # 100k grid ny=325 that means br=5: 25% more bands and 5/8 sublane
        # utilization, which dominates the apparent "wrapper" overhead).
        # The padding rows sit at the global domain top, mask-dead.
        grid = dataclasses.replace(
            world.dense_grid(occupancy=7, ny_multiple=8),
            use_pallas_slotmajor=True, pallas_sm_row_block=8,
            pallas_pf_stat_chunk_lanes=128,
            pair_dtype=os.environ.get(
                "YASPH_BENCH_PAIR_DTYPE", "bfloat16"
            ),
        )
        plain_cls, shard_cls = DFSPHPlaneSolver, ShardedDFSPHPlane
    else:
        grid = dataclasses.replace(world.dense_grid(occupancy=7), row_block=16)
        plain_cls, shard_cls = DFSPHPaddedSolver, ShardedDFSPHPadded
    step_config = AdaptiveTimeStep(
        timestep_max=1 / 360, timestep_min=1 / 24000, cfl_factor=1.5
    )
    visc = XSPHViscosityModel(smoothing_length=world.properties.smoothing_length)
    boundary = world.boundary_dense(grid)
    state = world.initial_state()
    n = world.num_dynamic_particles

    # --- plain solver
    plain = plain_cls(
        viscosity_model=visc, properties=world.properties, grid=grid,
        step_config=step_config,
    )
    p_boundary = (
        plain.boundary_planes(boundary) if backend == "plane" else boundary
    )
    carry = jax.jit(plain.init_carry)(state, boundary)
    simulate = jax.jit(plain.simulate, static_argnums=2)
    box = {"c": carry}

    def plain_chunk():
        box["c"], _ = simulate(box["c"], p_boundary, chunk)
        _ = float(box["c"].time.total_simulated_time)

    t_plain = timed(plain_chunk, plain_chunk, chunks)

    # --- n_shards=1 shard_map wrapper
    mesh = make_space_mesh(jax.devices()[:1])
    sharded = shard_cls(
        viscosity_model=visc, properties=world.properties, full_grid=grid,
        step_config=step_config, mesh=mesh,
    )
    s_carry, s_boundary = sharded.init(state, boundary)
    sbox = {"c": s_carry}

    def shard_chunk():
        sbox["c"], _ = sharded.simulate(sbox["c"], s_boundary, chunk)
        _ = float(sbox["c"].time.total_simulated_time)

    t_shard = timed(shard_chunk, shard_chunk, chunks)

    ms_plain = t_plain / (chunks * chunk) * 1e3
    ms_shard = t_shard / (chunks * chunk) * 1e3
    print(json.dumps({
        "backend": backend,
        "particles": n,
        "steps": chunks * chunk,
        "ms_per_step_plain": ms_plain,
        "ms_per_step_shardmap_n1": ms_shard,
        "wrapper_overhead": ms_shard / ms_plain - 1.0,
    }))


if __name__ == "__main__":
    main()
