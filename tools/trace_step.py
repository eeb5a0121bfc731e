"""Capture a device trace of the dense DFSPH step and print an op-time summary.

Parses the xplane proto produced by jax.profiler directly (pure-python protobuf
to dodge the descriptor-version conflict in tensorboard_plugin_profile).

Usage: python tools/trace_step.py [n_particles] [backend]
backend: padded (default) | dense (sorted-carry) | plane (plane-resident
slot-major Pallas carry; implies use_pallas_slotmajor)
"""

import os

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import collections
import dataclasses
import glob
import sys

import jax

sys.path.insert(0, ".")
from bench import double_dam_break
from yasph2d_tpu.models.dfsph_dense import DFSPHDenseSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep
from yasph2d_tpu.utils import compile_cache

compile_cache.enable()

TRACE_DIR = "/tmp/yasph_trace"


def main():
    # fresh capture dir: stale sessions from earlier runs would otherwise be
    # globbed into the summary and pollute the per-op totals
    import shutil

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    backend = sys.argv[2] if len(sys.argv) > 2 else "padded"
    world = double_dam_break(target)
    grid = dataclasses.replace(
        world.dense_grid(occupancy=7), row_block=8,
        use_pallas_slotmajor=(
            os.environ.get("YASPH_BENCH_SLOTMAJOR") == "1" or backend == "plane"
        ),
        pallas_sm_row_block=int(os.environ.get("YASPH_BENCH_SM_ROW_BLOCK", 8)),
        pallas_pf_chunk_lanes=(
            int(os.environ["YASPH_BENCH_PF_CHUNK"])
            if os.environ.get("YASPH_BENCH_PF_CHUNK") else None
        ),
        pallas_pf_stat_chunk_lanes=int(
            os.environ.get("YASPH_BENCH_PF_STAT_CHUNK", -1)
        ),
        pallas_pf_rebucket_chunk_lanes=int(
            os.environ.get("YASPH_BENCH_PF_REBUCKET_CHUNK", -1)
        ),
        pair_dtype=os.environ.get("YASPH_BENCH_PAIR_DTYPE", "float32"),
    )
    from yasph2d_tpu.models.dfsph_dense import DFSPHPaddedSolver

    if backend == "plane":
        from yasph2d_tpu.models.dfsph_plane import DFSPHPlaneSolver as cls
    else:
        cls = DFSPHPaddedSolver if backend == "padded" else DFSPHDenseSolver
    solver = cls(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties, grid=grid,
        step_config=AdaptiveTimeStep(
            timestep_max=1 / 360, timestep_min=1 / 24000, cfl_factor=1.5
        ),
    )
    boundary = world.boundary_dense(grid)
    if backend == "plane":
        boundary = solver.boundary_planes(boundary)
    carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    simulate = jax.jit(solver.simulate, static_argnums=2)
    settle = int(os.environ.get("YASPH_TRACE_SETTLE", 50))
    traced = int(os.environ.get("YASPH_TRACE_STEPS", 10))
    carry, _ = simulate(carry, boundary, settle)  # settle + compile
    _ = float(carry.time.total_simulated_time)

    with jax.profiler.trace(TRACE_DIR):
        carry, _ = simulate(carry, boundary, traced)
        _ = float(carry.time.total_simulated_time)

    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True))
    print("trace files:", paths, file=sys.stderr)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # pure-python parse

    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        spaces.append(xs)

    # Sum durations per HLO-op category on device lines.
    totals = collections.Counter()
    for xs in spaces:
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Steps" not in line.name \
                        and line.name != "XLA Modules" and "op" not in line.name.lower():
                    pass
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    totals[(plane.name, line.name, name)] += ev.duration_ps
    by_line = collections.Counter()
    for (plane, line, name), ps in totals.items():
        by_line[(plane, line)] += ps
    print("\n=== planes/lines ===")
    for (plane, line), ps in by_line.most_common(10):
        print(f"{plane} | {line}: {ps / 1e9:.3f} ms total")

    # top ops on the busiest device line
    if by_line:
        busiest = max(
            ((k, v) for k, v in by_line.items() if "op" in k[1].lower() or True),
            key=lambda kv: kv[1],
        )[0]
        print(f"\n=== top ops on {busiest} ===")
        sub = collections.Counter(
            {name: ps for (plane, line, name), ps in totals.items()
             if (plane, line) == busiest}
        )
        grand = sum(sub.values())
        for name, ps in sub.most_common(40):
            print(
                f"{ps / 1e9 / traced:9.3f} ms/step {ps / grand * 100:5.1f}%  "
                f"{name[:110]}"
            )


if __name__ == "__main__":
    main()
