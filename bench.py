"""Whole-step benchmark: DFSPH particle-steps/sec on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
`value` is the 1M-particle result (the size the BASELINE.json north star of 1e9
particle-steps/sec is defined at); `extra.sizes` carries
the full BASELINE.md matrix — particle-steps/sec at 10k / 100k / 1M plus the DFSPH
iterations-to-tolerance (mean density / divergence loop iterations per step) and
the across-ALL-steps neighbor-drop count (must be 0; physics is degraded otherwise).

Scene: double dam-break with a static obstacle, scaled to each target size.
The reference publishes no numbers (BASELINE.md), so `vs_baseline` is reported
against the BASELINE.json north-star target of 1e9 particle-steps/sec (value/1e9).

Env knobs:
  YASPH_BENCH_SIZES      comma list of approx fluid counts (default 10000,100000,1000000)
  YASPH_BENCH_STEPS      timed steps per size (default 100)
  YASPH_BENCH_BACKEND    plane | padded | dense | table (default plane =
                         plane-resident slot-major Pallas carry, measured best
                         at every size — PERF.md round 3; see
                         models/dfsph_plane.py)
  YASPH_BENCH_OCCUPANCY  dense slot occupancy (default 7, see PERF.md)
  YASPH_BENCH_ROW_BLOCK  dense pair-pass row block (default size-based, PERF.md)
  YASPH_BENCH_PAIR_DTYPE float32 | bfloat16 (default per PERF.md measurements)
  YASPH_BENCH_PALLAS     1 = run pair passes through the (retired) gen-1 Pallas kernel
  YASPH_BENCH_SLOTMAJOR  run fluid-fluid pair passes through the slot-major
                         Pallas kernel (ops/pallas_slotmajor.py); DEFAULT ON
                         (measured best, PERF.md round 3), 0 = XLA pair passes
  YASPH_BENCH_SM_ROW_BLOCK  slot-major band height (default 8)
  YASPH_BENCH_PF_CHUNK   pf-kernel adaptive-bound chunk width in lanes
                         (unset = full-width bands; 128 = finest skipping)
  YASPH_BENCH_PF_STAT_CHUNK  chunk width for the fluid-BOUNDARY passes only
                         (interior chunks hold no boundary sources and are
                         skipped outright; default 128 = measured optimum,
                         -1 = inherit PF_CHUNK)
  YASPH_BENCH_PF_REBUCKET_CHUNK  chunk width for the plane re-bucket only
                         (per-view slot bounds pay at fine chunks; -1 =
                         inherit PF_CHUNK)
  YASPH_BENCH_PF_UNROLL  "auto" (default: unroll slot loops below
                         SMALL_GRID_SLOTS), "0" = always bounded fori,
                         "1" = always unrolled
  YASPH_BENCH_REBUILD_EVERY  k-step neighbor rebuild (default 1 = conformance;
                             k>1 is the opt-in Verlet-style mode, see PERF.md)
"""

import dataclasses
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


def _chunk_env(name: str, default):
    """Parse a pf chunk-width env var: unset/empty -> default; otherwise an
    int that must be -1 (inherit sentinel) or a positive multiple of 128
    (validated here rather than on a deep assert in _pf_chunks)."""
    raw = os.environ.get(name)
    if not raw:
        return default
    v = int(raw)
    assert v == -1 or (v > 0 and v % 128 == 0), (
        f"{name}={v}: must be -1 or a positive multiple of 128"
    )
    return v


from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.ops.dense_grid import SMALL_GRID_SLOTS
from yasph2d_tpu.timemanager import AdaptiveTimeStep
from yasph2d_tpu.world import FluidParticleWorld

NORTH_STAR_PARTICLE_STEPS_PER_SEC = 1.0e9
# bf16 operand planes measured faster at EVERY size on the plane backend
# (PERF.md round 4: 10k 2.65 vs 3.00 ms, 100k 9.98 vs 10.68, 1M 47.30 vs
# 50.33; WCSPH 1M 27.88 vs 28.76) with zero drops and identical iteration
# counts. Kernel math/accumulation stay f32 (only storage/traffic rounds).
# The library conformance default remains float32 (DenseGridConfig).
DEFAULT_PAIR_DTYPE = "bfloat16"


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


def bench_one(target: int, num_steps: int, backend: str,
              model: str = "dfsph") -> dict:
    world = double_dam_break(target)
    step_config = AdaptiveTimeStep(
        timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0,
        # WCSPH needs the reference's tighter CFL (main.rs:115-118)
        cfl_factor=0.2 if model == "wcsph" else 1.5,
    )
    viscosity = XSPHViscosityModel(
        smoothing_length=world.properties.smoothing_length
    )
    if backend in ("dense", "padded", "plane"):
        from yasph2d_tpu.models.dfsph_dense import (
            DFSPHDenseSolver,
            DFSPHPaddedSolver,
        )

        # occupancy 7 measured fastest with zero drops on this scene (see PERF.md)
        grid = world.dense_grid(
            occupancy=int(os.environ.get("YASPH_BENCH_OCCUPANCY", 7))
        )
        # row_block optimum is size-dependent (PERF.md round-3 sweep): 8 at the
        # 1M grid (finer empty-band skipping), 16 at 100k, auto-unbanded under
        # 300k slots regardless (ops/dense_grid.SMALL_GRID_SLOTS)
        rb_default = 8 if grid.num_cells * grid.occupancy > 4_000_000 else 16
        cb = os.environ.get("YASPH_BENCH_COL_BLOCK")
        grid = dataclasses.replace(
            grid,
            col_block=int(cb) if cb else None,
            row_block=int(os.environ.get("YASPH_BENCH_ROW_BLOCK", rb_default)),
            use_pallas=os.environ.get("YASPH_BENCH_PALLAS") == "1",
            # slot-major Pallas pair passes: measured best at banded sizes
            # (PERF.md round 3: 16.0 ms at 100k / 112.7 ms at 1M vs 19.6/129.1
            # XLA, exact f32, zero drops) — default ON there; small grids
            # (<SMALL_GRID_SLOTS) keep the measured-faster unbanded XLA path.
            # YASPH_BENCH_SLOTMAJOR=0/1 overrides either way.
            use_pallas_slotmajor=(
                os.environ.get(
                    "YASPH_BENCH_SLOTMAJOR",
                    "1" if grid.num_cells * grid.occupancy >= SMALL_GRID_SLOTS
                    else "0",
                ) == "1"
                or backend == "plane"
            ),
            pallas_sm_row_block=int(os.environ.get("YASPH_BENCH_SM_ROW_BLOCK", 8)),
            # pf kernels' adaptive-bound chunk width: unset/empty = full-width
            # bands (per-band slot bounds); "128" etc. = finer dead-chunk skip
            pallas_pf_chunk_lanes=_chunk_env("YASPH_BENCH_PF_CHUNK", None),
            # boundary-pass-specific chunk width (interior columns hold no
            # boundary sources -> finer chunks skip them outright). 128 is the
            # measured optimum at 1M (45.64 vs 47.25 ms full-width; 256/512 in
            # between — PERF.md round-4 sweep) and default; "-1" inherits
            # PF_CHUNK (full-width bands when that is unset).
            pallas_pf_stat_chunk_lanes=_chunk_env(
                "YASPH_BENCH_PF_STAT_CHUNK", 128
            ),
            # re-bucket-specific chunk width: pf_rebucket's per-VIEW slot
            # bounds only pay at fine chunks (most of the eight mover views
            # are empty per 128-lane window); -1 inherits PF_CHUNK
            pallas_pf_rebucket_chunk_lanes=_chunk_env(
                "YASPH_BENCH_PF_REBUCKET_CHUNK", -1
            ),
            # slot-loop unrolling: "auto" (default) unrolls below
            # SMALL_GRID_SLOTS (the 10k-scene ILP fix); "0"/"1" force
            pallas_pf_unroll={
                "auto": "auto", "0": False, "1": True,
            }[os.environ.get("YASPH_BENCH_PF_UNROLL", "auto")],
            pair_dtype=os.environ.get("YASPH_BENCH_PAIR_DTYPE", DEFAULT_PAIR_DTYPE),
            pair_view_loop=os.environ.get("YASPH_BENCH_VIEW_LOOP") == "1",
        )
        solver_kwargs = dict(
            viscosity_model=viscosity, properties=world.properties,
            grid=grid, step_config=step_config,
            rebucket_row_block=(
                int(os.environ["YASPH_BENCH_REBUCKET_RB"])
                if os.environ.get("YASPH_BENCH_REBUCKET_RB") else None
            ),
        )
        if model == "wcsph":
            from yasph2d_tpu.models.wcsph_dense import WCSPHPaddedSolver
            from yasph2d_tpu.models.wcsph_plane import WCSPHPlaneSolver

            assert backend in ("padded", "plane"), "wcsph bench: padded|plane"
            cls = WCSPHPlaneSolver if backend == "plane" else WCSPHPaddedSolver
            solver = cls(**solver_kwargs)
        else:
            if backend == "plane":
                from yasph2d_tpu.models.dfsph_plane import (
                    DFSPHPlaneSolver as cls,
                )

                # kernel post-map fusion switches (PERF.md round-4 sweep)
                solver_kwargs.update(
                    fuse_loop_elementwise=(
                        os.environ.get("YASPH_BENCH_FUSE_LOOPS", "1") == "1"
                    ),
                    fuse_ctx_elementwise=(
                        os.environ.get("YASPH_BENCH_FUSE_CTX", "1") == "1"
                    ),
                )
            else:
                cls = (
                    DFSPHPaddedSolver if backend == "padded"
                    else DFSPHDenseSolver
                )
            solver = cls(
                rebuild_every=int(os.environ.get("YASPH_BENCH_REBUILD_EVERY", 1)),
                mxu_loop_gradients=os.environ.get("YASPH_BENCH_MXU") == "1",
                **solver_kwargs,
            )
        boundary = world.boundary_dense(grid)
        if backend == "plane":
            boundary = solver.boundary_planes(boundary)
        _log(f"dense grid: {grid.nx}x{grid.ny} cells, occupancy {grid.occupancy}, "
             f"pair_dtype {grid.pair_dtype}")
    else:
        from yasph2d_tpu.models.dfsph import DFSPHSolver

        solver = DFSPHSolver(
            viscosity_model=viscosity, properties=world.properties,
            grid=world.grid, step_config=step_config,
        )
        boundary = world.boundary_grid()
    _log(f"scene: {world.num_dynamic_particles} fluid / "
         f"{world.num_boundary_particles} boundary particles")

    t0 = time.perf_counter()
    carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    if hasattr(carry, "particles"):
        _ = float(carry.particles.densities[0])
    elif not hasattr(carry, "ctx"):  # WCSPH padded/plane carries
        _ = float(carry.dens.ravel()[0])
    elif hasattr(carry.ctx, "densities_pad"):
        _ = float(carry.ctx.densities_pad.ravel()[0])
    else:  # plane-resident carry
        _ = float(carry.ctx.densities.ravel()[0])
    _log(f"init_carry: {time.perf_counter() - t0:.1f}s")
    if hasattr(carry, "particles"):
        n = int(carry.particles.positions.shape[0])
    else:  # padded-resident carry: live slots
        mask = carry.ctx.mask if hasattr(carry, "ctx") else carry.mask
        n = int(np.asarray(mask).sum())

    # Compile ONE chunk size and reuse it for warm-up and timing (the remote-compile
    # path can be slow; avoid a second compile for a different static step count).
    chunk = 10
    # donate the carry: at 1M it holds ~300 MB of padded state that would
    # otherwise be copied on every chunk boundary
    simulate = jax.jit(solver.simulate, static_argnums=2, donate_argnums=0)
    t0 = time.perf_counter()
    carry, _ = simulate(carry, boundary, chunk)
    _ = float(carry.time.total_simulated_time)
    _log(f"compile + first {chunk} steps: {time.perf_counter() - t0:.1f}s")

    num_chunks = max(1, num_steps // chunk)
    diags = []
    t0 = time.perf_counter()
    for _ in range(num_chunks):
        carry, diag = simulate(carry, boundary, chunk)
        diags.append(diag)
    # block_until_ready does not reliably block on the experimental remote platform;
    # a host transfer of a scalar from the final carry forces full completion.
    _ = float(carry.time.total_simulated_time)
    elapsed = time.perf_counter() - t0
    num_steps = num_chunks * chunk
    _log(f"{num_steps} steps in {elapsed:.2f}s "
         f"({elapsed / num_steps * 1e3:.2f} ms/step)")

    if hasattr(carry, "particles"):
        final_positions = np.asarray(carry.particles.positions)
    else:  # padded-resident carry
        s = solver.export_state(carry)
        final_positions = np.asarray(s.positions)[np.asarray(s.alive)]
    assert bool(np.isfinite(final_positions).all())
    # Diagnostics aggregate across each chunk's steps (Diagnostics.accumulate):
    # drops are per-chunk maxima, iteration counts per-chunk sums.
    drops = max(int(d.neighbor_drops) for d in diags)
    _log(f"neighbor drops (max over ALL steps): {drops}")
    assert drops == 0, "occupancy overflow — physics degraded; raise occupancy"
    out = {
        "particles": n,
        "particle_steps_per_sec": n * num_steps / elapsed,
        "ms_per_step": elapsed / num_steps * 1e3,
        "neighbor_drops": drops,
    }
    if model != "wcsph":  # WCSPH has no pressure loops
        density_iters = sum(int(d.density_iterations) for d in diags) / num_steps
        divergence_iters = (
            sum(int(d.divergence_iterations) for d in diags) / num_steps
        )
        _log(f"iterations/step: density {density_iters:.2f}, "
             f"divergence {divergence_iters:.2f}")
        out["density_iterations_per_step"] = density_iters
        out["divergence_iterations_per_step"] = divergence_iters
    return out


def reference_dam_break(target_particles: int = 10_000):
    """The reference app's default dam-break scene (main.rs:177-196: fluid rect +
    tank + ramp), scaled to ~target fluid particles (BASELINE configs 1-3)."""
    area = 0.5 * 1.0
    particle_density = target_particles / (area * 0.81)
    world = FluidParticleWorld(2.0, particle_density, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 4)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 4)
    world.add_boundary_thick_line((0.0, 0.0), (0.0, 2.5), 4)
    world.add_boundary_thick_line((2.0, 0.0), (2.0, 2.5), 4)
    world.add_boundary_thick_line((0.0, 0.6), (1.75, 0.5), 2)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 2)
    world.add_boundary_thick_line((-2.0, -0.5), (4.0, -0.5), 4)
    return world


def bench_baseline_config(name: str, num_steps: int) -> dict:
    """BASELINE.json configs 1-3: WCSPH dam-break, DFSPH dam-break, and DFSPH
    high-viscosity (PhysicalViscosityModel mu=0.01, reference main.rs:95-96),
    all on the reference default scene at ~10k particles, run on the FLAGSHIP
    plane-resident backend (the bench default; YASPH_BENCH_CONFIG_BACKEND=padded
    selects the previous padded-XLA rows for comparison). These rows stay in
    exact f32 (grid default) — they are the conformance entries, unlike the
    size matrix which runs the measured-best pair_dtype."""
    from yasph2d_tpu.models.dfsph_dense import DFSPHPaddedSolver
    from yasph2d_tpu.models.dfsph_plane import DFSPHPlaneSolver
    from yasph2d_tpu.models.wcsph_dense import WCSPHPaddedSolver
    from yasph2d_tpu.models.wcsph_plane import WCSPHPlaneSolver
    from yasph2d_tpu.models.viscosity import PhysicalViscosityModel

    plane = os.environ.get("YASPH_BENCH_CONFIG_BACKEND", "plane") == "plane"
    world = reference_dam_break()
    h = world.properties.smoothing_length
    grid = world.dense_grid()  # auto occupancy
    if plane:
        grid = dataclasses.replace(
            grid, use_pallas_slotmajor=True,
            pallas_sm_row_block=int(
                os.environ.get("YASPH_BENCH_SM_ROW_BLOCK", 8)
            ),
        )
    boundary = world.boundary_dense(grid)
    is_wcsph = name == "wcsph_dam_break"
    step_config = AdaptiveTimeStep(
        timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0,
        cfl_factor=0.2 if is_wcsph else 1.5,  # main.rs:115-118
    )
    if name == "dfsph_high_viscosity":
        viscosity = PhysicalViscosityModel(
            smoothing_length=h, fluid_viscosity=0.01  # main.rs:95-96
        )
    else:
        viscosity = XSPHViscosityModel(smoothing_length=h)

    if is_wcsph:
        cls = WCSPHPlaneSolver if plane else WCSPHPaddedSolver
    else:
        cls = DFSPHPlaneSolver if plane else DFSPHPaddedSolver
    solver = cls(
        viscosity_model=viscosity, properties=world.properties,
        grid=grid, step_config=step_config,
    )
    if plane:
        boundary = solver.boundary_planes(boundary)
    if is_wcsph:
        carry = jax.jit(solver.init_carry)(world.initial_state())
    else:
        carry = jax.jit(solver.init_carry)(world.initial_state(), boundary)
    n = world.num_dynamic_particles
    _log(f"--- config {name}: {n} fluid / {world.num_boundary_particles} "
         f"boundary, occupancy {grid.occupancy}")

    simulate = jax.jit(solver.simulate, static_argnums=2, donate_argnums=0)
    chunk = 10
    carry, _ = simulate(carry, boundary, chunk)
    _ = float(carry.time.total_simulated_time)
    num_chunks = max(1, num_steps // chunk)
    diags = []
    t0 = time.perf_counter()
    for _ in range(num_chunks):
        carry, diag = simulate(carry, boundary, chunk)
        diags.append(diag)
    _ = float(carry.time.total_simulated_time)
    elapsed = time.perf_counter() - t0
    steps = num_chunks * chunk
    drops = max(int(d.neighbor_drops) for d in diags)
    assert drops == 0, f"{name}: neighbor drops"
    out = {
        "particles": n,
        "particle_steps_per_sec": n * steps / elapsed,
        "ms_per_step": elapsed / steps * 1e3,
        "neighbor_drops": drops,
    }
    if not is_wcsph:
        out["density_iterations_per_step"] = (
            sum(int(d.density_iterations) for d in diags) / steps
        )
        out["divergence_iterations_per_step"] = (
            sum(int(d.divergence_iterations) for d in diags) / steps
        )
    _log(f"--- config {name}: {out['ms_per_step']:.2f} ms/step")
    return out


def _retry(fn, what: str, attempts: int = 3):
    """The axon tunnel's remote-compile service intermittently drops
    connections mid-request (observed: 'response body closed before all
    bytes were read', multi-minute stalls that recover). One transient flake
    must not void the whole bench record — retry each section; compile
    caches make retries cheap."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — the tunnel raises internal RPC types
            if i == attempts - 1:
                raise
            _log(f"{what}: attempt {i + 1} failed ({type(e).__name__}: {e}); "
                 "retrying")
            time.sleep(20.0 * (i + 1))


def main():
    sizes = [
        int(s)
        for s in os.environ.get(
            "YASPH_BENCH_SIZES", "10000,100000,1000000"
        ).split(",")
    ]
    num_steps = int(os.environ.get("YASPH_BENCH_STEPS", 100))
    # plane = plane-resident slot-major carry, measured best at 10k/100k/1M
    # (PERF.md round 3: 2.38 / 13.9 / 82.0 ms/step)
    backend = os.environ.get("YASPH_BENCH_BACKEND", "plane")

    results = {}
    for target in sizes:
        _log(f"=== size {target} ===")
        results[str(target)] = _retry(
            lambda: bench_one(target, num_steps, backend), f"size {target}"
        )

    # WCSPH at scale on the flagship backend (round-3 verdict weak #3: WCSPH
    # was never benched above 10k). YASPH_BENCH_WCSPH=0 skips.
    wcsph_sizes = {}
    if os.environ.get("YASPH_BENCH_WCSPH", "1") != "0" and backend == "plane":
        for target in [
            int(s) for s in os.environ.get(
                "YASPH_BENCH_WCSPH_SIZES", "100000,1000000"
            ).split(",")
        ]:
            _log(f"=== WCSPH size {target} ===")
            wcsph_sizes[str(target)] = _retry(
                lambda: bench_one(target, num_steps, "plane", model="wcsph"),
                f"wcsph {target}",
            )

    # BASELINE.json configs 1-3 (config 4 is the 100k matrix entry above;
    # config 5 is the driver's multi-chip dryrun). YASPH_BENCH_CONFIGS=0 skips.
    configs = {}
    if os.environ.get("YASPH_BENCH_CONFIGS", "1") != "0":
        for name in ("wcsph_dam_break", "dfsph_dam_break", "dfsph_high_viscosity"):
            configs[name] = _retry(
                lambda: bench_baseline_config(name, num_steps), name
            )

    # headline: 1M — the size the BASELINE.json north star (1e9 p-s/s at 1M
    # particles) is defined at; falls back to the largest size run. The full
    # matrix (10k/100k/1M) is always in extra.sizes.
    headline_key = "1000000" if "1000000" in results else str(sizes[-1])
    headline = results[headline_key]
    value = headline["particle_steps_per_sec"]
    print(
        json.dumps(
            {
                "metric": (
                    f"DFSPH particle-steps/sec ({headline['particles']} particles, "
                    f"double dam-break, {backend} backend)"
                ),
                "value": value,
                "unit": "particle-steps/sec",
                "vs_baseline": value / NORTH_STAR_PARTICLE_STEPS_PER_SEC,
                "extra": {
                    "sizes": results,
                    "wcsph_sizes": wcsph_sizes,
                    "baseline_configs": configs,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
