"""Roofline accounting for the plane-resident DFSPH step (VERDICT round-4
item 1): what fraction of the pf kernels' candidate work is live pairs, what
the VPU can sustain on this chip, and where the step sits against both.

Three measurements, all on the real device:

1. **VPU speed-of-light probe** — a Pallas kernel over the same (BR, NXP)
   plane shape the pf kernels use, running K chained multiply-adds per
   element. Sustained element-ops/s is the denominator every per-kernel
   utilization is quoted against (catalog peaks don't survive the axon
   tunnel; measure instead).
2. **HBM stream probe** — timed big-array copy, for the bytes/step floor.
3. **Candidate accounting** — from a SETTLED 1M bench carry (100 steps, so
   the dam has collapsed like the bench steady state): live particles, live
   pairs (dynamic + boundary, from count-only pf passes), and the padded
   candidate-lane units each pass actually executes given the
   occupancy-adaptive bounds:
       sum over (band, chunk) live on both sides of
           q_cnt * 9 * s_cnt * BR * cw
   evaluated at each pass's own chunk decomposition.

Output: a markdown-ish block to paste into PERF.md, plus raw numbers.

Usage: python tools/roofline.py [n_particles] [settle_steps]
Env: YASPH_BENCH_PAIR_DTYPE / YASPH_BENCH_PF_STAT_CHUNK as in bench.py.
"""

import dataclasses
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import double_dam_break
from yasph2d_tpu.models.dfsph_plane import DFSPHPlaneSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep
from yasph2d_tpu.utils import compile_cache
from yasph2d_tpu.ops import pallas_slotmajor as psm

compile_cache.enable()


# VPU / HBM speed-of-light denominators live in tools/vpu_probe.py (which
# forces completion with a scalar host read — block_until_ready does not
# reliably block on the axon platform and overreports rates ~100x).


def candidate_units(q_cnt, s_cnt, flags, br, nxp, chunks):
    """Padded candidate-lane units a pf pass executes: per live (band, chunk),
    q_cnt * 9 * s_cnt * BR * cw (the adaptive kernel's actual loop volume)."""
    q = psm._pf_coarsen(q_cnt, chunks)
    s = psm._pf_coarsen(s_cnt, chunks)
    widths = jnp.asarray([w for _, w in chunks], jnp.float32)
    live = (flags > 0) & (q > 0) & (s > 0)
    per = jnp.where(live, q.astype(jnp.float32) * 9.0 * s.astype(jnp.float32),
                    0.0)
    return float(jnp.sum(per * widths[None, :]) * br)


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    settle = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    world = double_dam_break(target)
    grid = dataclasses.replace(
        world.dense_grid(occupancy=7),
        use_pallas_slotmajor=True,
        pallas_sm_row_block=8,
        pallas_pf_stat_chunk_lanes=int(
            os.environ.get("YASPH_BENCH_PF_STAT_CHUNK", 128)
        ),
        pair_dtype=os.environ.get("YASPH_BENCH_PAIR_DTYPE", "bfloat16"),
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
    geom = ctx.geom
    br = grid.pallas_sm_row_block
    nbr, nyp, nxp, _ = psm.pf_dims(grid, br)

    # live pairs: count-only passes (dyn + stat), mirroring the ctx pass
    ones_term = lambda dx, dy, r_sq, r, sc, q, s: (jnp.ones_like(r_sq),)
    stat_kw = grid.pf_stat_chunk_kw

    def pf_sum(term, q, s, flags, grid, br, **kw):
        out = psm.pf_pair_reduce(term, 1, q, s, flags, grid, br, **kw)
        return jnp.sum(out)

    flags_dyn = ctx.flags_dyn
    flags_stat = psm.pass_flags(geom, bpl.geom, grid)
    pairs_dyn = float(jax.jit(
        lambda: pf_sum(ones_term, geom, geom, flags_dyn, grid, br)
    )())
    pairs_stat = float(jax.jit(
        lambda: pf_sum(ones_term, geom, bpl.geom, flags_stat, grid, br,
                       **stat_kw)
    )())
    n_live = float(jnp.sum(ctx.mask))

    # padded candidate-lane units at each pass's chunk decomposition
    full = psm._pf_chunks(grid, nxp)
    stat_chunks = psm._pf_chunks(
        grid, nxp,
        override=stat_kw.get("chunk_lanes", psm._CHUNK_FROM_GRID),
    )
    units_dyn = candidate_units(geom.q_cnt, geom.s_cnt, flags_dyn, br, nxp,
                                full)
    units_stat = candidate_units(geom.q_cnt, bpl.geom.s_cnt, flags_stat, br,
                                 nxp, stat_chunks)
    live_bands = float(jnp.sum(flags_dyn > 0))

    print("=== roofline inputs ===")
    print(f"scene: {world.num_dynamic_particles} fluid, settle {settle} steps,"
          f" grid {grid.nx}x{grid.ny} occ {grid.occupancy},"
          f" pair_dtype {grid.pair_dtype}")
    print(f"live slots: {n_live:.0f}; live bands: {live_bands:.0f}/{nbr}")
    print(f"live pairs/particle: dyn {pairs_dyn / n_live:.2f}, "
          f"stat {pairs_stat / n_live:.2f}")
    print(f"live pairs: dyn {pairs_dyn:.3e}, stat {pairs_stat:.3e}")
    print(f"candidate-lane units/pass: dyn {units_dyn:.3e} "
          f"(live-pair fraction {pairs_dyn / units_dyn * 100:.1f}%), "
          f"stat {units_stat:.3e} ({pairs_stat / units_stat * 100:.1f}%)")
    vpu_ops = float(os.environ.get("YASPH_VPU_TOPS", "0")) * 1e12
    if not vpu_ops:
        print("(set YASPH_VPU_TOPS from tools/vpu_probe.py for floors)")
        return

    # per-candidate-lane vector-op counts (counted from _pf_kernel bodies):
    # loads+compares+mask (7) + r_sq/sqrt (4) + term math (per pass) +
    # masked accumulate (2 per output)
    per_cand = {
        "ctx (5 acc)": 7 + 4 + 14 + 10,
        "vel-div (1 acc)": 7 + 4 + 8 + 2,
        "k-corr (2 acc)": 7 + 4 + 6 + 4,
        "viscosity (2 acc)": 7 + 4 + 10 + 4,
    }
    print("=== per-pass VPU floors (dyn units, probe rate) ===")
    for name, ops in per_cand.items():
        floor_ms = units_dyn * ops / vpu_ops * 1e3
        print(f"{name}: ~{ops} vec-ops/cand-lane -> floor "
              f"{floor_ms:.2f} ms/pass at {vpu_ops / 1e12:.1f} Tvecop/s")


if __name__ == "__main__":
    main()
