"""End-to-end verify drive for the slot-major Pallas path (pair passes +
sm_rebucket) on the real TPU: reference default dam-break scene, DFSPH and
WCSPH padded solvers with use_pallas_slotmajor=True, physical invariants
checked after a few hundred steps.

Run from the repo root: python tools/verify_slotmajor_drive.py
Env: YASPH_VERIFY_STEPS (default 300; reduce for CPU-interpret runs).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from yasph2d_tpu.utils import compile_cache

compile_cache.enable()

import yasph2d_tpu as y
from yasph2d_tpu.models.dfsph_dense import DFSPHPaddedSolver
from yasph2d_tpu.models.wcsph_dense import WCSPHPaddedSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep


def scene():
    world = y.FluidParticleWorld(2.0, 10000.0, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    for args in [
        ((0.0, 2.5), (2.0, 2.5), 4), ((0.0, 0.0), (2.0, 0.0), 4),
        ((0.0, 0.0), (0.0, 2.5), 4), ((2.0, 0.0), (2.0, 2.5), 4),
        ((0.0, 0.6), (1.75, 0.5), 2), ((0.0, 2.5), (2.0, 2.5), 2),
        ((-2.0, -0.5), (4.0, -0.5), 4),
    ]:
        world.add_boundary_thick_line(*args)
    assert world.num_dynamic_particles == 4050
    return world


def check(name, solver, carry, boundary, n_steps=None, dfsph=True):
    if n_steps is None:
        n_steps = int(os.environ.get("YASPH_VERIFY_STEPS", 300))
    simulate = jax.jit(solver.simulate, static_argnums=2, donate_argnums=0)
    t0 = time.perf_counter()
    carry, diag = simulate(carry, boundary, 10)
    _ = float(carry.time.total_simulated_time)
    print(f"[{name}] compile + 10 steps: {time.perf_counter() - t0:.1f}s",
          flush=True)
    diags = [diag]
    t0 = time.perf_counter()
    for _ in range(n_steps // 10 - 1):
        carry, diag = simulate(carry, boundary, 10)
        diags.append(diag)
    _ = float(carry.time.total_simulated_time)
    dt_ms = (time.perf_counter() - t0) / (n_steps - 10) * 1e3
    print(f"[{name}] {n_steps} steps, {dt_ms:.2f} ms/step", flush=True)

    s = solver.export_state(carry)
    alive = np.asarray(s.alive)
    pos = np.asarray(s.positions)[alive]
    vel = np.asarray(s.velocities)[alive]
    dens = np.asarray(s.densities)[alive]
    drops = max(int(d.neighbor_drops) for d in diags)
    assert pos.shape[0] + drops >= 4050, (pos.shape, drops)
    assert np.isfinite(pos).all() and np.isfinite(vel).all(), "NaN/inf state"
    assert drops == 0, f"neighbor drops: {drops}"
    assert pos[:, 0].min() > -0.15 and pos[:, 0].max() < 2.15, (
        f"x out of tank: [{pos[:, 0].min()}, {pos[:, 0].max()}]")
    assert pos[:, 1].min() > -0.65 and pos[:, 1].max() < 2.65, (
        f"y out of tank: [{pos[:, 1].min()}, {pos[:, 1].max()}]")
    assert dens.min() >= 100.0 - 1e-3 and dens.max() < 135.0, (
        f"density out of range: [{dens.min()}, {dens.max()}]")
    if dfsph:
        di = sum(int(d.density_iterations) for d in diags) / n_steps
        vi = sum(int(d.divergence_iterations) for d in diags) / n_steps
        print(f"[{name}] iterations/step: density {di:.2f}, divergence {vi:.2f}",
              flush=True)
        assert 0.5 < di < 50 and 0.5 < vi < 50, "iteration counts implausible"
    print(f"[{name}] OK — {pos.shape[0]} particles, density "
          f"[{dens.min():.2f}, {dens.max():.2f}], x [{pos[:, 0].min():.3f}, "
          f"{pos[:, 0].max():.3f}], y [{pos[:, 1].min():.3f}, "
          f"{pos[:, 1].max():.3f}]", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    world = scene()
    h = world.properties.smoothing_length
    grid = world.dense_grid()
    grid = dataclasses.replace(grid, use_pallas_slotmajor=True)
    boundary = world.boundary_dense(grid)
    visc = XSPHViscosityModel(smoothing_length=h)

    dfsph = DFSPHPaddedSolver(
        viscosity_model=visc, properties=world.properties, grid=grid,
        step_config=AdaptiveTimeStep(
            timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0, cfl_factor=1.5
        ),
    )
    carry = jax.jit(dfsph.init_carry)(world.initial_state(), boundary)
    check("dfsph_padded+slotmajor", dfsph, carry, boundary)

    wcsph = WCSPHPaddedSolver(
        viscosity_model=visc, properties=world.properties, grid=grid,
        step_config=AdaptiveTimeStep(
            timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0, cfl_factor=0.2
        ),
    )
    carry = jax.jit(wcsph.init_carry)(world.initial_state())
    check("wcsph_padded+slotmajor", wcsph, carry, boundary, dfsph=False)
    print("VERIFY PASS", flush=True)


if __name__ == "__main__":
    main()
