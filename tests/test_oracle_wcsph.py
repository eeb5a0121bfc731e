"""WCSPH trajectory parity against the independent NumPy oracle
(tools/oracle_wcsph.py).

Closes the VERDICT round-2 gap: both JAX WCSPH backends share world.py and the
kernel module, so dense-vs-table agreement could not catch a common-mode
misreading of wscsph.rs. The oracle is a from-scratch NumPy float32 WCSPH with
brute-force neighbors and no shared code. Pinned on the shared dam-break scene:

- ADAPTIVE dt over 25 steps: the per-step dt sequence (which exercises the CFL
  update from the old-dt estimate AND the new-dt second half-kick quirk,
  wscsph.rs:158-178), max density, max pressure, center of mass, kinetic energy;
- FIXED dt over 25 steps: the same aggregates plus final sorted positions.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.oracle_wcsph import dam_break_scene, make_oracle
from yasph2d_tpu.models.wcsph import WCSPHSolver, tait_pressure
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.timemanager import AdaptiveTimeStep, FixedTimeStep

NUM_STEPS = 25


def make_solver(world, step_config):
    return WCSPHSolver(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties, grid=world.grid, step_config=step_config,
    )


def aggregates(solver, carry):
    p = carry.particles
    alive = np.asarray(p.alive)
    pos = np.asarray(p.positions)[alive]
    vel = np.asarray(p.velocities)[alive]
    rho = np.asarray(p.densities)[alive]
    m = solver.properties.particle_mass
    pressures = np.asarray(
        tait_pressure(solver.stiffness, solver.properties.fluid_density, rho)
    )
    return {
        "max_density": float(rho.max()),
        "mean_density": float(rho.mean(dtype=np.float64)),
        "max_pressure": float(pressures.max()),
        "com_x": float(pos[:, 0].mean(dtype=np.float64)),
        "com_y": float(pos[:, 1].mean(dtype=np.float64)),
        "kinetic_energy": float(
            (0.5 * m * np.einsum("ik,ik->i", vel, vel)).sum(dtype=np.float64)
        ),
    }


def run_parity(step_config, oracle_kwargs, check_positions):
    world = dam_break_scene()
    oracle = make_oracle(world, **oracle_kwargs)
    solver = make_solver(world, step_config)
    boundary = world.boundary_grid()
    carry = solver.init_carry(world.initial_state())
    step = jax.jit(solver.step)

    for i in range(NUM_STEPS):
        o = oracle.step()
        carry = carry._replace(time=carry.time.account_step())
        carry, d = step(carry, boundary)
        assert int(d.neighbor_drops) == 0

        # dt sequence: pins the CFL-from-old-estimate + new-dt half-kick chain
        np.testing.assert_allclose(
            float(carry.time.dt), o["new_dt"], rtol=1e-4, err_msg=f"step {i}"
        )
        agg = aggregates(solver, carry)
        np.testing.assert_allclose(
            agg["max_density"], o["max_density"], rtol=1e-4, err_msg=f"step {i}"
        )
        np.testing.assert_allclose(
            agg["mean_density"], o["mean_density"], rtol=1e-5, err_msg=f"step {i}"
        )
        # pressure ~ (rho/rho0)^7: amplifies density drift ~7x
        np.testing.assert_allclose(
            agg["max_pressure"], o["max_pressure"],
            rtol=2e-3, atol=1e-3, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            [agg["com_x"], agg["com_y"]], [o["com_x"], o["com_y"]],
            rtol=0, atol=1e-5, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            agg["kinetic_energy"], o["kinetic_energy"],
            rtol=1e-3, atol=1e-9, err_msg=f"step {i}",
        )

    if check_positions:
        alive = np.asarray(carry.particles.alive)
        jax_pos = np.asarray(carry.particles.positions)[alive]
        np.testing.assert_allclose(
            jax_pos[np.lexsort(jax_pos.T)], oracle.x[np.lexsort(oracle.x.T)],
            rtol=0, atol=2e-4,  # fraction of h = 0.067
        )


def test_wcsph_adaptive_dt_matches_oracle():
    run_parity(
        AdaptiveTimeStep(
            timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0, cfl_factor=0.2
        ),
        {"cfl_factor": 0.2},
        check_positions=True,
    )


def test_wcsph_fixed_dt_matches_oracle():
    dt = 1.0 / 3000.0
    run_parity(FixedTimeStep(dt), {"fixed_dt": dt}, check_positions=True)
