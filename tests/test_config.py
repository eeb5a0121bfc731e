"""Declarative config: JSON round-trip + building every solver kind."""

import numpy as np
import jax
import pytest

from yasph2d_tpu.config import (
    BoundaryThickLine,
    FluidConfig,
    FluidRect,
    SimulationConfig,
    SolverConfig,
    TimestepConfig,
    ViscosityConfig,
)


def small_config(kind):
    return SimulationConfig(
        fluid=FluidConfig(particle_density=1600.0),
        solver=SolverConfig(kind=kind),
        timestep=TimestepConfig(kind="fixed", fixed_timestep=1.0 / 3000.0),
        scene=[
            FluidRect(rect=(0.1, 0.7, 0.5, 1.0), jitter=0.05),
            BoundaryThickLine(start=(0.0, 0.0), end=(2.0, 0.0), thickness=4),
            BoundaryThickLine(start=(0.0, 0.0), end=(0.0, 2.5), thickness=4),
            BoundaryThickLine(start=(2.0, 0.0), end=(2.0, 2.5), thickness=4),
            BoundaryThickLine(start=(-2.0, -0.5), end=(4.0, -0.5), thickness=4),
        ],
    )


def test_json_roundtrip(tmp_path):
    cfg = small_config("dfsph_dense")
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    loaded = SimulationConfig.from_json(path)
    assert loaded == cfg


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unknown"):
        SimulationConfig.from_dict({"fluid": {"particle_densty": 100.0}})


def live_positions(solver, carry):
    """Final positions regardless of carry layout (sorted vs padded-resident)."""
    if hasattr(carry, "particles"):
        return np.asarray(carry.particles.positions)
    s = solver.export_state(carry)
    return np.asarray(s.positions)[np.asarray(s.alive)]


@pytest.mark.parametrize(
    "kind",
    ["wcsph", "wcsph_dense", "wcsph_padded", "dfsph", "dfsph_dense",
     "dfsph_padded"],
)
def test_build_and_step_each_solver(kind):
    cfg = small_config(kind)
    world, solver, boundary, carry = cfg.build()
    assert world.num_dynamic_particles > 100
    carry, _ = jax.jit(solver.simulate, static_argnums=2)(carry, boundary, 5)
    pos = live_positions(solver, carry)
    assert np.isfinite(pos).all()


@pytest.mark.slow
def test_physical_viscosity_and_adaptive():
    cfg = SimulationConfig(
        fluid=FluidConfig(particle_density=1600.0),
        viscosity=ViscosityConfig(kind="physical", fluid_viscosity=0.01),
        timestep=TimestepConfig(kind="adaptive"),
        solver=SolverConfig(kind="dfsph_dense"),
        scene=small_config("dfsph_dense").scene,
    )
    _, solver, boundary, carry = cfg.build()
    carry, diag = jax.jit(solver.simulate, static_argnums=2)(carry, boundary, 5)
    assert np.isfinite(live_positions(solver, carry)).all()
    assert float(diag.dt) > 0


def test_perf_knobs_roundtrip_and_build(tmp_path):
    """The measured-best bench settings (PERF.md round 4) must be reachable
    from a JSON config: pair_dtype, pf chunk widths, slot-major row block."""
    import dataclasses

    cfg = SimulationConfig(
        fluid=FluidConfig(particle_density=100.0),  # tiny: interpret-mode CPU
        solver=SolverConfig(
            kind="dfsph_plane",
            pair_dtype="bfloat16",
            pallas_pf_chunk_lanes=128,
            pallas_pf_stat_chunk_lanes=128,
            pallas_sm_row_block=4,
        ),
        timestep=TimestepConfig(kind="fixed", fixed_timestep=1.0 / 3000.0),
        scene=[
            FluidRect(rect=(0.1, 0.1, 0.4, 0.4), jitter=0.05),
            BoundaryThickLine(start=(0.0, 0.0), end=(2.0, 0.0), thickness=2),
        ],
    )
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    loaded = SimulationConfig.from_json(path)
    assert loaded == cfg
    # build() runs init_carry through the bf16 chunked kernels (interpret mode
    # off-TPU); stepping at these settings is covered on-chip by the bench and
    # by tests/test_pf_bf16.py at the kernel level
    world, solver, boundary, carry = loaded.build()
    g = solver.grid
    assert g.pair_dtype == "bfloat16"
    assert g.pallas_pf_chunk_lanes == 128
    assert g.pallas_pf_stat_chunk_lanes == 128
    assert g.pallas_sm_row_block == 4
    dens = np.asarray(carry.ctx.densities)
    assert np.isfinite(dens[np.asarray(carry.ctx.mask)]).all()


def test_rebuild_every_roundtrip_and_build(tmp_path):
    import dataclasses
    import jax
    import numpy as np

    cfg = SimulationConfig(
        solver=dataclasses.replace(SimulationConfig().solver, rebuild_every=2)
    )
    path = tmp_path / "cfg.json"
    cfg.to_json(str(path))
    cfg2 = SimulationConfig.from_json(str(path))
    assert cfg2.solver.rebuild_every == 2
    world, solver, boundary, carry = cfg2.build()
    assert solver.rebuild_every == 2
    carry, diag = jax.jit(solver.simulate, static_argnums=2)(carry, boundary, 4)
    assert np.isfinite(live_positions(solver, carry)).all()
