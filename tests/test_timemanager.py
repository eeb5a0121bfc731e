"""Time manager tests: CFL policy (device) + frame-loop governor (host).

Reference behaviors under test: timemanager.rs:252-279 (dt policy) and
timemanager.rs:212-249 (frame loop / lag acceptance).
"""

import jax.numpy as jnp
import numpy as np

from yasph2d_tpu.timemanager import (
    AdaptiveTimeStep,
    FixedTimeStep,
    SimulationStepResult,
    TimeManager,
    TimerConfig,
    TimeState,
    update_simulation_step,
)


def mk_state(dt, total=0.0, steps=0, target=0.0):
    return TimeState(
        dt=jnp.float32(dt),
        total_simulated_time=jnp.float32(total),
        num_steps=jnp.int32(steps),
        target_frame_length=jnp.float32(target),
    )


def test_fixed_timestep():
    cfg = FixedTimeStep(timestep=0.01)
    ts = update_simulation_step(cfg, mk_state(0.5), 0.1, jnp.float32(99.0))
    assert float(ts.dt) == np.float32(0.01)


def test_adaptive_cfl_formula():
    cfg = AdaptiveTimeStep(timestep_max=1.0, timestep_min=1e-6, cfl_factor=0.5)
    diameter, vmax = 0.02, 2.0
    ts = update_simulation_step(cfg, mk_state(1.0), diameter, jnp.float32(vmax))
    expected = 0.5 * 0.4 * diameter / (vmax + 1e-5)  # timemanager.rs:264
    assert abs(float(ts.dt) - expected) < 1e-9


def test_adaptive_growth_clamped_to_double():
    """Anti-oscillation: dt never more than doubles (timemanager.rs:265-267)."""
    cfg = AdaptiveTimeStep(timestep_max=1.0, timestep_min=1e-6, cfl_factor=1.0)
    ts = update_simulation_step(cfg, mk_state(0.001), 1.0, jnp.float32(0.0))
    assert abs(float(ts.dt) - 0.002) < 1e-9


def test_adaptive_bounds():
    cfg = AdaptiveTimeStep(timestep_max=0.005, timestep_min=0.001, cfl_factor=1.0)
    # huge velocity -> clamped up to timestep_min
    ts = update_simulation_step(cfg, mk_state(0.005), 0.01, jnp.float32(1e6))
    assert abs(float(ts.dt) - 0.001) < 1e-9
    # zero velocity -> clamped down to timestep_max (dt already at max)
    ts = update_simulation_step(cfg, mk_state(0.005), 10.0, jnp.float32(0.0))
    assert abs(float(ts.dt) - 0.005) < 1e-9


def test_target_frame_length_lowers_lower_bound():
    """TargetFrameLength mode replicates the reference formula
    (timemanager.rs:268-274): lower = min(timestep_min, total mod target)."""
    cfg = AdaptiveTimeStep(
        timestep_max=0.01, timestep_min=0.004, cfl_factor=1.0,
        target_frame_length=1.0 / 60.0,
    )
    # total mod target = 0.001 < timestep_min -> lower bound becomes 0.001
    total = 3 * (1.0 / 60.0) + 0.001
    ts = update_simulation_step(
        cfg, mk_state(0.01, total=total, target=1.0 / 60.0), 0.0001,
        jnp.float32(100.0),
    )
    # CFL is tiny, so dt = lower bound
    assert abs(float(ts.dt) - 0.001) < 1e-6


def test_frame_loop_steps_until_caught_up():
    cfg = TimerConfig(
        step_config=FixedTimeStep(timestep=0.01),
        max_simulated_time_per_frame=1.0,
    )
    tm = TimeManager(cfg)
    tm.force_frame_delta(0.035)  # render time advances 35ms
    results = []
    while True:
        r = tm.simulation_frame_loop()
        results.append(r)
        if r != SimulationStepResult.PERFORM_STEP_AND_CALL_AGAIN:
            break
    # The loop targets the *predicted* render time of the next presented frame
    # (timemanager.rs:214-216): total_rendered (0.035) + current_delta (0.035) = 0.07,
    # so 7 steps of 10ms before caught up.
    assert results == [SimulationStepResult.PERFORM_STEP_AND_CALL_AGAIN] * 7 + [
        SimulationStepResult.CAUGHT_UP_WITH_RENDER_TIME
    ]
    assert abs(tm.total_simulated_time - 0.07) < 1e-6
    assert tm.num_simulation_steps == 7


def test_frame_loop_drops_steps_and_accepts_lag():
    """Well-of-despair avoidance: exceeding the per-frame budget accepts 90% of the
    residual lag (timemanager.rs:231-242)."""
    cfg = TimerConfig(
        step_config=FixedTimeStep(timestep=0.01),
        max_simulated_time_per_frame=0.02,
    )
    tm = TimeManager(cfg)
    tm.force_frame_delta(1.0)  # huge render delta
    steps = 0
    while tm.simulation_frame_loop() == SimulationStepResult.PERFORM_STEP_AND_CALL_AGAIN:
        steps += 1
    # budget 0.02 at 0.01 steps -> 3 steps (loop checks budget before incrementing)
    assert steps == 3
    assert tm.accepted_simulation_to_render_lag > 0.8


def test_restart_resets_clock():
    cfg = TimerConfig(FixedTimeStep(0.01), 1.0)
    tm = TimeManager(cfg)
    tm.force_frame_delta(0.05)
    while tm.simulation_frame_loop() == SimulationStepResult.PERFORM_STEP_AND_CALL_AGAIN:
        pass
    assert tm.num_simulation_steps > 0
    tm.restart()
    assert tm.num_simulation_steps == 0
    assert tm.total_simulated_time == 0.0


def test_target_frame_length_is_traced_state():
    """The recording target is a TRACED TimeState scalar (round-3): setting or
    clearing it mid-run changes the dt policy with NO config change — the
    viewer's R key toggles it without recompiling the jitted step."""
    cfg = AdaptiveTimeStep(timestep_max=0.01, timestep_min=0.004, cfl_factor=1.0)
    state = TimeState.initial(cfg)
    assert float(state.target_frame_length) == 0.0
    total = 3 * (1.0 / 60.0) + 0.001
    base = mk_state(0.01, total=total)

    # no target: lower bound is timestep_min
    ts = update_simulation_step(cfg, base, 0.0001, jnp.float32(100.0))
    assert abs(float(ts.dt) - 0.004) < 1e-6
    # same config, target set through the state: reference quirk formula applies
    ts = update_simulation_step(
        cfg, base.with_target_frame_length(1.0 / 60.0), 0.0001,
        jnp.float32(100.0),
    )
    assert abs(float(ts.dt) - 0.001) < 1e-6
    # clearing restores the plain lower bound
    ts = update_simulation_step(
        cfg,
        base.with_target_frame_length(1.0 / 60.0).with_target_frame_length(None),
        0.0001, jnp.float32(100.0),
    )
    assert abs(float(ts.dt) - 0.004) < 1e-6
