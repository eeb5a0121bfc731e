"""Time management: adaptive CFL stepping (on device) + frame-loop governor (host).

TPU-native counterpart of the reference's `TimeManager`
(reference: src/sph/timemanager.rs). The split:

- `update_simulation_step(...)` — the per-step dt policy (FixedTimeStep or adaptive
  CFL with anti-oscillation clamp and optional recording frame target,
  timemanager.rs:252-279). Pure, traced: dt is a carried f32 scalar inside the jitted
  solver step, so an adaptive timestep never triggers a recompile.
- `TimeState` — the traced per-step clock (dt, total simulated time, step count).
- `TimeManager` — host-side three-clock bookkeeping (wall / render / simulation,
  timemanager.rs:61-71) with the frame-loop governor and its "well of despair" lag
  acceptance (timemanager.rs:13-19, 231-242). Drives the app/recording harness.

Behavioral contracts kept bit-for-bit from the reference:
- CFL estimate dt = cfl_factor * 0.4 * particle_diameter / (max_velocity + 1e-5)
  (timemanager.rs:264).
- upper bound min(timestep_max, 2 * previous_dt): "smaller timestep is always fine,
  but don't jerk it up" (timemanager.rs:265-267).
- the frame loop accounts a step's dt *before* the step runs; the step may then change
  dt mid-step (both solvers do), so total_simulated_time tracks the pre-step dt. This
  matches the reference's TimeManager/solver interplay exactly and matters for
  residual parity.
- TargetFrameLength lower bound: time_to_target = total_simulated_time mod target,
  lower = min(timestep_min, time_to_target) — replicated as written in the reference
  (timemanager.rs:268-274), including its quirk of clamping the *lower* bound with the
  elapsed-since-target rather than clamping the step to the next target boundary.
"""

import collections
import enum
import time
from dataclasses import dataclass
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .units import REAL


@dataclass(frozen=True)
class FixedTimeStep:
    """SimulationStepConfig::FixedTimeStep (timemanager.rs:40)."""

    timestep: float


@dataclass(frozen=True)
class AdaptiveTimeStep:
    """SimulationStepConfig::AdaptiveTimeStep (timemanager.rs:44-59).

    target_frame_length None <-> AdaptiveTimeStepTarget::None; a float enables the
    recording-exact TargetFrameLength mode (timemanager.rs:23-36).
    """

    timestep_max: float
    timestep_min: float
    cfl_factor: float
    target_frame_length: Optional[float] = None


StepConfig = Union[FixedTimeStep, AdaptiveTimeStep]


@dataclass(frozen=True)
class TimerConfig:
    """reference: TimerConfig (timemanager.rs:10-21)."""

    step_config: StepConfig
    max_simulated_time_per_frame: float


class TimeState(NamedTuple):
    """Traced simulation clock, carried through jitted steps.

    `target_frame_length` is the recording frame target
    (AdaptiveTimeStepTarget::TargetFrameLength, timemanager.rs:23-36) as a
    TRACED scalar: 0 disables it, a positive value makes the adaptive dt land
    exactly on multiples of the target. Carrying it in the state (instead of
    folding it into the jit as static config) lets the viewer's R key toggle
    recording mid-run without a recompile, reproducing main.rs:318-333."""

    dt: jax.Array  # () f32 current step length
    total_simulated_time: jax.Array  # () f32
    num_steps: jax.Array  # () int32
    target_frame_length: jax.Array  # () f32; 0 = AdaptiveTimeStepTarget::None

    @classmethod
    def initial(cls, config: StepConfig) -> "TimeState":
        if isinstance(config, FixedTimeStep):
            dt0, target0 = config.timestep, 0.0
        else:  # timemanager.rs:106-109
            dt0 = config.timestep_min
            target0 = config.target_frame_length or 0.0
        return cls(
            dt=jnp.asarray(dt0, dtype=REAL),
            total_simulated_time=jnp.zeros((), dtype=REAL),
            num_steps=jnp.zeros((), dtype=jnp.int32),
            target_frame_length=jnp.asarray(target0, dtype=REAL),
        )

    def with_target_frame_length(self, target: Optional[float]) -> "TimeState":
        """Set/clear the recording frame target (R-key toggle, main.rs:318-333).
        Pure scalar replace: no recompile of the jitted step."""
        return self._replace(
            target_frame_length=jnp.asarray(target or 0.0, dtype=REAL)
        )

    def account_step(self) -> "TimeState":
        """Advance the clock for the step about to run (frame loop semantics,
        timemanager.rs:246-248): total time moves by the *current* dt."""
        return self._replace(
            total_simulated_time=self.total_simulated_time + self.dt,
            num_steps=self.num_steps + 1,
        )


def update_simulation_step(
    config: StepConfig,
    time_state: TimeState,
    particle_diameter: float,
    max_velocity: jax.Array,
) -> TimeState:
    """dt policy evaluated mid-step by solvers (timemanager.rs:252-279).

    `time_state` must already be advanced (`account_step`) when this is called, like
    the reference where simulation_frame_loop has already added the step.
    """
    if isinstance(config, FixedTimeStep):
        return time_state._replace(dt=jnp.asarray(config.timestep, dtype=REAL))

    velocity_epsilon = jnp.asarray(1e-5, dtype=REAL)
    time_cfl = (
        jnp.asarray(config.cfl_factor * 0.4 * particle_diameter, dtype=REAL)
        / (max_velocity + velocity_epsilon)
    )
    upper_bound = jnp.minimum(
        jnp.asarray(config.timestep_max, dtype=REAL), time_state.dt * 2.0
    )
    lower_bound = jnp.asarray(config.timestep_min, dtype=REAL)
    # recording frame target as a TRACED branch (timemanager.rs:268-274,
    # including the reference's quirk of clamping the LOWER bound with the
    # elapsed-since-target); target <= 0 means AdaptiveTimeStepTarget::None
    target = time_state.target_frame_length
    safe_target = jnp.where(target > 0, target, jnp.asarray(1.0, dtype=REAL))
    total = time_state.total_simulated_time
    time_to_target = total - safe_target * jnp.floor(total / safe_target)
    lower_bound = jnp.where(
        target > 0, jnp.minimum(lower_bound, time_to_target), lower_bound
    )
    new_dt = jnp.maximum(lower_bound, jnp.minimum(upper_bound, time_cfl))
    return time_state._replace(dt=new_dt)


class SimulationStepResult(enum.Enum):
    """reference: timemanager.rs:95-101."""

    PERFORM_STEP_AND_CALL_AGAIN = enum.auto()
    CAUGHT_UP_WITH_RENDER_TIME = enum.auto()
    DROPPING_SIMULATION_STEPS = enum.auto()


FRAME_DURATION_HISTORY_LENGTH = 50  # timemanager.rs:103


class TimeManager:
    """Host-side frame-loop governor over a device TimeState.

    Owns wall-clock and render-time bookkeeping; the simulation clock lives on device
    in `TimeState` and is mirrored here after each step (reads are cheap scalars).
    """

    def __init__(self, config: TimerConfig):
        self.config = config
        self.restart()

    def restart(self):
        """reference: timemanager.rs:131-133."""
        self.time_state = TimeState.initial(self.config.step_config)
        self.timestamp_last_frame = time.perf_counter()
        self.duration_last_frame = 0.0
        self.frame_duration_history = collections.deque(
            maxlen=FRAME_DURATION_HISTORY_LENGTH
        )
        self.total_rendered_time = 0.0
        self.current_frame_delta = 0.0
        self.num_frames_rendered = 0
        self.num_simulation_steps_this_frame = 0
        self.simulated_time_this_frame = 0.0
        self.accepted_simulation_to_render_lag = 0.0

    # -------------------------------------------------------------- accessors

    @property
    def simulation_step(self) -> float:
        return float(self.time_state.dt)

    @property
    def total_simulated_time(self) -> float:
        return float(self.time_state.total_simulated_time)

    @property
    def num_simulation_steps(self) -> int:
        return int(self.time_state.num_steps)

    def frame_delta(self) -> float:
        return self.current_frame_delta

    # ------------------------------------------------------------- frame loop

    def force_frame_delta(self, delta: float):
        """Jump the render clock (recording / fast-forward, timemanager.rs:186-190)."""
        self.total_rendered_time -= self.current_frame_delta
        self.current_frame_delta = delta
        self.total_rendered_time += self.current_frame_delta

    def on_frame_presented(self, wallclock_to_rendertime_scale: float = 1.0):
        """reference: timemanager.rs:193-206."""
        now = time.perf_counter()
        self.duration_last_frame = now - self.timestamp_last_frame
        self.frame_duration_history.append(self.duration_last_frame)
        self.current_frame_delta = (
            self.duration_last_frame * wallclock_to_rendertime_scale
        )
        self.total_rendered_time += self.current_frame_delta
        self.timestamp_last_frame = now
        self.num_simulation_steps_this_frame = 0
        self.simulated_time_this_frame = 0.0
        self.num_frames_rendered += 1

    def skip_simulation_frame(self):
        """reference: timemanager.rs:208-210."""
        self.accepted_simulation_to_render_lag += self.current_frame_delta

    def simulation_frame_loop(self) -> SimulationStepResult:
        """One governor decision (reference: timemanager.rs:212-249). When it returns
        PERFORM_STEP_AND_CALL_AGAIN the caller must run exactly one solver step with
        the current TimeState (already advanced here)."""
        predicted_rendered_time = self.total_rendered_time + self.current_frame_delta
        residual_time = max(
            predicted_rendered_time
            - (self.total_simulated_time + self.accepted_simulation_to_render_lag),
            0.0,
        )
        if residual_time < self.simulation_step:
            return SimulationStepResult.CAUGHT_UP_WITH_RENDER_TIME

        if self.simulated_time_this_frame > self.config.max_simulated_time_per_frame:
            # Accept 90% of the lag instead of dropping all lost frames - avoids
            # oscillating between realtime and offline (timemanager.rs:231-242).
            self.accepted_simulation_to_render_lag += residual_time * 0.9
            return SimulationStepResult.DROPPING_SIMULATION_STEPS

        self.num_simulation_steps_this_frame += 1
        self.simulated_time_this_frame += self.simulation_step
        self.time_state = self.time_state.account_step()
        return SimulationStepResult.PERFORM_STEP_AND_CALL_AGAIN
