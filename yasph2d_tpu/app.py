"""Headless application harness: scene + frame loop + rendering + recording.

TPU-native counterpart of the reference app (reference: src/main.rs). The ggez window
becomes a headless frame producer: the same default dam-break scene, the same solver
defaults (DFSPH with XSPH viscosity, cfl 1.5; WCSPH alternative with cfl 0.2), the
same TimeManager frame-loop governor, the same camera framing, and the same recording
mode (forced 1/60s frame deltas -> deterministic sim, PNG per frame). "Realtime" mode
paces against the wall clock like the reference's windowed mode.

Per-step processing-time history (len 80) mirrors the reference HUD statistics
(main.rs:61, 277-290).
"""

import collections
import enum
import time
from typing import Optional

import jax
import numpy as np

from .models.dfsph import DFSPHSolver
from .models.viscosity import XSPHViscosityModel
from .models.wcsph import WCSPHSolver
from .render.camera import Camera
from .render.renderer import ParticleRenderer, Recorder
from .timemanager import (
    AdaptiveTimeStep,
    SimulationStepResult,
    TimeManager,
    TimerConfig,
)
from .world import FluidParticleWorld

RECORDING_FPS = 60.0  # main.rs:62
SIMULATION_STEP_HISTORY_LENGTH = 80  # main.rs:61


class UpdateMode(enum.Enum):
    REALTIME = enum.auto()
    RECORDING = enum.auto()


def reset_fluid(world: FluidParticleWorld):
    """The reference's default scene (main.rs:177-196): dam-break into a tank with a
    ramp, closed container."""
    world.remove_all_fluid_particles()
    world.remove_all_boundary_particles()

    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 4)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 4)
    world.add_boundary_thick_line((0.0, 0.0), (0.0, 2.5), 4)
    world.add_boundary_thick_line((2.0, 0.0), (2.0, 2.5), 4)

    world.add_boundary_thick_line((0.0, 0.6), (1.75, 0.5), 2)

    # close off the container - stop gap for endlessly falling particles (main.rs:189-192)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 2)
    world.add_boundary_thick_line((-2.0, -0.5), (4.0, -0.5), 4)


def default_world(particle_density: float = 10000.0) -> FluidParticleWorld:
    """Reference fluid constants (main.rs:85-89): smoothing factor 2, 10000
    particles/m^2, rho0 = 100 kg/m^2."""
    world = FluidParticleWorld(2.0, particle_density, 100.0)
    reset_fluid(world)
    return world


def _stamp_hud(image: np.ndarray, text: str) -> np.ndarray:
    """Draw the HUD text block into the frame (PIL; no-op if PIL is missing)."""
    try:
        from PIL import Image, ImageDraw
    except ImportError:  # pragma: no cover
        return image
    img = Image.fromarray(image)
    draw = ImageDraw.Draw(img)
    draw.multiline_text((8, 8), text, fill=(255, 255, 255))
    return np.asarray(img)


class SimulationApp:
    """Headless MainState (reference: main.rs:45-59, 301-401)."""

    def __init__(
        self,
        solver: str = "dfsph",  # reference default (main.rs:91)
        world: Optional[FluidParticleWorld] = None,
        resolution=(1920, 1080),
        update_mode: UpdateMode = UpdateMode.REALTIME,
        recording_dir: str = "recording",
    ):
        self.world = world if world is not None else default_world()
        h = self.world.properties.smoothing_length

        cfl_factor = {"wcsph": 0.2, "wcsph_dense": 0.2, "wcsph_padded": 0.2,
                      "wcsph_plane": 0.2, "dfsph": 1.5, "dfsph_dense": 1.5,
                      "dfsph_padded": 1.5, "dfsph_plane": 1.5}[solver]
        step_config = AdaptiveTimeStep(
            timestep_max=1.0 / 120.0 / 3.0,  # main.rs:122
            timestep_min=1.0 / 60.0 / 400.0,  # main.rs:123
            cfl_factor=cfl_factor,
            target_frame_length=(
                1.0 / RECORDING_FPS if update_mode == UpdateMode.RECORDING else None
            ),
        )
        viscosity = XSPHViscosityModel(smoothing_length=h)  # main.rs:93
        if solver == "wcsph":
            self.solver = WCSPHSolver(
                viscosity_model=viscosity,
                properties=self.world.properties,
                grid=self.world.grid,
                step_config=step_config,
            )
        elif solver == "dfsph":
            self.solver = DFSPHSolver(
                viscosity_model=viscosity,
                properties=self.world.properties,
                grid=self.world.grid,
                step_config=step_config,
            )
        elif solver in ("dfsph_dense", "dfsph_padded", "dfsph_plane"):
            from .models.dfsph_dense import DFSPHDenseSolver, DFSPHPaddedSolver

            dense_grid = self.world.dense_grid(occupancy=8)
            if solver == "dfsph_plane":
                # plane-resident slot-major Pallas carry; the jitted step
                # compiles real Mosaic kernels (TPU) or interpret-mode
                # inlined kernels (CPU -- slow, test/TPU use only)
                import dataclasses as _dc

                from .models.dfsph_plane import DFSPHPlaneSolver as cls

                dense_grid = _dc.replace(dense_grid, use_pallas_slotmajor=True)
            else:
                cls = (DFSPHPaddedSolver if solver == "dfsph_padded"
                       else DFSPHDenseSolver)
            self.solver = cls(
                viscosity_model=viscosity,
                properties=self.world.properties,
                grid=dense_grid,
                step_config=step_config,
            )
        elif solver in ("wcsph_dense", "wcsph_padded", "wcsph_plane"):
            from .models.wcsph_dense import WCSPHDenseSolver, WCSPHPaddedSolver

            dense_grid = self.world.dense_grid(occupancy=8)
            if solver == "wcsph_plane":
                import dataclasses as _dc

                from .models.wcsph_plane import WCSPHPlaneSolver as wcls

                dense_grid = _dc.replace(dense_grid, use_pallas_slotmajor=True)
            else:
                wcls = (WCSPHPaddedSolver if solver == "wcsph_padded"
                        else WCSPHDenseSolver)
            self.solver = wcls(
                viscosity_model=viscosity,
                properties=self.world.properties,
                grid=dense_grid,
                step_config=step_config,
            )
        else:
            raise ValueError(f"unknown solver {solver!r}")
        self.solver_name = solver

        self.time_manager = TimeManager(
            TimerConfig(
                step_config=step_config,
                max_simulated_time_per_frame=1.0 / 30.0,  # main.rs:128
            )
        )
        self.update_mode = update_mode

        self.camera = Camera.center_around_world_rect(
            (0.0, 0.0, float(resolution[0]), float(resolution[1])),
            (-0.1, -0.1, 2.1, 1.6),  # main.rs:141
        )
        self.renderer = ParticleRenderer(
            camera=self.camera,
            particle_radius=self.world.properties.particle_radius,
            resolution=resolution,
        )
        self.recorder = Recorder(recording_dir)

        self.step_duration_history = collections.deque(
            maxlen=SIMULATION_STEP_HISTORY_LENGTH
        )
        self.warnings = collections.deque(maxlen=100)
        self.show_hud = False
        self.simulation_processing_time_total = 0.0
        self.simulation_is_realtime = True
        self.last_diagnostics = None

        self._jitted_step = jax.jit(self.solver.step, donate_argnums=0)
        if solver in ("dfsph_dense", "dfsph_padded", "wcsph_dense",
                      "wcsph_padded", "dfsph_plane", "wcsph_plane"):
            self.boundary = self.world.boundary_dense(self.solver.grid)
            if solver.endswith("_plane"):
                self.boundary = self.solver.boundary_planes(self.boundary)
        else:
            self.boundary = self.world.boundary_grid()
        # boundary positions for rendering, independent of the solver's index space
        self._boundary_render_positions = self.world.host_boundary_positions()
        self._init_carry()

    def _init_carry(self):
        state = self.world.initial_state()
        if self.solver_name in ("dfsph", "dfsph_dense", "dfsph_padded",
                                "dfsph_plane", "wcsph_plane"):
            self.carry = self.solver.init_carry(state, self.boundary)
        else:  # wcsph variants carry no boundary-dependent warm state
            self.carry = self.solver.init_carry(state)
        self.carry = self.carry._replace(time=self.time_manager.time_state)

    def reset_simulation(self):
        """reference: main.rs:292-298."""
        self.time_manager.restart()
        self.simulation_processing_time_total = 0.0
        self._init_carry()

    def set_update_mode(self, mode: UpdateMode, reset: bool = True):
        """R-key toggle (main.rs:310-331): switch realtime <-> recording,
        retarget the adaptive dt to exact 1/60 s frame boundaries while
        recording, and reset the simulation like the reference does. The
        retarget is a TRACED scalar in TimeState (TimeState.target_frame_length)
        so toggling mid-run never recompiles the jitted step.

        Documented divergence: main.rs's R-key match arms assign the target to
        the OPPOSITE branch of their own comments (the recording branch sets
        AdaptiveTimeStepTarget::None, the realtime branch sets
        TargetFrameLength, main.rs:312-329) — we implement the commented intent
        ("When doing recording, we want to hit the exact frame times"), not the
        swap."""
        if mode == self.update_mode:
            return
        self.update_mode = mode
        if reset:
            self.reset_simulation()
        target = 1.0 / RECORDING_FPS if mode == UpdateMode.RECORDING else None
        self.time_manager.time_state = (
            self.time_manager.time_state.with_target_frame_length(target)
        )
        self.carry = self.carry._replace(time=self.time_manager.time_state)

    # -------------------------------------------------------------- frame loop

    def single_sim_step(self):
        """reference: main.rs:277-290 (with step-duration history)."""
        t0 = time.perf_counter()
        self.carry = self.carry._replace(time=self.time_manager.time_state)
        self.carry, self.last_diagnostics = self._jitted_step(self.carry, self.boundary)
        self.time_manager.time_state = self.carry.time
        jax.block_until_ready(self.carry)
        dt_wall = time.perf_counter() - t0
        self.step_duration_history.append(dt_wall)
        self.simulation_processing_time_total += dt_wall
        self._check_solver_health()

    def _check_solver_health(self):
        """Solver warnings the reference prints per step (dfsph.rs:236-245, 391-400;
        neighborhood_search.rs:361): iteration caps hit, neighbor overflow, non-finite
        residuals. Counted and printed at most once per frame."""
        d = self.last_diagnostics
        if d is None:
            return
        drops = int(d.neighbor_drops)
        if drops:
            self.warnings.append(f"neighbor overflow: {drops} dropped")
        if hasattr(self.solver, "max_density_iterations"):
            if int(d.density_iterations) > self.solver.max_density_iterations:
                self.warnings.append(
                    f"density loop hit iteration cap "
                    f"(err {float(d.avg_density_error):.4g})"
                )
            if int(d.divergence_iterations) > self.solver.max_divergence_iterations:
                self.warnings.append(
                    f"divergence loop hit iteration cap "
                    f"(err {float(d.avg_divergence):.4g})"
                )
        import math

        if not (math.isfinite(float(d.avg_density_error))
                and math.isfinite(float(d.avg_divergence))):
            self.warnings.append("non-finite solver residual")

    def update(self):
        """One frame's worth of simulation steps (reference: main.rs:339-364)."""
        if self.update_mode == UpdateMode.RECORDING:
            self.time_manager.force_frame_delta(1.0 / RECORDING_FPS)
        while True:
            result = self.time_manager.simulation_frame_loop()
            if result == SimulationStepResult.PERFORM_STEP_AND_CALL_AGAIN:
                self.single_sim_step()
            elif result == SimulationStepResult.CAUGHT_UP_WITH_RENDER_TIME:
                self.simulation_is_realtime = True
                break
            else:  # DROPPING_SIMULATION_STEPS
                self.simulation_is_realtime = False
                break

    def hud_text(self) -> str:
        """The reference HUD (main.rs:198-237): frame processing time, steps per
        frame, average step time over the history window, last dt, total simulated
        vs processed time, and the REALTIME OFF banner."""
        tm = self.time_manager
        avg_step_ms = (
            1e3 * sum(self.step_duration_history) / len(self.step_duration_history)
            if self.step_duration_history else 0.0
        )
        lines = [
            f"frame: {tm.duration_last_frame * 1e3:.2f}ms",
            f"steps/frame: {tm.num_simulation_steps_this_frame}",
            f"avg step: {avg_step_ms:.2f}ms (n={len(self.step_duration_history)})",
            f"dt: {tm.simulation_step * 1e3:.3f}ms",
            f"simulated: {tm.total_simulated_time:.3f}s "
            f"(processing {self.simulation_processing_time_total:.2f}s)",
        ]
        if not self.simulation_is_realtime:
            lines.append("REALTIME OFF")
        if self.warnings:
            lines.append(f"! {self.warnings[-1]}")
        return "\n".join(lines)

    def particle_state(self):
        """Live particle (positions, velocities) as host arrays, whatever the
        carry layout (sorted arrays or the padded-resident slot state)."""
        if hasattr(self.carry, "particles"):
            particles = self.carry.particles
        else:  # padded-resident carry
            particles = self.solver.export_state(self.carry)
        alive = np.asarray(particles.alive)
        return (
            np.asarray(particles.positions)[alive],
            np.asarray(particles.velocities)[alive],
        )

    def draw(self) -> np.ndarray:
        """Read back particle state and rasterize one frame
        (reference: main.rs:366-400)."""
        positions, velocities = self.particle_state()
        image = self.renderer.render(
            positions=positions,
            velocities=velocities,
            boundary_positions=self._boundary_render_positions,
        )
        if self.show_hud:
            image = _stamp_hud(image, self.hud_text())
        if self.update_mode == UpdateMode.RECORDING:
            self.recorder.save_frame(self.time_manager.num_frames_rendered, image)
        self.time_manager.on_frame_presented(1.0)
        return image

    def run(self, num_frames: int):
        """Produce num_frames frames (the reference's event loop, headless)."""
        frames = []
        for _ in range(num_frames):
            self.update()
            frames.append(self.draw())
        self.recorder.flush()  # async PNG writes complete before returning
        return frames
