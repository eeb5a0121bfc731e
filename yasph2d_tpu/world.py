"""Particle world: state pytree, fluid constants, scene construction, density update.

TPU-native counterpart of the reference's `FluidParticleWorld`
(reference: src/sph/fluidparticleworld.rs). The mutable AoS-of-SoA `Vec`s become an
immutable `ParticleState` pytree of `(N, 2)` / `(N,)` float32 arrays; scene
construction happens host-side in numpy and `commit()`s to device arrays; the density
summation and neighborhood orchestration are pure jittable functions.

Deliberate divergences from the reference (SURVEY.md section 7 "quirks to NOT
replicate"): `remove_all_boundary_particles` does not clear fluid velocities (the
reference's copy-paste bug at fluidparticleworld.rs:134-137).
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .units import REAL
from .ops import pair
from .ops.neighborhood import (
    CellGrid,
    GridConfig,
    Neighborhood,
    build_cell_grid,
    build_neighborhood,
    sort_by_cell_keys,
)
from .ops.smoothing_kernels import SmoothingKernel

GRAVITY = (0.0, -9.81)  # reference: fluidparticleworld.rs:123


@dataclass(frozen=True)
class FluidProperties:
    """Constant fluid properties (reference: ConstantFluidProperties,
    fluidparticleworld.rs:46-90). Hashable; folds into jit as static config."""

    smoothing_factor: float
    particle_density: float  # particles / m^2 for the resting fluid
    fluid_density: float  # kg / m^2 for the resting fluid (rho0)

    @property
    def particle_radius(self) -> float:
        # fluidparticleworld.rs:82-85: density is per m^2
        return 0.5 / float(np.sqrt(self.particle_density))

    @property
    def smoothing_length(self) -> float:
        # fluidparticleworld.rs:58: h = 2 * r * smoothing_factor
        return 2.0 * self.particle_radius * self.smoothing_factor

    @property
    def particle_mass(self) -> float:
        # fluidparticleworld.rs:74-76
        return self.fluid_density / self.particle_density

    @property
    def num_particles_per_meter(self) -> float:
        return float(np.sqrt(self.particle_density))


class ParticleState(NamedTuple):
    """Dynamic (fluid) particle state. All leaves share the leading dimension N and
    are co-sorted on every neighborhood rebuild.

    `alive` marks real particles; padding particles (added so N divides a device
    mesh, `pad_particles_dense`) are dead: solvers freeze them (zero acceleration,
    no advection), exclude them from the CFL max-velocity estimate and from the
    DFSPH residual averages, and the dense backend drops them from the cell grid
    entirely (sentinel cell keys). The reference has no such concept — its particle
    count is always exact."""

    positions: jax.Array  # (N, 2) f32
    velocities: jax.Array  # (N, 2) f32
    densities: jax.Array  # (N,) f32
    alive: jax.Array  # (N,) bool


def pad_particles_dense(state: ParticleState, multiple: int, grid) -> ParticleState:
    """Pad a ParticleState so N divides a device-mesh size (dense-grid backends).

    Padding particles are DEAD (alive == False): the dense backends assign them
    sentinel cell keys so they never occupy a slot, never interact, and the
    solvers freeze them (zero acceleration, excluded from the CFL max-velocity
    estimate and the residual averages) — a padded run's dt and residuals are
    identical to the unpadded run's (tests/test_diagnostics.py pins this). The
    park position below the domain is therefore cosmetic. `grid` is a
    DenseGridConfig."""
    n = state.positions.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return state
    h = grid.cell_size
    # park positions may overlap freely: dead particles never enter the grid
    xs = grid.origin[0] + (0.5 + np.arange(pad, dtype=np.float32) % grid.nx) * h
    ys = np.full((pad,), grid.origin[1] + 0.5 * h, dtype=np.float32)
    park = np.stack([xs, ys], axis=-1)
    return ParticleState(
        positions=jnp.concatenate([state.positions, jnp.asarray(park)], axis=0),
        velocities=jnp.concatenate(
            [state.velocities, jnp.zeros((pad, 2), state.velocities.dtype)], axis=0
        ),
        densities=jnp.concatenate(
            [state.densities, jnp.zeros((pad,), state.densities.dtype)], axis=0
        ),
        alive=jnp.concatenate([state.alive, jnp.zeros((pad,), bool)], axis=0),
    )


def sort_particles(pytree, positions: jax.Array, grid: GridConfig):
    """Sort a particle-attribute pytree into cell order keyed on `positions`.

    Key behavioral contract carried over from the reference
    (fluidparticleworld.rs:235-261): EVERY leaf of the pytree is permuted, so particle
    identity is not stable across steps. Solvers with persistent per-particle state
    (DFSPH warm-start kappa/stiffness, alpha factors) must include it in `pytree`.

    Returns (sorted_pytree, sorted_keys, perm).
    """
    sorted_keys, perm = sort_by_cell_keys(positions, grid)
    sorted_pytree = jax.tree_util.tree_map(lambda a: a[perm], pytree)
    return sorted_pytree, sorted_keys, perm


def update_densities(
    positions: jax.Array,
    neighborhood: Neighborhood,
    boundary_positions: jax.Array,
    kernel: SmoothingKernel,
    mass: float,
    fluid_density: float,
) -> jax.Array:
    """Density summation with self-contribution and rho >= rho0 clamp
    (reference: FluidParticleWorld::update_densities, fluidparticleworld.rs:197-231).
    """
    m = jnp.asarray(mass, dtype=REAL)

    def contribution(source_positions, table):
        nbr_pos = pair.gather(source_positions, table.idx)
        _, r_sq, r = pair.pair_geometry(positions, nbr_pos)
        return pair.masked_sum(kernel.evaluate(r_sq, r), table.mask)

    zero = jnp.zeros((), dtype=REAL)
    density = kernel.evaluate(zero, zero) * m  # self-contribution
    density = density + m * contribution(positions, neighborhood.dynamic)
    density = density + m * contribution(boundary_positions, neighborhood.static)
    # Density clamp works around the particle deficiency problem
    # (fluidparticleworld.rs:227-229, via SPlisHSPlasH issue #36).
    return jnp.maximum(density, jnp.asarray(fluid_density, dtype=REAL))


class FluidParticleWorld:
    """Host-side scene owner: builds particle arrays, owns static device data.

    Mirrors the reference's FluidParticleWorld API (fluidparticleworld.rs:92-262) but
    splits host-side scene construction (numpy, mutable) from device-side state
    (immutable pytrees handed to solvers).
    """

    def __init__(
        self,
        smoothing_factor: float,
        particle_density: float,
        fluid_density: float,
        grid: Optional[GridConfig] = None,
    ):
        self.properties = FluidProperties(
            smoothing_factor=smoothing_factor,
            particle_density=particle_density,
            fluid_density=fluid_density,
        )
        self.grid = grid or GridConfig(cell_size=self.properties.smoothing_length)
        assert abs(self.grid.cell_size - self.properties.smoothing_length) < 1e-12, (
            "cell size must equal the smoothing length (search radius)"
        )
        self.gravity = np.asarray(GRAVITY, dtype=np.float32)

        self._positions: list = []  # list of (n, 2) float32 chunks
        self._boundary: list = []
        self.boundary_changed = True
        self._boundary_grid: Optional[CellGrid] = None

    # ---------------------------------------------------------------- scene API

    def remove_all_fluid_particles(self):
        self._positions = []

    def remove_all_boundary_particles(self):
        self._boundary = []
        self.boundary_changed = True

    def add_fluid_rect(self, fluid_rect, jitter_amount: float):
        """Fill an axis-aligned rect (x, y, w, h) with a jittered particle lattice.

        Reference: fluidparticleworld.rs:140-166. The lattice density is de-rated by
        0.9 to avoid startup explosions; jitter uses a seeded RNG keyed on the current
        particle count so scenes are deterministic.
        """
        x, y, w, h = (float(v) for v in fluid_rect)
        num_per_meter = self.properties.num_particles_per_meter * 0.9
        nx = max(1, int(w * num_per_meter))
        ny = max(1, int(h * num_per_meter))

        seed = sum(c.shape[0] for c in self._positions)
        rng = np.random.default_rng(seed)

        step = min(w / nx, h / ny)
        jitter_factor = step * float(jitter_amount)
        gx, gy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
        lattice = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32) * step
        # jitter in [0.5, 1.0) * jitter_factor per axis (fluidparticleworld.rs:158)
        jitter = (rng.random((nx * ny, 2), dtype=np.float32) * 0.5 + 0.5) * jitter_factor
        self._positions.append(np.asarray([x, y], dtype=np.float32) + lattice + jitter)

    def add_boundary_line(self, start, end):
        """One row of static boundary ('shadow') particles from start to end
        (reference: fluidparticleworld.rs:177-195)."""
        start = np.asarray(start, dtype=np.float64)
        end = np.asarray(end, dtype=np.float64)
        distance = float(np.linalg.norm(end - start))
        npm = self.properties.num_particles_per_meter
        count = max(1, int(np.ceil(distance * npm)))
        step = (end - start) / distance / npm
        offsets = np.arange(count, dtype=np.float64)[:, None] * step[None, :]
        self._boundary.append((start[None, :] + offsets).astype(np.float32))
        self.boundary_changed = True

    def add_boundary_thick_line(self, start, end, thickness_in_particles: int):
        """Multiple parallel boundary lines forming a thick wall
        (reference: fluidparticleworld.rs:168-176)."""
        start = np.asarray(start, dtype=np.float64)
        end = np.asarray(end, dtype=np.float64)
        direction = end - start
        direction = direction / np.linalg.norm(direction)
        perpendicular = np.asarray([-direction[1], direction[0]])
        thickness_world = thickness_in_particles / self.properties.num_particles_per_meter
        elongation = direction * thickness_world
        offset = -perpendicular * thickness_world
        step = perpendicular * thickness_world / thickness_in_particles
        for _ in range(thickness_in_particles):
            self.add_boundary_line(start + offset, end + offset + elongation)
            offset = offset + step

    # ------------------------------------------------------------- device state

    @property
    def num_dynamic_particles(self) -> int:
        return int(sum(c.shape[0] for c in self._positions))

    @property
    def num_boundary_particles(self) -> int:
        return int(sum(c.shape[0] for c in self._boundary))

    def host_positions(self) -> np.ndarray:
        if self._positions:
            return np.concatenate(self._positions, axis=0)
        return np.zeros((0, 2), dtype=np.float32)

    def host_boundary_positions(self) -> np.ndarray:
        if self._boundary:
            return np.concatenate(self._boundary, axis=0)
        return np.zeros((0, 2), dtype=np.float32)

    def initial_state(self) -> ParticleState:
        """Device-side fluid state for the current scene (velocities zero,
        densities zero until the first neighborhood+density update)."""
        pos = jnp.asarray(self.host_positions(), dtype=REAL)
        n = pos.shape[0]
        return ParticleState(
            positions=pos,
            velocities=jnp.zeros((n, 2), dtype=REAL),
            densities=jnp.zeros((n,), dtype=REAL),
            alive=jnp.ones((n,), dtype=bool),
        )

    def boundary_grid(self) -> CellGrid:
        """Sorted static index space; rebuilt lazily when the boundary changed
        (reference: boundary_changed dirty flag, fluidparticleworld.rs:101,247-252)."""
        if self.boundary_changed or self._boundary_grid is None:
            boundary = jnp.asarray(self.host_boundary_positions(), dtype=REAL)
            self._boundary_grid = build_cell_grid(boundary, self.grid)
            self.boundary_changed = False
        return self._boundary_grid

    # Dynamic headroom over the scene's INITIAL max cell occupancy. Calibrated on
    # the double dam-break bench scenes at 10k/100k/1M: initial max is 4 at every
    # size, and occupancy sweeps found 7 (= 1.75x) the smallest slot count with
    # zero drops over 600-step runs (6 = 1.5x showed transient drops on impact).
    # Impacts compress the fluid past its derated starting lattice; 1.75x covers
    # that compression plus sloshing transients.
    DENSE_OCCUPANCY_HEADROOM = 1.75

    def dense_grid(self, occupancy: Optional[int] = None, margin_cells: int = 2,
                   ny_multiple: int = 1):
        """DenseGridConfig covering the scene's bounding box (fluid + boundary) with
        a safety margin, for the dense-layout fast path (ops/dense_grid.py).

        `occupancy=None` derives the slot count from the scene's initial packing
        (max particles in any cell, times DENSE_OCCUPANCY_HEADROOM) — the fluid
        analog of the boundary slot-axis auto-fit (build_boundary_dense). A denser
        scene automatically gets deeper cells instead of silently dropping
        neighbors; cell overflow is still counted in Diagnostics either way.

        `ny_multiple`: round the cell-row count up so the ny axis divides a device
        mesh (spatial sharding shards cell rows across chips)."""
        from .ops.dense_grid import DenseGridConfig

        fluid = self.host_positions()
        pts = [fluid, self.host_boundary_positions()]
        pts = np.concatenate([p for p in pts if p.shape[0]], axis=0)
        assert pts.shape[0] > 0, "empty scene"
        h = self.properties.smoothing_length
        lo = np.floor(pts.min(axis=0) / h) - margin_cells
        hi = np.ceil(pts.max(axis=0) / h) + margin_cells
        nx = int(hi[0] - lo[0])
        ny = int(hi[1] - lo[1])
        ny += (-ny) % ny_multiple

        if occupancy is None:
            if fluid.shape[0]:
                cx = np.clip(
                    np.floor(fluid[:, 0] / h).astype(np.int64) - int(lo[0]),
                    0, nx - 1,
                )
                cy = np.clip(
                    np.floor(fluid[:, 1] / h).astype(np.int64) - int(lo[1]),
                    0, ny - 1,
                )
                initial_max = int(np.bincount(cy * nx + cx).max())
            else:
                initial_max = 1
            occupancy = max(
                int(np.ceil(initial_max * self.DENSE_OCCUPANCY_HEADROOM)), 4
            )

        return DenseGridConfig(
            cell_size=h,
            origin=(float(lo[0] * h), float(lo[1] * h)),
            nx=nx,
            ny=ny,
            occupancy=occupancy,
        )

    def boundary_dense(self, grid, occupancy=None):
        """Dense-layout static index space for the dense solver. None = size the
        slot axis to the boundary's exact max cell occupancy (static geometry)."""
        from .models.dfsph_dense import build_boundary_dense

        boundary = jnp.asarray(self.host_boundary_positions(), dtype=REAL)
        return build_boundary_dense(boundary, grid, occupancy)


def update_neighborhood(pytree, positions: jax.Array, boundary: CellGrid, grid: GridConfig):
    """Sort a particle pytree into cell order and rebuild both neighbor tables.

    Device-side equivalent of FluidParticleWorld::update_neighborhood_datastructure
    (fluidparticleworld.rs:235-261): `positions` must be a leaf of `pytree` so it is
    co-sorted. Returns (sorted_pytree, sorted_positions, neighborhood).
    """
    sorted_pytree, sorted_keys, perm = sort_particles(pytree, positions, grid)
    sorted_positions = positions[perm]
    neighborhood = build_neighborhood(sorted_positions, sorted_keys, boundary, grid)
    return sorted_pytree, sorted_positions, neighborhood
