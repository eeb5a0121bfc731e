"""WCSPH on the dense padded cell grid — TPU fast path.

Same algorithm as models/wcsph.py (Becker & Teschner 2007; reference:
src/sph/solver/wscsph.rs — see that module for the step-by-step mapping): leapfrog,
Tait EOS gamma=7, symmetric pressure force with the Spiky kernel, Poly6 density
kernel, pluggable viscosity, Monaghan-Kajtar boundary penalty. Data layout and pair
machinery are shared with the dense DFSPH solver (ops/dense_grid.py): all pair work
is three fused window passes per step (fluid density; boundary density + penalty
force in one pass; fluid pressure + viscosity forces), no gathers or scatters.

Unlike DFSPH there are no pressure loops, so a WCSPH step is: half-kick + drift,
sort + slot rebuild, density pass, force pass, CFL, second half-kick with the NEW dt
(quirk kept from wscsph.rs:169-178).
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..units import REAL
from ..ops.dense_grid import (
    DenseGridConfig,
    build_slot_grid,
    pad_to_slots,
    pair_reduce,
    rebucket,
    slots_to_sorted,
    sort_by_dense_keys,
)
from ..ops.smoothing_kernels import Poly6, Spiky
from ..timemanager import StepConfig, TimeState, update_simulation_step
from ..utils.diagnostics import Diagnostics
from ..world import GRAVITY, FluidProperties, ParticleState
from .dfsph_dense import BoundaryDense
from .viscosity import ViscosityModel
from .wcsph import TAIT_EQUATION_GAMMA, compute_stiffness, tait_pressure


class WCSPHDenseCarry(NamedTuple):
    particles: ParticleState  # sorted layout
    accelerations: jax.Array  # (N, 2) cached for the leapfrog (wscsph.rs:21-22)
    time: TimeState


@dataclass(frozen=True)
class WCSPHDenseSolver:
    viscosity_model: ViscosityModel
    properties: FluidProperties
    grid: DenseGridConfig
    step_config: StepConfig
    boundary_force_factor: float = 1.0  # wscsph.rs:35
    target_density_variation: float = 0.01
    expected_max_flow_speed: float = 1.0
    gravity: tuple = GRAVITY
    # Band size for the padded-resident re-bucket (None = grid.row_block); its
    # per-band fixed costs differ from the pair passes', so it tunes separately.
    rebucket_row_block: Optional[int] = None

    # see DFSPHDenseSolver._pf_sharded_ok / _pf_bf16_ok
    _pf_sharded_ok = False
    _pf_bf16_ok = False

    def __post_init__(self):
        h = self.properties.smoothing_length
        object.__setattr__(self, "density_kernel", Poly6(h))
        object.__setattr__(self, "pressure_kernel", Spiky(h))
        object.__setattr__(
            self,
            "stiffness",
            compute_stiffness(
                self.properties,
                self.target_density_variation,
                self.expected_max_flow_speed,
            ),
        )
        assert abs(self.grid.cell_size - h) < 1e-12
        if self.grid.use_pallas_slotmajor:
            assert not self.grid.use_pallas, (
                "use_pallas_slotmajor excludes the gen-1 Pallas kernel"
            )
            assert self.grid.halo_axis is None or self._pf_sharded_ok, (
                "the vector-last slot-major (sm_*) path has no halo "
                "collectives; sharded slot-major runs through the plane-form "
                "solvers (parallel/shard_plane.py)"
            )
            assert self.grid.pair_dtype == "float32" or self._pf_bf16_ok, (
                "the vector-last slot-major (sm_*) kernels compute in float32 "
                "planes; bf16 operand planes need the plane-form solvers"
            )
        if self.grid.use_pallas:
            from functools import partial

            from ..ops.pallas_pair import pallas_pair_reduce

            object.__setattr__(
                self, "_reduce",
                partial(pallas_pair_reduce, block_rows=self.grid.pallas_block_rows),
            )
        else:
            object.__setattr__(self, "_reduce", pair_reduce)

    def init_carry(self, state: ParticleState) -> WCSPHDenseCarry:
        """Zero cached accelerations (clear_cached_data, wscsph.rs:122-124)."""
        return WCSPHDenseCarry(
            particles=state,
            accelerations=jnp.zeros_like(state.velocities),
            time=TimeState.initial(self.step_config),
        )

    def _sort(self, pytree, positions, alive):
        return sort_by_dense_keys(pytree, positions, self.grid, alive)

    def _density_and_forces(self, pos_pad, v_pad, mask, boundary: BoundaryDense,
                            dt):
        """The three window passes shared by both carries: Poly6 density with
        self-contribution and clamp (fluidparticleworld.rs:197-231), boundary
        density + Monaghan-Kajtar penalty in one pass (wscsph.rs:108-116), and
        symmetric pressure + viscosity forces (wscsph.rs:59-105). Returns
        (dens_pad, accel_pad) with accel EXCLUDING gravity."""
        g = self.grid
        m = float(self.properties.particle_mass)
        rho0 = self.properties.fluid_density

        sm = flags = None
        if g.use_pallas_slotmajor:
            from ..ops.pallas_slotmajor import (
                build_geom, pass_flags, sm_pair_reduce,
            )

            sm = build_geom(pos_pad, mask, g.pallas_sm_row_block)
            flags = pass_flags(sm, sm)
            (dyn_w,) = sm_pair_reduce(
                lambda dx, dy, r_sq, r, sc, q, s: (
                    self.density_kernel.evaluate(r_sq, r),
                ),
                1, sm, sm, flags, g, g.pallas_sm_row_block,
            )
        else:
            w = lambda ri, r_sq, r: self.density_kernel.evaluate(r_sq, r)
            dyn_w = self._reduce(w, pos_pad, mask, pos_pad, mask, g)

        def stat_terms(ri_to_rj, r_sq, r):
            w_b = self.pressure_kernel.evaluate(r_sq, r)
            c = -self.boundary_force_factor * w_b / r_sq
            return {
                "w": self.density_kernel.evaluate(r_sq, r),
                "force": c[..., None] * ri_to_rj,
            }

        gb = g
        if g.boundary_col_block is not None:
            import dataclasses as _dc

            gb = _dc.replace(g, col_block=g.boundary_col_block)
        stat = self._reduce(stat_terms, pos_pad, mask, boundary.pos_pad,
                            boundary.mask, gb)
        zero = jnp.zeros((), dtype=REAL)
        dens_pad = m * (self.density_kernel.evaluate(zero, zero) + dyn_w + stat["w"])
        dens_pad = jnp.maximum(dens_pad, jnp.asarray(rho0, REAL))

        pres_pad = tait_pressure(self.stiffness, rho0, dens_pad)

        if sm is not None:
            from ..ops.pallas_slotmajor import sm_pair_reduce

            def forces_sm(dx, dy, r_sq, r, scalars, q, s):
                p_i, rho_i, vx_i, vy_i = q
                p_j, rho_j, vx_j, vy_j = s
                coef = -m * (p_i + p_j) / (2.0 * rho_i * rho_j)
                gc = coef * self.pressure_kernel.gradient_coefficient(r_sq, r)
                c = self.viscosity_model.viscous_coefficient(
                    scalars[0], r_sq, r, m, rho_j
                )
                return (
                    gc * dx + c * (vx_j - vx_i),
                    gc * dy + c * (vy_j - vy_i),
                )

            ax, ay = sm_pair_reduce(
                forces_sm, 2, sm, sm, flags, g, g.pallas_sm_row_block,
                q_vals=(pres_pad, dens_pad, v_pad),
                s_vals=(pres_pad, dens_pad, v_pad),
                scalars=(dt,),
            )
            accel_dyn = jnp.stack([ax, ay], axis=-1)
        else:
            def dyn_forces(ri_to_rj, r_sq, r, dt_s, p_i, rho_i, v_i, p_j, rho_j,
                           v_j):
                coef = -m * (p_i + p_j) / (2.0 * rho_i * rho_j)
                f = coef[..., None] * self.pressure_kernel.gradient(
                    ri_to_rj, r_sq, r
                )
                return f + self.viscosity_model.compute_viscous_acceleration(
                    dt_s, r_sq, r, m, rho_j, v_j - v_i
                )

            accel_dyn = self._reduce(
                dyn_forces, pos_pad, mask, pos_pad, mask, g,
                source_values=(pres_pad, dens_pad, v_pad),
                query_values=(pres_pad, dens_pad, v_pad),
                scalar_args=(dt,),
            )
        return dens_pad, accel_dyn + stat["force"]

    def step(self, carry: WCSPHDenseCarry, boundary: BoundaryDense):
        """One simulation step (reference: wscsph.rs:126-179)."""
        g = self.grid
        particles, accel, time_state = carry
        alive = particles.alive
        dt = time_state.dt
        rho0 = self.properties.fluid_density

        # leapfrog part 1 (wscsph.rs:141-151)
        velocities = particles.velocities + 0.5 * dt * accel
        positions = particles.positions + velocities * dt

        # sort + slot rebuild (dead padding particles get sentinel keys and leave
        # the grid entirely). One packed matrix through the sort and ONE banded
        # slot gather for [pos | v] — same gather-cost findings as the DFSPH
        # dense solver (PERF.md round 2: gather cost scales with output rows;
        # empty air bands skip entirely).
        packed = jnp.concatenate(
            [positions, velocities, alive.astype(REAL)[:, None]], axis=1
        )
        (packed,), sorted_keys = self._sort((packed,), packed[:, :2], alive)
        positions = packed[:, :2]
        velocities = packed[:, 2:4]
        alive = packed[:, 4] > 0.5
        slots = build_slot_grid(sorted_keys, g)
        pv_pad = pad_to_slots(packed[:, :4], slots, g, row_block=g.row_block)
        pos_pad = pv_pad[..., :2]
        v_pad = pv_pad[..., 2:4]
        mask = slots.slot_mask.reshape(g.ny, g.nx, g.occupancy)

        dens_pad, accel_pad = self._density_and_forces(
            pos_pad, v_pad, mask, boundary, dt
        )
        # ONE packed unpad for [accel | density]
        out_pad = jnp.concatenate([accel_pad, dens_pad[..., None]], axis=-1)
        zeros1 = jnp.zeros_like(positions[:, :1])
        fb = jnp.concatenate(
            [zeros1, zeros1, jnp.full_like(zeros1, rho0)], axis=1
        )
        out = slots_to_sorted(out_pad, slots, g, fallback=fb)
        densities = out[..., 2]
        accel = out[..., :2] + jnp.asarray(self.gravity, dtype=REAL)[None, :]
        # dead (padding) particles are frozen: no gravity, no advection
        accel = jnp.where(alive[:, None], accel, 0.0)

        # CFL with the *old* dt estimate (wscsph.rs:158-167); live particles only
        v_estimate = velocities + accel * dt
        v_est_sq = jnp.where(alive, jnp.sum(v_estimate * v_estimate, axis=-1), 0.0)
        max_velocity = jnp.sqrt(jnp.max(v_est_sq))
        time_state = update_simulation_step(
            self.step_config, time_state,
            self.properties.particle_radius * 2.0, max_velocity,
        )

        # leapfrog part 2 with the NEW dt (wscsph.rs:169-178)
        velocities = velocities + 0.5 * time_state.dt * accel

        new_carry = WCSPHDenseCarry(
            particles=ParticleState(positions, velocities, densities, alive),
            accelerations=accel,
            time=time_state,
        )
        diagnostics = Diagnostics.zeros()._replace(
            dt=dt,
            max_velocity=max_velocity,
            neighbor_drops=slots.num_dropped + boundary.num_dropped,
        )
        return new_carry, diagnostics

    def simulate(self, carry: WCSPHDenseCarry, boundary: BoundaryDense, num_steps: int):
        """Returned Diagnostics AGGREGATES across all steps (Diagnostics.accumulate)."""

        def body(_, loop_carry):
            c, agg = loop_carry
            c = c._replace(time=c.time.account_step())
            c, diag = self.step(c, boundary)
            return c, agg.accumulate(diag)

        return jax.lax.fori_loop(0, num_steps, body, (carry, Diagnostics.zeros()))


class WCSPHPaddedCarry(NamedTuple):
    """Padded-RESIDENT WCSPH state (see DFSPHPaddedCarry for the rationale:
    nothing leaves the (ny, nx, P) slot layout between steps; the per-step
    rebuild is a windowed re-bucket instead of sort + pad/unpad gathers)."""

    pos_pad: jax.Array  # (ny, nx, P, 2)
    v_pad: jax.Array  # (ny, nx, P, 2)
    accel_pad: jax.Array  # (ny, nx, P, 2) cached for the leapfrog (wscsph.rs:21-22)
    dens_pad: jax.Array  # (ny, nx, P) last computed densities (export/HUD)
    mask: jax.Array  # (ny, nx, P) bool
    time: TimeState


@dataclass(frozen=True)
class WCSPHPaddedSolver(WCSPHDenseSolver):
    """WCSPH with the padded-resident carry — the TPU fast path.

    Same three window passes and reference semantics as WCSPHDenseSolver; the
    sort + pad/unpad layout lifecycle is replaced by ops/dense_grid.rebucket.
    The first leapfrog half-kick runs in the OLD slot layout (the cached
    accelerations never need to cross the rebuild — they are recomputed from
    the new geometry each step, exactly like the sorted path recomputes them
    after its re-sort). Occupancy overflow at re-bucket removes particles
    (counted in Diagnostics.neighbor_drops); healthy runs keep it at zero.
    """

    # --- single-device reduction hooks (the sharded subclass overrides these)

    def _max_velocity(self, vstar_pad, mask):
        v_est_sq = jnp.where(mask, jnp.sum(vstar_pad * vstar_pad, axis=-1), 0.0)
        return jnp.sqrt(jnp.max(v_est_sq))

    def _sum_counts(self, count):
        return count

    def _rebucket_row0(self):
        return None

    def init_carry(self, state: ParticleState, boundary=None) -> WCSPHPaddedCarry:
        """`boundary` is accepted (and ignored) for driver-signature uniformity
        with the DFSPH solvers."""
        g = self.grid
        packed = jnp.concatenate([state.positions, state.velocities], axis=1)
        (packed,), sorted_keys = self._sort(
            (packed,), state.positions, state.alive
        )
        slots = build_slot_grid(sorted_keys, g)
        pv_pad = pad_to_slots(packed, slots, g)
        mask = slots.slot_mask.reshape(g.ny, g.nx, g.occupancy)
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        return WCSPHPaddedCarry(
            pos_pad=pv_pad[..., :2],
            v_pad=jnp.where(mask[..., None], pv_pad[..., 2:4], 0.0),
            accel_pad=jnp.zeros_like(pv_pad[..., :2]),
            dens_pad=jnp.full((g.ny, g.nx, g.occupancy), rho0, dtype=REAL),
            mask=mask,
            time=TimeState.initial(self.step_config),
        )

    def export_state(self, carry: WCSPHPaddedCarry) -> ParticleState:
        """Flat slot-order view for host/app boundaries (N = ny*nx*P rows)."""
        mask = carry.mask.reshape(-1)
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        return ParticleState(
            positions=carry.pos_pad.reshape(-1, 2),
            velocities=jnp.where(mask[:, None], carry.v_pad.reshape(-1, 2), 0.0),
            densities=jnp.where(mask, carry.dens_pad.reshape(-1), rho0),
            alive=mask,
        )

    def step(self, carry: WCSPHPaddedCarry, boundary: BoundaryDense):
        """One simulation step (reference: wscsph.rs:126-179), fully padded."""
        g = self.grid
        time_state = carry.time
        dt = time_state.dt
        mask = carry.mask

        # leapfrog part 1 in the OLD layout (wscsph.rs:141-151)
        v_pad = carry.v_pad + 0.5 * dt * carry.accel_pad
        pos_pad = carry.pos_pad + v_pad * dt

        # neighborhood rebuild = windowed re-bucket (wscsph.rs:153)
        with jax.named_scope("NeighborhoodSearch.update_dynamic"):
            if g.use_pallas_slotmajor:
                from ..ops.pallas_slotmajor import sm_rebucket

                pos_pad, mask, v_ext, drops = sm_rebucket(
                    pos_pad, mask, v_pad, g,
                    br=self.rebucket_row_block or g.pallas_sm_row_block,
                )
            else:
                pos_pad, mask, v_ext, drops = rebucket(
                    pos_pad, mask, v_pad, g,
                    row_block=self.rebucket_row_block or g.row_block,
                    row0=self._rebucket_row0(),
                )
        v_pad = v_ext

        dens_pad, accel_pad = self._density_and_forces(
            pos_pad, v_pad, mask, boundary, dt
        )
        gvec = jnp.asarray(self.gravity, dtype=REAL)
        # dead slots stay frozen: no gravity, no advection
        accel_pad = jnp.where(mask[..., None], accel_pad + gvec, 0.0)

        # CFL with the *old* dt estimate (wscsph.rs:158-167)
        vstar_pad = v_pad + accel_pad * dt
        max_velocity = self._max_velocity(vstar_pad, mask)
        time_state = update_simulation_step(
            self.step_config, time_state,
            self.properties.particle_radius * 2.0, max_velocity,
        )

        # leapfrog part 2 with the NEW dt (wscsph.rs:169-178)
        v_pad = v_pad + 0.5 * time_state.dt * accel_pad

        new_carry = WCSPHPaddedCarry(
            pos_pad=pos_pad,
            v_pad=v_pad,
            accel_pad=accel_pad,
            dens_pad=dens_pad,
            mask=mask,
            time=time_state,
        )
        diagnostics = Diagnostics.zeros()._replace(
            dt=dt,
            max_velocity=max_velocity,
            neighbor_drops=self._sum_counts(drops) + boundary.num_dropped,
        )
        return new_carry, diagnostics
