"""WCSPH with a plane-RESIDENT carry — the zero-transpose slot-major path.

Same algorithm, ordering, and reference semantics as WCSPHPaddedSolver
(reference: src/sph/solver/wscsph.rs:126-179 — see models/wcsph.py for the
step-by-step mapping); only the resident layout differs, exactly as
DFSPHPlaneSolver relates to DFSPHPaddedSolver (see models/dfsph_plane.py for
the layout rationale). State lives permanently in plane form

    scalar field (P, NYP, NXP)      vector field (2, P, NYP, NXP)

so the three per-step pair passes (fluid Poly6 density; boundary density +
Monaghan-Kajtar penalty, here folded into ONE pf kernel against the boundary's
prebuilt plane geometry; symmetric pressure + viscosity forces) block their
query operands by pure reshape, and the neighborhood rebuild is pf_rebucket.

As in the DFSPH plane solver, moving the fluid-boundary pass from the XLA
pair_reduce into the kernel changes the f32 accumulation order of boundary
sums — agreement with the padded slot-major solver is to float32 drift, not
bitwise (tests/test_wcsph_plane.py). Single-device only (no halo collectives).
"""

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.pallas_slotmajor import (
    from_planes,
    pass_flags,
    pf_build_geom,
    pf_pair_reduce,
    pf_rebucket,
    to_planes,
)
from ..timemanager import TimeState, update_simulation_step
from ..units import REAL
from ..utils.diagnostics import Diagnostics
from ..world import ParticleState
from .dfsph_dense import BoundaryDense
from .dfsph_plane import BoundaryPlanes
from .wcsph import tait_pressure
from .wcsph_dense import WCSPHPaddedSolver


class WCSPHPlaneCarry(NamedTuple):
    """Plane-form twin of WCSPHPaddedCarry."""

    pos: jax.Array  # (2, P, NYP, NXP)
    v: jax.Array  # (2, P, NYP, NXP)
    accel: jax.Array  # (2, P, NYP, NXP) cached for the leapfrog (wscsph.rs:21-22)
    dens: jax.Array  # (P, NYP, NXP) last computed densities (export/HUD)
    mask: jax.Array  # (P, NYP, NXP) bool
    time: TimeState


@dataclass(frozen=True)
class WCSPHPlaneSolver(WCSPHPaddedSolver):
    """WCSPH, plane-resident slot-major carry. Requires
    grid.use_pallas_slotmajor=True (single device)."""

    # pf kernels support bf16 operand planes (ops/pallas_slotmajor._pf_dtype)
    _pf_bf16_ok = True

    def __post_init__(self):
        super().__post_init__()
        assert self.grid.use_pallas_slotmajor, (
            "WCSPHPlaneSolver is the plane-resident slot-major path; set "
            "DenseGridConfig.use_pallas_slotmajor=True"
        )

    @property
    def _br(self) -> int:
        return self.grid.pallas_sm_row_block

    def _max_vel_from_sq(self, v_est_sq):
        """CFL estimate from the (P, NYP, NXP) squared-speed plane (the plane
        twin of _max_velocity; the sharded subclass pmaxes it)."""
        return jnp.sqrt(jnp.max(v_est_sq))

    # ------------------------------------------------------------- boundaries

    def boundary_planes(self, boundary: BoundaryDense) -> BoundaryPlanes:
        """Plane-form blocked boundary geometry; call once per boundary change
        (host-side, outside the jitted step)."""
        g = self.grid
        pos = to_planes(boundary.pos_pad, g, self._br)
        mask = to_planes(boundary.mask, g, self._br).astype(bool)
        return BoundaryPlanes(
            dense=boundary, geom=pf_build_geom(pos, mask, self._br, grid=g)
        )

    # ------------------------------------------------------------- host bounds

    def init_carry(self, state: ParticleState, boundary=None) -> WCSPHPlaneCarry:
        """`boundary` may be None, a BoundaryDense, or a prebuilt BoundaryPlanes
        (accepted for driver-signature uniformity; the carry never needs it —
        WCSPH caches only accelerations, zeroed here per wscsph.rs:122-124)."""
        base = WCSPHPaddedSolver.init_carry(self, state)
        g = self.grid
        br = self._br
        return WCSPHPlaneCarry(
            pos=to_planes(base.pos_pad, g, br),
            v=to_planes(base.v_pad, g, br),
            accel=to_planes(base.accel_pad, g, br),
            dens=to_planes(base.dens_pad, g, br),
            mask=to_planes(base.mask, g, br).astype(bool),
            time=base.time,
        )

    def export_state(self, carry: WCSPHPlaneCarry) -> ParticleState:
        """Flat slot-order view (matches WCSPHPaddedSolver.export_state row
        order: N = ny*nx*P with the slot mask as `alive`)."""
        g = self.grid
        mask = from_planes(carry.mask.astype(REAL), g).reshape(-1) > 0.5
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        return ParticleState(
            positions=from_planes(carry.pos, g).reshape(-1, 2),
            velocities=jnp.where(
                mask[:, None], from_planes(carry.v, g).reshape(-1, 2), 0.0
            ),
            densities=jnp.where(
                mask, from_planes(carry.dens, g).reshape(-1), rho0
            ),
            alive=mask,
        )

    # -------------------------------------------------------------------- step

    def step(self, carry: WCSPHPlaneCarry, boundary: BoundaryPlanes):
        """One simulation step, ordering identical to WCSPHPaddedSolver.step
        (reference: wscsph.rs:126-179), everything in plane form."""
        g = self.grid
        time_state = carry.time
        dt = time_state.dt
        m = float(self.properties.particle_mass)
        rho0 = self.properties.fluid_density

        # leapfrog part 1 in the OLD layout (wscsph.rs:141-151)
        v = carry.v + 0.5 * dt * carry.accel
        pos = carry.pos + v * dt

        # neighborhood rebuild = plane-form re-bucket (wscsph.rs:153)
        with jax.named_scope("NeighborhoodSearch.update_dynamic"):
            pos, mask, v, drops = pf_rebucket(
                pos, carry.mask, v, g,
                br=self.rebucket_row_block or self._br,
                row0=self._rebucket_row0(),
            )

        # density passes (fluidparticleworld.rs:197-231 + wscsph.rs:108-116)
        geom = pf_build_geom(pos, mask, self._br, grid=g)
        flags = pass_flags(geom, geom, g)
        with jax.named_scope("FluidParticleWorld.update_densities"):
            (dyn_w,) = pf_pair_reduce(
                lambda dx, dy, r_sq, r, sc, q, s: (
                    self.density_kernel.evaluate(r_sq, r),
                ),
                1, geom, geom, flags, g, self._br,
            )

            def stat_terms(dx, dy, r_sq, r, sc, q, s):
                w_b = self.pressure_kernel.evaluate(r_sq, r)
                c = -self.boundary_force_factor * w_b / r_sq
                return (self.density_kernel.evaluate(r_sq, r), c * dx, c * dy)

            # boundary-source pass: finer chunks skip source-empty interior
            # columns (see dense_grid.pallas_pf_stat_chunk_lanes)
            stat_kw = g.pf_stat_chunk_kw
            stat = pf_pair_reduce(
                stat_terms, 3, geom, boundary.geom,
                pass_flags(geom, boundary.geom, g), g, self._br, **stat_kw,
            )
        zero = jnp.zeros((), dtype=REAL)
        dens = m * (self.density_kernel.evaluate(zero, zero) + dyn_w + stat[0])
        dens = jnp.maximum(dens, jnp.asarray(rho0, REAL))
        pres = tait_pressure(self.stiffness, rho0, dens)

        # symmetric pressure + viscosity forces (wscsph.rs:59-105)
        with jax.named_scope("WCSPH.update_accellerations"):

            def force_terms(dx, dy, r_sq, r, scalars, q, s):
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

            accel = pf_pair_reduce(
                force_terms, 2, geom, geom, flags, g, self._br,
                q_vals=(pres, dens, v), s_vals=(pres, dens, v), scalars=(dt,),
            )
        gvec = jnp.asarray(self.gravity, dtype=REAL).reshape(2, 1, 1, 1)
        # dead slots stay frozen: no gravity, no advection
        accel = jnp.where(mask[None], accel + stat[1:3] + gvec, 0.0)

        # CFL with the *old* dt estimate (wscsph.rs:158-167)
        vstar = v + accel * dt
        v_est_sq = jnp.where(mask, jnp.sum(vstar * vstar, axis=0), 0.0)
        max_velocity = self._max_vel_from_sq(v_est_sq)
        time_state = update_simulation_step(
            self.step_config, time_state,
            self.properties.particle_radius * 2.0, max_velocity,
        )

        # leapfrog part 2 with the NEW dt (wscsph.rs:169-178)
        v = v + 0.5 * time_state.dt * accel

        new_carry = WCSPHPlaneCarry(
            pos=pos, v=v, accel=accel, dens=dens, mask=mask, time=time_state
        )
        diagnostics = Diagnostics.zeros()._replace(
            dt=dt,
            max_velocity=max_velocity,
            neighbor_drops=self._sum_counts(drops) + boundary.dense.num_dropped,
        )
        return new_carry, diagnostics
