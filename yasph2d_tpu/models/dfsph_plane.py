"""DFSPH with a plane-RESIDENT carry — the zero-transpose slot-major path.

Same algorithm, ordering, and reference semantics as DFSPHPaddedSolver
(reference: src/sph/solver/dfsph.rs:414-525 — see models/dfsph.py for the
step-by-step mapping); only the resident layout differs. The padded solver
holds (ny, nx, P) slot arrays and converts to (P, ny, nx) planes around every
slot-major Pallas kernel call — the measured whole-step gain of the kernels
(1.15x at 1M) was far below their per-band gain (2.86x) because each of the
~8 pair passes per step pays full-array layout flips (PERF.md round 3). Here
the state itself lives in plane form:

    scalar field (P, NYP, NXP)      vector field (2, P, NYP, NXP)
    NYP = ceil(ny/BR)*BR            NXP = ceil(nx/128)*128

with the padding region permanently dead (mask False), so

  - query operands of every pair pass are a RESHAPE of the resident arrays;
  - kernel outputs (ops/pallas_slotmajor.pf_pair_reduce) come back stacked in
    plane form — a vector result's components are adjacent leading planes;
  - the per-step neighborhood rebuild is pf_rebucket, consuming and producing
    plane form;
  - the fluid-vs-boundary ctx pass runs in the SAME kernel against a
    boundary PFGeom built once at scene build (thin-shell skipping falls out
    of the per-band flags);
  - only source-window materialization remains (overlap forces it), and that
    is a pad + row-window stack of contiguous rows — no transpose.

Layout conversions survive only at host boundaries (init_carry, export_state).
Single-device only, like every slot-major path (no halo collectives).

Validated against DFSPHPaddedSolver(use_pallas_slotmajor=True) in
tests/test_plane_solver.py: identical iteration counts and drops, trajectories
equal to f32 reduction-order tolerance (the boundary ctx pass accumulates in
kernel band order instead of XLA reduce order).
"""

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.dense_grid import DenseGridConfig
from ..ops.pallas_slotmajor import (
    PFGeom,
    from_planes,
    pass_flags,
    pf_build_geom,
    pf_dims,
    pf_pair_reduce,
    pf_rebucket,
    to_planes,
)
from ..timemanager import TimeState, update_simulation_step
from ..units import REAL
from ..utils.diagnostics import Diagnostics
from ..world import ParticleState
from .dfsph_dense import (
    ALPHA_EPSILON,
    BoundaryDense,
    DFSPHPaddedSolver,
)


class BoundaryPlanes(NamedTuple):
    """Static index space for the plane solver: the dense build plus its
    plane-form blocked geometry (built once per boundary change, host-side)."""

    dense: BoundaryDense
    geom: PFGeom


class PlaneCtx(NamedTuple):
    """Per-rebuild pair context in plane form (the PlaneCtx twin of DenseCtx)."""

    geom: PFGeom  # blocked fluid geometry, shared by every pass this rebuild
    flags_dyn: jax.Array  # (nbr, 1) int32 fluid-fluid band skip flags
    pos: jax.Array  # (2, P, NYP, NXP)
    mask: jax.Array  # (P, NYP, NXP) bool
    sum_grad_stat: jax.Array  # (2, P, NYP, NXP): sum grad W to boundary
    neighbor_total: jax.Array  # (P, NYP, NXP) f32
    densities: jax.Array  # (P, NYP, NXP) clamped density
    alpha: jax.Array  # (P, NYP, NXP)
    num_dropped: jax.Array  # () int32


class DFSPHPlaneCarry(NamedTuple):
    ctx: PlaneCtx
    v: jax.Array  # (2, P, NYP, NXP)
    kappa: jax.Array  # (P, NYP, NXP) density-loop warm start
    stiff: jax.Array  # (P, NYP, NXP) divergence-loop warm start
    prev_density_iterations: jax.Array  # () int32
    prev_divergence_iterations: jax.Array  # () int32
    time: TimeState


@dataclass(frozen=True)
class DFSPHPlaneSolver(DFSPHPaddedSolver):
    """DFSPH, plane-resident slot-major carry. Requires
    grid.use_pallas_slotmajor=True (single device)."""

    # Fold the pressure loops' elementwise glue (boundary-divergence add,
    # density-error / stiffness maps, velocity updates, gravity) into the pair
    # kernels as a post-map (pf_pair_reduce post_fn): the glue then runs only
    # on LIVE bands instead of as full-plane XLA fusions over the ~10x-larger
    # slot space. Live-slot results are bit-identical to the unfused
    # formulation (same f32 ops in the same order; pinned by
    # tests/test_pallas_plane.py::test_plane_fused_loop_glue_matches_unfused);
    # dead-slot velocity planes differ (zeros vs stale masked values), which
    # nothing consumes. Measured PERF.md round 4.
    fuse_loop_elementwise: bool = True
    # Same idea for the per-rebuild ctx assembly (density/alpha maps fused
    # into the dynamic ctx pass with the stat outputs as post planes).
    # Separate switch: its cost profile differs (5 extra f32 input planes
    # DMA'd per band + a stat->dyn kernel dependency) — see PERF.md round 4.
    fuse_ctx_elementwise: bool = True

    # pf kernels support bf16 operand planes (ops/pallas_slotmajor._pf_dtype)
    _pf_bf16_ok = True

    def __post_init__(self):
        super().__post_init__()
        assert self.grid.use_pallas_slotmajor, (
            "DFSPHPlaneSolver is the plane-resident slot-major path; set "
            "DenseGridConfig.use_pallas_slotmajor=True"
        )
        # W(0): the density self-contribution, needed as a PYTHON float by the
        # fused ctx post-map (kernel closures can't trace; computed here, at
        # construction time, outside any jit/shard_map trace)
        object.__setattr__(
            self, "_w0_self",
            float(self.kernel.evaluate(jnp.zeros((), REAL), jnp.zeros((), REAL))),
        )

    @property
    def _br(self) -> int:
        return self.grid.pallas_sm_row_block

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

    # ------------------------------------------------------------ pair context

    def _ctx_pf(self, pos, mask, boundary: BoundaryPlanes, dropped) -> PlaneCtx:
        """Fluid-fluid + fluid-boundary ctx passes (the two position-only pair
        passes of _ctx_from_padded), both through pf_pair_reduce."""
        g = self.grid
        m = float(self.properties.particle_mass)

        def ctx_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
            w = self.kernel.evaluate(r_sq, r)
            mgc = self.kernel.gradient_coefficient(r_sq, r) * m
            gx = mgc * dx
            gy = mgc * dy
            return (w, gx, gy, gx * gx + gy * gy, jnp.ones_like(r_sq))

        # boundary-source pass: finer chunks skip the (source-empty) interior
        # columns that the side walls would otherwise force full-width
        # (dense_grid.pallas_pf_stat_chunk_lanes; -1/None inherit the grid width)
        kw = g.pf_stat_chunk_kw
        with jax.named_scope("FluidParticleWorld.update_densities+alpha"):
            geom = pf_build_geom(pos, mask, self._br, grid=g)
            flags_dyn = pass_flags(geom, geom, g)
            stat = pf_pair_reduce(
                ctx_terms, 5, geom, boundary.geom,
                pass_flags(geom, boundary.geom, g), g, self._br, **kw
            )
            if self.fuse_ctx_elementwise:
                # density/alpha assembly fused into the DYNAMIC pass's
                # post-map (its flags cover every live fluid band; the stat
                # outputs ride as post planes, zero where no boundary is
                # near — exactly the value the XLA assembly reads there).
                # Live-slot outputs are bit-identical to the unfused branch.
                w0 = self._w0_self
                rho0 = float(self.properties.fluid_density)
                eps = float(ALPHA_EPSILON)

                def ctx_post(accs, post_planes, scalars):
                    d0, d1, d2, d3, d4 = accs
                    s0, s1, s2, s3, s4 = post_planes
                    dens_t = m * ((w0 + d0) + s0)
                    dens_t = jnp.maximum(dens_t, rho0)
                    vx = d1 + s1
                    vy = d2 + s2
                    denom = ((vx * vx) + (vy * vy)) + d3 + s3
                    return (dens_t, 1.0 / jnp.maximum(denom, eps), d4 + s4)

                # stat is already one stacked (5, P, NYP, NXP) array — passed
                # whole, it becomes a single reshape-blocked operand (no
                # per-plane slice + re-concat copies)
                fused = pf_pair_reduce(
                    ctx_terms, 3, geom, geom, flags_dyn, g, self._br,
                    post_fn=ctx_post, n_acc=5,
                    post_planes=(stat,),
                )
                dens, alpha, neighbor_total = fused[0], fused[1], fused[2]
            else:
                dyn = pf_pair_reduce(
                    ctx_terms, 5, geom, geom, flags_dyn, g, self._br
                )
                zero = jnp.zeros((), dtype=REAL)
                dens = m * (self.kernel.evaluate(zero, zero) + dyn[0] + stat[0])
                dens = jnp.maximum(
                    dens, jnp.asarray(self.properties.fluid_density, REAL)
                )
                vec = dyn[1:3] + stat[1:3]  # (2, P, NYP, NXP)
                denom = jnp.sum(vec * vec, axis=0) + dyn[3] + stat[3]
                alpha = 1.0 / jnp.maximum(
                    denom, jnp.asarray(ALPHA_EPSILON, REAL)
                )
                neighbor_total = dyn[4] + stat[4]

        return PlaneCtx(
            geom=geom,
            flags_dyn=flags_dyn,
            pos=pos,
            mask=mask,
            sum_grad_stat=stat[1:3] / m,
            neighbor_total=neighbor_total,
            densities=dens,
            alpha=alpha,
            num_dropped=dropped,
        )

    # --------------------------------------------------------------- pair ops

    def _velocity_divergence_pf(self, ctx: PlaneCtx, v):
        """sum_dyn (vi - vj).grad + vi.sum_grad_stat (dfsph.rs:99-126, 249-280)."""

        def div_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
            gc = self.kernel.gradient_coefficient(r_sq, r)
            return (
                ((q_planes[0] - s_planes[0]) * dx
                 + (q_planes[1] - s_planes[1]) * dy) * gc,
            )

        dyn = pf_pair_reduce(
            div_terms, 1, ctx.geom, ctx.geom, ctx.flags_dyn,
            self.grid, self._br, q_vals=(v,), s_vals=(v,),
        )[0]
        return dyn + jnp.sum(v * ctx.sum_grad_stat, axis=0)

    def _k_correction_pf(self, ctx: PlaneCtx, k):
        """sum_dyn (ki + kj) grad + ki * sum_grad_stat (dfsph.rs:128-161);
        returns a (2, P, NYP, NXP) vector field."""

        def corr_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
            kk = (q_planes[0] + s_planes[0]) * self.kernel.gradient_coefficient(
                r_sq, r
            )
            return (kk * dx, kk * dy)

        dyn = pf_pair_reduce(
            corr_terms, 2, ctx.geom, ctx.geom, ctx.flags_dyn,
            self.grid, self._br, q_vals=(k,), s_vals=(k,),
        )
        return dyn + k[None] * ctx.sum_grad_stat

    def _viscosity_pf(self, ctx: PlaneCtx, v, rho, dt):
        """Viscous acceleration over dynamic neighbors; (2, P, NYP, NXP)."""
        m = self.properties.particle_mass

        def visc_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
            c = self.viscosity_model.viscous_coefficient(
                scalars[0], r_sq, r, m, s_planes[2]
            )
            return (
                c * (s_planes[0] - q_planes[0]),
                c * (s_planes[1] - q_planes[1]),
            )

        return pf_pair_reduce(
            visc_terms, 2, ctx.geom, ctx.geom, ctx.flags_dyn,
            self.grid, self._br, q_vals=(v,), s_vals=(v, rho), scalars=(dt,),
        )

    def _viscosity_gravity_pf(self, ctx: PlaneCtx, v, rho, dt):
        """Viscous acceleration + gravity in one kernel (post-map adds the
        constant gravity vector, matching `visc + gvec` bitwise on live
        slots; dead bands emit zero acceleration, which nothing consumes —
        see fuse_loop_elementwise)."""
        m = self.properties.particle_mass
        gx, gy = float(self.gravity[0]), float(self.gravity[1])

        def visc_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
            c = self.viscosity_model.viscous_coefficient(
                scalars[0], r_sq, r, m, s_planes[2]
            )
            return (
                c * (s_planes[0] - q_planes[0]),
                c * (s_planes[1] - q_planes[1]),
            )

        def post(accs, post_planes, scalars):
            return (accs[0] + gx, accs[1] + gy)

        return pf_pair_reduce(
            visc_terms, 2, ctx.geom, ctx.geom, ctx.flags_dyn,
            self.grid, self._br, q_vals=(v,), s_vals=(v, rho), scalars=(dt,),
            post_fn=post,
        )

    # ----------------------------------------------- fused loop passes
    # (fuse_loop_elementwise: the loops' elementwise glue as kernel post-maps;
    # live-slot outputs bit-identical to the unfused formulation above)

    def _div_terms(self):
        def div_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
            gc = self.kernel.gradient_coefficient(r_sq, r)
            return (
                ((q_planes[0] - s_planes[0]) * dx
                 + (q_planes[1] - s_planes[1]) * dy) * gc,
            )

        return div_terms

    def _density_err_ki_pf(self, ctx: PlaneCtx, v, dens, alpha, dt):
        """One kernel: velocity divergence (dyn accumulation) -> post-map
        [boundary term add, rho* clamp, error, k_i = err*alpha]. Returns
        (err, ki) planes — the unfused `_velocity_divergence_pf` + the XLA
        err/ki maps, elementwise-identical on live slots (dfsph.rs:99-126,
        128-161)."""
        m = float(self.properties.particle_mass)
        rho0 = float(self.properties.fluid_density)

        def post(accs, post_planes, scalars):
            vx, vy, sgx, sgy, dens_p, alpha_p = post_planes
            delta = accs[0] + (vx * sgx + vy * sgy)
            err = jnp.maximum(dens_p + delta * m * scalars[0], rho0) - rho0
            return (err, err * alpha_p)

        out = pf_pair_reduce(
            self._div_terms(), 2, ctx.geom, ctx.geom, ctx.flags_dyn,
            self.grid, self._br, q_vals=(v,), s_vals=(v,), scalars=(dt,),
            post_fn=post, n_acc=1,
            post_planes=(v, ctx.sum_grad_stat, dens, alpha),
        )
        return out[0], out[1]

    def _divergence_delta_ki_pf(self, ctx: PlaneCtx, v):
        """One kernel: velocity divergence -> post-map [boundary add, *m,
        clamp >= 0, <9-neighbor deficiency guard, k_i = delta*alpha]
        (dfsph.rs:249-280). Returns (delta, ki) planes."""
        m = float(self.properties.particle_mass)

        def post(accs, post_planes, scalars):
            vx, vy, sgx, sgy, nt, alpha_p = post_planes
            delta = (accs[0] + (vx * sgx + vy * sgy)) * m
            delta = jnp.maximum(delta, 0.0)
            # particle-deficiency guard (<9 total neighbors, dfsph.rs:260-264)
            delta = jnp.where(nt < 9, 0.0, delta)
            return (delta, delta * alpha_p)

        out = pf_pair_reduce(
            self._div_terms(), 2, ctx.geom, ctx.geom, ctx.flags_dyn,
            self.grid, self._br, q_vals=(v,), s_vals=(v,),
            post_fn=post, n_acc=1,
            post_planes=(v, ctx.sum_grad_stat, ctx.neighbor_total, ctx.alpha),
        )
        return out[0], out[1]

    def _apply_correction_pf(self, ctx: PlaneCtx, k, v, scale):
        """One kernel: k-correction (dyn accumulation) -> post-map
        [boundary term add, v - scale * correction] (dfsph.rs:128-161).
        Returns the updated velocity planes directly."""

        def corr_terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
            kk = (q_planes[0] + s_planes[0]) * self.kernel.gradient_coefficient(
                r_sq, r
            )
            return (kk * dx, kk * dy)

        def post(accs, post_planes, scalars):
            vx, vy, kp, sgx, sgy = post_planes
            s = scalars[0]
            return (vx - s * (accs[0] + kp * sgx),
                    vy - s * (accs[1] + kp * sgy))

        return pf_pair_reduce(
            corr_terms, 2, ctx.geom, ctx.geom, ctx.flags_dyn,
            self.grid, self._br, q_vals=(k,), s_vals=(k,), scalars=(scale,),
            post_fn=post, n_acc=2,
            post_planes=(v, k, ctx.sum_grad_stat),
        )

    # ------------------------------------------------------------- reductions

    def _mean_live_pf(self, value, ctx: PlaneCtx, n_particles):
        total = jnp.sum(jnp.where(ctx.mask, value, 0.0))
        return total / jnp.asarray(n_particles, REAL)

    def _max_velocity_pf(self, vstar, mask):
        v_est_sq = jnp.where(mask, jnp.sum(vstar * vstar, axis=0), 0.0)
        return jnp.sqrt(jnp.max(v_est_sq))

    # ---------------------------------------------------------- pressure loops

    def _correct_density_error_pf(self, dt, dens, alpha, v, kappa,
                                  prev_iterations, ctx: PlaneCtx, n_particles):
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        m = jnp.asarray(self.properties.particle_mass, dtype=REAL)
        inv_dt = 1.0 / dt
        tol = jnp.asarray(self.max_avg_density_error, dtype=REAL)

        fused = self.fuse_loop_elementwise

        def warmstart(vv):
            k = 0.5 * jnp.maximum(kappa, -0.5 * rho0 * rho0)
            if fused:
                return self._apply_correction_pf(ctx, k, vv, inv_dt * m)
            return vv - inv_dt * m * self._k_correction_pf(ctx, k)

        v = jax.lax.cond(prev_iterations > 1, warmstart, lambda vv: vv, v)
        kappa = jnp.zeros_like(kappa)

        def body(state):
            vv, k_sum, num, _avg = state
            if fused:
                err, ki = self._density_err_ki_pf(ctx, vv, dens, alpha, dt)
            else:
                delta = self._velocity_divergence_pf(ctx, vv)
                err = jnp.maximum(dens + delta * m * dt, rho0) - rho0
                ki = err * alpha
            k_sum = k_sum + ki
            if fused:
                vv = self._apply_correction_pf(ctx, ki, vv, inv_dt * m)
            else:
                vv = vv - inv_dt * m * self._k_correction_pf(ctx, ki)
            avg = self._mean_live_pf(err, ctx, n_particles)
            return vv, k_sum, num + 1, avg

        def cond(state):
            _v, _k, num, avg = state
            return (num == 0) | (
                ((avg / rho0) * dt >= tol) & (num <= self.max_density_iterations)
            )

        return jax.lax.while_loop(
            cond, body, (v, kappa, jnp.int32(0), jnp.asarray(jnp.inf, REAL))
        )

    def _correct_divergence_error_pf(self, dt, alpha, v, stiff,
                                     prev_iterations, ctx: PlaneCtx, n_particles):
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        m = jnp.asarray(self.properties.particle_mass, dtype=REAL)
        tol = jnp.asarray(self.max_divergence_error, dtype=REAL)

        fused = self.fuse_loop_elementwise

        def warmstart(vv):
            s = 0.5 * jnp.maximum(stiff, -0.5 * rho0 * rho0)
            if fused:
                return self._apply_correction_pf(ctx, s, vv, m)
            return vv - m * self._k_correction_pf(ctx, s)

        v = jax.lax.cond(prev_iterations > 1, warmstart, lambda vv: vv, v)
        stiff = jnp.zeros_like(stiff)

        def body(state):
            vv, s_sum, num, _avg = state
            if fused:
                delta, ki = self._divergence_delta_ki_pf(ctx, vv)
            else:
                delta = self._velocity_divergence_pf(ctx, vv) * m
                delta = jnp.maximum(delta, 0.0)
                # particle-deficiency guard (<9 neighbors, dfsph.rs:260-264)
                delta = jnp.where(ctx.neighbor_total < 9, 0.0, delta)
                ki = delta * alpha
            s_sum = s_sum + ki
            if fused:
                vv = self._apply_correction_pf(ctx, ki, vv, m)
            else:
                vv = vv - m * self._k_correction_pf(ctx, ki)
            avg = self._mean_live_pf(delta, ctx, n_particles) / rho0
            return vv, s_sum, num + 1, avg

        def cond(state):
            _v, _s, num, avg = state
            return (num == 0) | (
                (avg * dt >= tol) & (num <= self.max_divergence_iterations)
            )

        return jax.lax.while_loop(
            cond, body, (v, stiff, jnp.int32(0), jnp.asarray(jnp.inf, REAL))
        )

    # ------------------------------------------------------------- host bounds

    def init_carry(self, state: ParticleState, boundary) -> DFSPHPlaneCarry:
        """`boundary` may be a BoundaryDense or a prebuilt BoundaryPlanes."""
        if isinstance(boundary, BoundaryDense):
            boundary = self.boundary_planes(boundary)
        g = self.grid
        base = DFSPHPaddedSolver.init_carry(self, state, boundary.dense)
        br = self._br
        pos = to_planes(base.ctx.pos_pad, g, br)
        mask = to_planes(base.ctx.mask, g, br).astype(bool)
        # rebuild the ctx in plane evaluation order so step 1 sees the same
        # reduction order as every later step
        ctx = self._ctx_pf(pos, mask, boundary, base.ctx.num_dropped)
        return DFSPHPlaneCarry(
            ctx=ctx,
            v=to_planes(base.v_pad, g, br),
            kappa=to_planes(base.kappa_pad, g, br),
            stiff=to_planes(base.stiff_pad, g, br),
            prev_density_iterations=base.prev_density_iterations,
            prev_divergence_iterations=base.prev_divergence_iterations,
            time=base.time,
        )

    def export_state(self, carry: DFSPHPlaneCarry) -> ParticleState:
        """Flat slot-order view (matches DFSPHPaddedSolver.export_state row
        order: N = ny*nx*P with the slot mask as `alive`)."""
        g = self.grid
        mask = from_planes(
            carry.ctx.mask.astype(REAL), g
        ).reshape(-1) > 0.5
        rho0 = jnp.asarray(self.properties.fluid_density, dtype=REAL)
        return ParticleState(
            positions=from_planes(carry.ctx.pos, g).reshape(-1, 2),
            velocities=jnp.where(
                mask[:, None], from_planes(carry.v, g).reshape(-1, 2), 0.0
            ),
            densities=jnp.where(
                mask, from_planes(carry.ctx.densities, g).reshape(-1), rho0
            ),
            alive=mask,
        )

    # -------------------------------------------------------------------- step

    def step(self, carry: DFSPHPlaneCarry, boundary: BoundaryPlanes,
             rebuild: bool = True):
        """One simulation step, ordering identical to DFSPHPaddedSolver.step
        (reference: dfsph.rs:414-525), everything in plane form."""
        g = self.grid
        ctx = carry.ctx
        time_state = carry.time
        dt = time_state.dt
        n = self._count_live(ctx.mask)

        v = carry.v
        kappa = carry.kappa
        rho = ctx.densities

        with jax.named_scope("DFSPH.non_pressure_forces"):
            if self.fuse_loop_elementwise:
                accel = self._viscosity_gravity_pf(ctx, v, rho, dt)
            else:
                visc = self._viscosity_pf(ctx, v, rho, dt)
                gvec = jnp.asarray(self.gravity, dtype=REAL).reshape(2, 1, 1, 1)
                accel = visc + gvec

        # --- CFL with old-dt estimate (dfsph.rs:472-481)
        vstar = v + accel * dt
        max_velocity = self._max_velocity_pf(vstar, ctx.mask)
        time_state = update_simulation_step(
            self.step_config, time_state,
            self.properties.particle_radius * 2.0, max_velocity,
        )
        dt = time_state.dt

        # --- predict v* with the NEW dt, constant-density loop (dfsph.rs:484-496)
        pred = v + accel * dt
        with jax.named_scope("DFSPH.correct_density_error"):
            pred, kappa, density_iters, avg_density_error = (
                self._correct_density_error_pf(
                    dt, rho, ctx.alpha, pred, kappa,
                    carry.prev_density_iterations, ctx, n,
                )
            )

        # --- advect + re-bucket (dfsph.rs:499-512)
        pos = ctx.pos + pred * dt
        if rebuild:
            with jax.named_scope("NeighborhoodSearch.update_dynamic"):
                extra = jnp.concatenate(
                    [pred, kappa[None], carry.stiff[None]], axis=0
                )
                pos, mask, extra, drops = pf_rebucket(
                    pos, ctx.mask, extra, g,
                    br=self.rebucket_row_block or self._br,
                    row0=self._rebucket_row0(),
                )
                drops = self._sum_counts(drops)
            pred = extra[0:2]
            kappa = extra[2]
            stiff = extra[3]
            ctx = self._ctx_pf(
                pos, mask, boundary, drops + boundary.dense.num_dropped
            )
        else:
            stiff = carry.stiff
            ctx = self._ctx_pf(pos, ctx.mask, boundary, ctx.num_dropped)

        # --- divergence-free loop (dfsph.rs:521)
        with jax.named_scope("DFSPH.correct_divergence_error"):
            pred, stiff, divergence_iters, avg_divergence = (
                self._correct_divergence_error_pf(
                    dt, ctx.alpha, pred, stiff,
                    carry.prev_divergence_iterations, ctx, n,
                )
            )

        new_carry = DFSPHPlaneCarry(
            ctx=ctx,
            v=pred,
            kappa=kappa,
            stiff=stiff,
            prev_density_iterations=density_iters,
            prev_divergence_iterations=divergence_iters,
            time=time_state,
        )
        diagnostics = Diagnostics(
            dt=dt,
            max_velocity=max_velocity,
            neighbor_drops=ctx.num_dropped,
            density_iterations=density_iters,
            divergence_iterations=divergence_iters,
            avg_density_error=avg_density_error,
            avg_divergence=avg_divergence,
            migration_drops=jnp.zeros((), dtype=jnp.int32),
        )
        return new_carry, diagnostics
