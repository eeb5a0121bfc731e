"""Independent NumPy float32 WCSPH oracle for trajectory-parity validation.

WHY THIS EXISTS: the DFSPH solvers are pinned against tools/oracle_dfsph.py, but
WCSPH conformance (reference: /root/reference/src/sph/solver/wscsph.rs:126-179)
rested only on internal dense-vs-table agreement — both JAX backends share
world.py and the kernel module, so a common-mode misreading of wscsph.rs would
pass every such test. This module closes that hole exactly like the DFSPH oracle:
a from-scratch, NumPy-only float32 WCSPH written directly against the reference's
semantics (every block cites wscsph.rs lines), sharing NO code with the JAX
framework (no jax import; brute-force O(N^2) neighbor masks; plain np.float32).

Covered reference semantics:
- leapfrog part 1 before the rebuild (wscsph.rs:141-151)
- Poly6 density summation with self-contribution and the rho >= rho0 clamp
  (fluidparticleworld.rs:197-231)
- Tait EOS gamma=7 with the >= 1 ratio clamp (wscsph.rs:52-57)
- symmetric pressure force -m (pi + pj) / (2 rhoi rhoj) * gradW_spiky
  (wscsph.rs:100-101), XSPH viscosity (xsph.rs:21-23), Monaghan-Kajtar radial
  boundary force -f * W_spiky(r) / r^2 * ri_to_rj (wscsph.rs:112-116)
- CFL dt update from the OLD-dt velocity estimate (wscsph.rs:158-167,
  timemanager.rs:252-279) and the second leapfrog half-kick with the NEW dt
  (wscsph.rs:169-178) — the quirk chain that fixed-dt runs cannot exercise.

tests/test_oracle_wcsph.py pins the JAX solvers' aggregate trajectories (max
density, max pressure, COM, kinetic energy, dt sequence) against this oracle.

Usage as a script: python tools/oracle_wcsph.py -> JSON trajectory on stdout.
"""

import json
import math

import numpy as np

F = np.float32

DIVISION_EPSILON = F(1.0e-10)  # kernel.rs:10
TAIT_EQUATION_GAMMA = 7  # wscsph.rs:26


class Poly6_2D:
    """poly6.rs:14-37 (2D normalizers)."""

    def __init__(self, h):
        self.hsq = F(h * h)
        self.norm = F(4.0 / (math.pi * h ** 8))

    def w(self, r_sq):
        d = np.maximum(self.hsq - r_sq, F(0.0))
        return self.norm * d * d * d


class Spiky2D:
    """spiky.rs:15-43 (2D normalizers)."""

    def __init__(self, h):
        self.h = F(h)
        self.norm = F(10.0 / (math.pi * h ** 5))
        self.norm_grad = F(30.0 / (math.pi * h ** 5))

    def w(self, r):
        hsubr = np.maximum(self.h - r, F(0.0))
        return self.norm * hsubr * hsubr * hsubr

    def grad_coef(self, r):
        """gradient = grad_coef(r) * ri_to_rj (kernel.rs convention, c >= 0)."""
        hsubr = np.maximum(self.h - r, F(0.0))
        return self.norm_grad * hsubr * hsubr / (r + DIVISION_EPSILON)


class OracleWCSPH:
    """Reference-faithful WCSPH (wscsph.rs) on brute-force neighbor matrices.

    Adaptive CFL dt by default (the reference app's configuration) — pass
    `fixed_dt` to pin a FixedTimeStep run instead. Compressibility defaults from
    wscsph.rs:39 (eta=0.01, v_max=1.0); boundary_force_factor=1.0 (wscsph.rs:34).
    """

    MIN_DISTANCE_SQ = F(1.0e-10)  # neighborhood_search.rs:324

    def __init__(self, fluid_positions, boundary_positions, h, mass, rho0,
                 particle_diameter, gravity=(0.0, -9.81), xsph_epsilon=0.05,
                 target_density_variation=0.01, expected_max_flow_speed=1.0,
                 boundary_force_factor=1.0,
                 timestep_max=1.0 / 360.0, timestep_min=1.0 / 24000.0,
                 cfl_factor=0.2, fixed_dt=None):
        self.x = np.asarray(fluid_positions, dtype=F).copy()
        self.xb = np.asarray(boundary_positions, dtype=F)
        self.v = np.zeros_like(self.x)
        self.a = np.zeros_like(self.x)  # cached accelerations (wscsph.rs:21-22)
        self.h = F(h)
        self.m = F(mass)
        self.rho0 = F(rho0)
        self.diameter = F(particle_diameter)
        self.g = np.asarray(gravity, dtype=F)
        self.eps_xsph = F(xsph_epsilon)
        self.f_boundary = F(boundary_force_factor)
        self.poly6 = Poly6_2D(h)
        self.spiky = Spiky2D(h)
        # set_compressibility (wscsph.rs:45-49)
        speed_of_sound = expected_max_flow_speed / math.sqrt(target_density_variation)
        self.stiffness = F(rho0 * speed_of_sound * speed_of_sound / TAIT_EQUATION_GAMMA)
        self.timestep_max = F(timestep_max)
        self.timestep_min = F(timestep_min)
        self.cfl_factor = F(cfl_factor)
        self.fixed_dt = None if fixed_dt is None else F(fixed_dt)
        # Adaptive runs start at timestep_min (timemanager.rs:106-109; framework
        # TimeState.initial does the same)
        self.dt = self.fixed_dt if self.fixed_dt is not None else F(timestep_min)
        self.rho = np.full(self.x.shape[0], rho0, dtype=F)

    # --- brute-force neighborhood, radius == h -------------------------------

    def _neighbors(self):
        d = self.x[:, None, :] - self.x[None, :, :]
        self.r_sq = np.einsum("ijk,ijk->ij", d, d).astype(F)
        self.r = np.sqrt(self.r_sq)
        self.mask = (self.r_sq <= self.h * self.h) & (
            self.r_sq > self.MIN_DISTANCE_SQ
        )
        self.diff = d  # x_i - x_j; ri_to_rj = -diff

        db = self.x[:, None, :] - self.xb[None, :, :]
        self.rb_sq = np.einsum("ijk,ijk->ij", db, db).astype(F)
        self.rb = np.sqrt(self.rb_sq)
        self.maskb = (self.rb_sq <= self.h * self.h) & (
            self.rb_sq > self.MIN_DISTANCE_SQ
        )
        self.diffb = db

    # --- densities (fluidparticleworld.rs:197-231, Poly6) --------------------

    def _densities(self):
        w = self.poly6.w(self.r_sq) * self.mask
        wb = self.poly6.w(self.rb_sq) * self.maskb
        rho = self.m * (self.poly6.w(F(0.0)) + w.sum(1) + wb.sum(1))
        self.rho = np.maximum(rho, self.rho0).astype(F)  # clamp (:229)

    # --- Tait EOS (wscsph.rs:52-57) ------------------------------------------

    def _pressure(self, rho):
        ratio = np.maximum(rho / self.rho0, F(1.0))
        return (self.stiffness * (ratio ** TAIT_EQUATION_GAMMA - F(1.0))).astype(F)

    # --- accelerations (wscsph.rs:59-118) ------------------------------------

    def _accelerations(self, dt):
        p = self._pressure(self.rho)
        # symmetric pressure force: -m (pi + pj) / (2 rhoi rhoj) gradW_spiky
        coef = (
            -self.m * (p[:, None] + p[None, :])
            / (F(2.0) * self.rho[:, None] * self.rho[None, :])
        ) * self.mask
        grad = (self.spiky.grad_coef(self.r) * self.mask)[..., None] * (-self.diff)
        accel = np.einsum("ij,ijk->ik", coef.astype(F), grad).astype(F)

        # XSPH viscosity (xsph.rs:21-23): eps * mj * W_poly6 / (rhoj dt) * (vj - vi)
        wv = self.poly6.w(self.r_sq) * self.mask
        cv = self.eps_xsph * self.m * wv / (self.rho[None, :] * dt)
        dv = self.v[None, :, :] - self.v[:, None, :]
        accel = accel + np.einsum("ij,ijk->ik", cv.astype(F), dv).astype(F)

        # Monaghan-Kajtar boundary force (wscsph.rs:112-116):
        # a -= f * W_spiky(r) / r^2 * ri_to_rj  (ri_to_rj = -diffb)
        wb = self.spiky.w(self.rb) * self.maskb
        cb = (self.f_boundary * wb / self.rb_sq) * self.maskb
        accel = accel + np.einsum("ij,ijk->ik", cb.astype(F), self.diffb).astype(F)

        return (accel + self.g).astype(F)

    # --- CFL dt (timemanager.rs:252-279) -------------------------------------

    def _update_dt(self, max_velocity):
        if self.fixed_dt is not None:
            return self.fixed_dt
        time_cfl = self.cfl_factor * F(0.4) * self.diameter / (
            max_velocity + F(1e-5)
        )
        upper = min(self.timestep_max, self.dt * F(2.0))
        return F(max(self.timestep_min, min(upper, time_cfl)))

    # --- one simulation step (wscsph.rs:126-179) -----------------------------

    def step(self):
        dt = self.dt
        # leapfrog part 1 (wscsph.rs:141-151)
        self.v = (self.v + F(0.5) * dt * self.a).astype(F)
        self.x = (self.x + self.v * dt).astype(F)

        # rebuild + densities (wscsph.rs:153-154)
        self._neighbors()
        self._densities()
        self.a = self._accelerations(dt)

        # CFL with the OLD-dt estimate (wscsph.rs:158-167)
        v_est = self.v + self.a * dt
        max_velocity = F(np.sqrt(np.max(np.einsum("ik,ik->i", v_est, v_est))))
        new_dt = self._update_dt(max_velocity)

        # leapfrog part 2 with the NEW dt (wscsph.rs:169-178 quirk)
        self.v = (self.v + F(0.5) * new_dt * self.a).astype(F)
        self.dt = new_dt

        p = self._pressure(self.rho)
        return {
            "dt": float(dt),
            "new_dt": float(new_dt),
            "max_velocity": float(max_velocity),
            "max_density": float(self.rho.max()),
            "mean_density": float(self.rho.mean(dtype=np.float64)),
            "max_pressure": float(p.max()),
            "com_x": float(self.x[:, 0].mean(dtype=np.float64)),
            "com_y": float(self.x[:, 1].mean(dtype=np.float64)),
            "kinetic_energy": float(
                (0.5 * float(self.m) * np.einsum("ik,ik->i", self.v, self.v))
                .sum(dtype=np.float64)
            ),
        }


def dam_break_scene(particle_density=900.0):
    """Same shared validation scene as the DFSPH oracle (scene API is host-side
    numpy, independently tested against fluidparticleworld.rs geometry)."""
    from yasph2d_tpu.world import FluidParticleWorld

    world = FluidParticleWorld(2.0, particle_density, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 4)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 4)
    world.add_boundary_thick_line((0.0, 0.0), (0.0, 2.5), 4)
    world.add_boundary_thick_line((2.0, 0.0), (2.0, 2.5), 4)
    world.add_boundary_thick_line((-2.0, -0.5), (4.0, -0.5), 4)
    return world


def make_oracle(world, cfl_factor=0.2, fixed_dt=None):
    return OracleWCSPH(
        world.host_positions(), world.host_boundary_positions(),
        h=world.properties.smoothing_length, mass=world.properties.particle_mass,
        rho0=100.0, particle_diameter=world.properties.particle_radius * 2.0,
        cfl_factor=cfl_factor, fixed_dt=fixed_dt,
    )


def main(num_steps=20):
    world = dam_break_scene()
    oracle = make_oracle(world)
    steps = [oracle.step() for _ in range(num_steps)]
    print(json.dumps({"steps": steps}))


if __name__ == "__main__":
    main()
