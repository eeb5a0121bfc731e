"""Independent NumPy float32 DFSPH oracle for residual-parity validation.

WHY THIS EXISTS: BASELINE.md's north star asks for "residuals matching the Rust
reference within float32 tolerance". This environment has NO Rust toolchain
(`cargo`/`rustc` are not installed) and no network egress to get one, so the Rust
crate at /root/reference cannot be built or instrumented here. This module is the
substitute external validator: a from-scratch, NumPy-only float32 implementation of
the DFSPH algorithm written directly against the reference's semantics
(/root/reference/src/sph/solver/dfsph.rs — every block cites its lines), sharing
NO code with the JAX framework (no jax import; brute-force O(N^2) neighbors instead
of any cell grid; plain np.float32 arithmetic).

If the JAX solvers and this oracle — two implementations with entirely different
data layouts, neighbor structures, and summation orders — produce the same
per-step average-density-error / divergence residual trajectories and iteration
counts within float32 drift, a disagreement with the Rust crate would require all
three to be wrong in the same way. tests/test_oracle_parity.py pins the agreement;
PARITY.md records the measured deltas and the exact recipe for re-running this
comparison against the actual Rust binary when a toolchain is available.

Usage as a script: python tools/oracle_dfsph.py  -> JSON trajectory on stdout.
"""

import json
import math

import numpy as np

F = np.float32


# --- kernels (reference: smoothing_kernel/wendland_quintic_c2.rs:16-47,
# --- poly6.rs:14-37) -------------------------------------------------------

class Wendland2D:
    def __init__(self, h):
        self.h = F(h)
        self.norm = F(4.0 * 7.0 / (math.pi * h * h))
        self.norm_grad = F(140.0 / (math.pi * h ** 4))

    def w(self, r):
        q = np.minimum(r / self.h, F(1.0))
        omq = F(1.0) - q
        return self.norm * omq * omq * omq * omq * (q + F(0.25))

    def grad_coef(self, r):
        """gradient = grad_coef(r) * (rj - ri)  (kernel.rs gradient convention)."""
        q = np.minimum(r / self.h, F(1.0))
        omq = F(1.0) - q
        return self.norm_grad * omq * omq * omq


class Poly6_2D:
    def __init__(self, h):
        self.hsq = F(h * h)
        self.norm = F(4.0 / (math.pi * h ** 8))

    def w(self, r_sq):
        d = np.maximum(self.hsq - r_sq, F(0.0))
        return self.norm * d * d * d


# --- oracle solver ----------------------------------------------------------

class OracleDFSPH:
    """Reference-faithful DFSPH (dfsph.rs) on brute-force neighbor matrices.

    fluid_positions: (N, 2) float32; boundary_positions: (Nb, 2) float32.
    All tolerances default to dfsph.rs:49-55; XSPH viscosity eps to xsph.rs:14.
    """

    MIN_DISTANCE_SQ = F(1.0e-10)  # self-filter (neighborhood_search.rs:324)

    def __init__(self, fluid_positions, boundary_positions, h, mass, rho0,
                 dt, gravity=(0.0, -9.81), xsph_epsilon=0.05,
                 max_avg_density_error=0.01 / 100.0, max_density_iterations=200,
                 max_divergence_error=0.1 / 100.0, max_divergence_iterations=400):
        self.x = np.asarray(fluid_positions, dtype=F).copy()
        self.xb = np.asarray(boundary_positions, dtype=F)
        self.v = np.zeros_like(self.x)
        self.h = F(h)
        self.m = F(mass)
        self.rho0 = F(rho0)
        self.dt = F(dt)
        self.g = np.asarray(gravity, dtype=F)
        self.eps_xsph = F(xsph_epsilon)
        self.kern = Wendland2D(h)
        self.poly6 = Poly6_2D(h)
        self.tol_density = F(max_avg_density_error)
        self.max_density_iters = max_density_iterations
        self.tol_div = F(max_divergence_error)
        self.max_div_iters = max_divergence_iterations

        n = self.x.shape[0]
        self.kappa = np.zeros(n, dtype=F)  # warmstart_kappa (dfsph.rs:38)
        self.stiff = np.zeros(n, dtype=F)  # warmstart_stiffness (dfsph.rs:40)
        self.prev_density_iters = 1  # dfsph.rs:52
        self.prev_div_iters = 0  # dfsph.rs:56
        # lazy warm-up (dfsph.rs:419-428)
        self._neighbors()
        self._densities()
        self._alpha()

    # --- neighbor structure: full pair masks, radius == h --------------------

    def _neighbors(self):
        d = self.x[:, None, :] - self.x[None, :, :]
        self.r_sq = np.einsum("ijk,ijk->ij", d, d).astype(F)
        self.r = np.sqrt(self.r_sq)
        self.mask = (self.r_sq <= self.h * self.h) & (
            self.r_sq > self.MIN_DISTANCE_SQ
        )
        self.diff = d  # x_i - x_j ; reference gradient takes ri_to_rj = -diff

        db = self.x[:, None, :] - self.xb[None, :, :]
        self.rb_sq = np.einsum("ijk,ijk->ij", db, db).astype(F)
        self.rb = np.sqrt(self.rb_sq)
        self.maskb = (self.rb_sq <= self.h * self.h) & (
            self.rb_sq > self.MIN_DISTANCE_SQ
        )
        self.diffb = db
        self.num_neighbors = self.mask.sum(1) + self.maskb.sum(1)

    def _grad(self):
        """(N, N, 2) kernel gradients to dynamic neighbors, masked; gradient points
        from i toward j (kernel.rs convention: c * ri_to_rj, c >= 0)."""
        c = self.kern.grad_coef(self.r) * self.mask
        gb = self.kern.grad_coef(self.rb) * self.maskb
        return -c[..., None] * self.diff, -gb[..., None] * self.diffb

    # --- densities + alpha (fluidparticleworld.rs:197-231, dfsph.rs:68-97) ---

    def _densities(self):
        w = self.kern.w(self.r) * self.mask
        wb = self.kern.w(self.rb) * self.maskb
        rho = self.m * (self.kern.w(F(0.0)) + w.sum(1) + wb.sum(1))
        self.rho = np.maximum(rho, self.rho0)  # clamp (:229)

    def _alpha(self):
        grad, gradb = self._grad()
        mg = self.m * grad
        mgb = self.m * gradb
        vec = mg.sum(1) + mgb.sum(1)
        sq = np.einsum("ijk,ijk->i", mg, mg) + np.einsum("ijk,ijk->i", mgb, mgb)
        denom = np.einsum("ik,ik->i", vec, vec) + sq
        self.alpha = (F(1.0) / np.maximum(denom, F(1.0e-6))).astype(F)

    # --- shared correction shapes (dfsph.rs:99-161) ---------------------------

    def _velocity_divergence(self, v):
        grad, gradb = self._grad()
        dv = v[:, None, :] - v[None, :, :]
        delta = np.einsum("ijk,ijk->i", dv, grad)
        delta = delta + np.einsum("ik,ijk->i", v, gradb)  # boundary vj = 0
        return delta.astype(F)

    def _k_correction(self, v, k, scale):
        grad, gradb = self._grad()
        coef = (k[:, None] + k[None, :]) * self.mask
        corr = np.einsum("ij,ijk->ik", coef, grad)
        corr = corr + k[:, None] * gradb.sum(1)
        return (v - scale * corr).astype(F)

    # --- pressure loops (dfsph.rs:195-247, 346-402) ---------------------------

    def _correct_density_error(self, v):
        dt, m, rho0 = self.dt, self.m, self.rho0
        errors = []
        if self.prev_density_iters > 1:  # warm start gate (dfsph.rs:199)
            k = F(0.5) * np.maximum(self.kappa, F(-0.5) * rho0 * rho0)
            v = self._k_correction(v, k, m / dt)
        self.kappa[:] = 0
        num = 0
        while True:
            delta = self._velocity_divergence(v)
            err = np.maximum(self.rho + delta * m * dt, rho0) - rho0
            ki = (err * self.alpha).astype(F)
            self.kappa += ki
            v = self._k_correction(v, ki, m / dt)
            avg = F(err.mean(dtype=F))
            num += 1
            errors.append(float(avg))
            if not ((avg / rho0) * dt >= self.tol_density
                    and num <= self.max_density_iters):
                break
        self.prev_density_iters = num
        return v, num, errors

    def _correct_divergence_error(self, v):
        dt, m, rho0 = self.dt, self.m, self.rho0
        residuals = []
        if self.prev_div_iters > 1:  # dfsph.rs:354
            s = F(0.5) * np.maximum(self.stiff, F(-0.5) * rho0 * rho0)
            v = self._k_correction(v, s, m)
        self.stiff[:] = 0
        num = 0
        while True:
            delta = (self._velocity_divergence(v) * m).astype(F)
            delta = np.maximum(delta, F(0.0))
            delta[self.num_neighbors < 9] = 0  # deficiency guard (dfsph.rs:260-264)
            ki = (delta * self.alpha).astype(F)
            self.stiff += ki
            v = self._k_correction(v, ki, m)
            avg = F(delta.mean(dtype=F) / rho0)
            num += 1
            residuals.append(float(avg))
            if not (avg * dt >= self.tol_div and num <= self.max_div_iters):
                break
        self.prev_div_iters = num
        return v, num, residuals

    # --- one simulation step (dfsph.rs:414-525), FIXED dt --------------------

    def step(self):
        dt, m = self.dt, self.m
        # non-pressure forces: gravity + XSPH over dynamic neighbors (dfsph.rs:437-469)
        w = self.poly6.w(self.r_sq) * self.mask
        coef = self.eps_xsph * m * w / (self.rho[None, :] * dt)
        dv = self.v[None, :, :] - self.v[:, None, :]  # vj - vi
        accel = np.einsum("ij,ijk->ik", coef, dv).astype(F) + self.g

        # predict v* (dfsph.rs:484-492); fixed-dt run skips the CFL update
        v_star = (self.v + accel * dt).astype(F)

        v_star, density_iters, density_errors = self._correct_density_error(v_star)

        # advect (dfsph.rs:499-510)
        self.x = (self.x + v_star * dt).astype(F)

        # rebuild + densities + alpha (dfsph.rs:512-518)
        self._neighbors()
        self._densities()
        self._alpha()

        v_star, div_iters, div_residuals = self._correct_divergence_error(v_star)
        self.v = v_star
        return {
            "density_iterations": density_iters,
            "avg_density_error": density_errors[-1],
            "density_errors": density_errors,
            "divergence_iterations": div_iters,
            "avg_divergence": div_residuals[-1],
            "divergence_residuals": div_residuals,
        }


def dam_break_scene(particle_density=900.0):
    """The shared validation scene (built with the framework's host-side scene API,
    which is plain numpy and independently tested against the reference's
    fluidparticleworld.rs geometry)."""
    from yasph2d_tpu.world import FluidParticleWorld

    world = FluidParticleWorld(2.0, particle_density, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 2.5), (2.0, 2.5), 4)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 4)
    world.add_boundary_thick_line((0.0, 0.0), (0.0, 2.5), 4)
    world.add_boundary_thick_line((2.0, 0.0), (2.0, 2.5), 4)
    world.add_boundary_thick_line((-2.0, -0.5), (4.0, -0.5), 4)
    return world


def main(num_steps=20, dt=1.0 / 3000.0):
    world = dam_break_scene()
    oracle = OracleDFSPH(
        world.host_positions(), world.host_boundary_positions(),
        h=world.properties.smoothing_length, mass=world.properties.particle_mass,
        rho0=100.0, dt=dt,
    )
    steps = [oracle.step() for _ in range(num_steps)]
    print(json.dumps({"dt": dt, "steps": steps}))


if __name__ == "__main__":
    main()
