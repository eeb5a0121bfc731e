"""SPH smoothing kernels.

TPU-native re-implementation of the reference's kernel zoo
(reference: src/sph/smoothing_kernel/{kernel,poly6,spiky,cubic,wendland_quintic_c2,
viscosity}.rs). Each kernel is a frozen dataclass holding the smoothing length `h` and
normalizers precomputed as *python floats*, so that under `jax.jit` they fold into the
trace as constants — the TPU sees pure fused VPU arithmetic on `(N, K)` pair tiles, no
struct indirection.

Conventions (identical to the reference, smoothing_kernel/kernel.rs:8-34):
- Radially symmetric kernels with support radius == smoothing length h; W(r) == 0 for
  r > h. All evaluate/gradient implementations here return exact zeros outside support
  so that padded/masked neighbor slots are harmless even before masking.
- ``evaluate(r_sq, r)`` takes both the squared and plain distance (callers usually have
  both already).
- ``gradient(ri_to_rj, r_sq, r)`` returns the gradient of W with respect to the
  position of particle *i*, where ``ri_to_rj = rj - ri``. It has the form ``c *
  ri_to_rj`` with ``c >= 0`` (points from i toward j). Solver force signs are written
  against this convention, exactly as in the reference.
- ``laplacian(r_sq, r)`` is only implemented by the Viscosity kernel (as in the
  reference, where the others `unimplemented!()`).

All math is float32 (see units.py); shapes broadcast, so the same kernel code serves
scalar probes in tests and `(N, K)` neighbor tiles in solvers.
"""

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..units import DIVISION_EPSILON


@dataclass(frozen=True)
class SmoothingKernel:
    """Base class: stores smoothing length; subclasses precompute normalizers."""

    h: float

    def evaluate(self, r_sq, r):
        raise NotImplementedError

    def gradient(self, ri_to_rj, r_sq, r):
        """dW/d(r_i): ``c(r) * ri_to_rj`` with c >= 0. ri_to_rj shape (..., 2)."""
        return self._scale(self.gradient_coefficient(r_sq, r), ri_to_rj)

    def gradient_coefficient(self, r_sq, r):
        """The scalar c >= 0 with gradient == c * ri_to_rj (kernel.rs:22-28
        convention). Plane-form passes (ops/pallas_slotmajor.py) consume the
        coefficient directly so vector components stay separate planes."""
        raise NotImplementedError

    def gradient_from_positions(self, ri, rj):
        """Convenience mirroring kernel.rs:22-28."""
        ri_to_rj = rj - ri
        r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
        r = jnp.sqrt(r_sq)
        return self.gradient(ri_to_rj, r_sq, r)

    def laplacian(self, r_sq, r):
        raise NotImplementedError

    def _scale(self, c, ri_to_rj):
        """Multiply per-pair scalar c (...,) onto vectors (..., 2)."""
        return jnp.asarray(c)[..., None] * ri_to_rj


@dataclass(frozen=True)
class Poly6(SmoothingKernel):
    """Mueller et al. density kernel; 2D normalizers (reference: poly6.rs:14-24).

    Not suited for pressure forces (gradient vanishes at the center); fastest to
    evaluate but pairing-unstable (wendland_quintic_c2.rs:13-14).
    """

    def __post_init__(self):
        h = float(self.h)
        object.__setattr__(self, "_hsq", h * h)
        object.__setattr__(self, "_norm", 4.0 / (math.pi * h**8))
        object.__setattr__(self, "_norm_grad", 24.0 / (math.pi * h**8))

    def evaluate(self, r_sq, r):
        dsq = jnp.maximum(self._hsq - r_sq, 0.0)
        return self._norm * dsq * dsq * dsq

    def gradient_coefficient(self, r_sq, r):
        dsq = jnp.maximum(self._hsq - r_sq, 0.0)
        return self._norm_grad * dsq * dsq


@dataclass(frozen=True)
class Spiky(SmoothingKernel):
    """Debrun's spiky pressure kernel; 2D normalizers (reference: spiky.rs:14-24).

    Gradient does not vanish at the center, making it the WCSPH pressure kernel.
    """

    def __post_init__(self):
        h = float(self.h)
        object.__setattr__(self, "_norm", 10.0 / (math.pi * h**5))
        object.__setattr__(self, "_norm_grad", 30.0 / (math.pi * h**5))

    def evaluate(self, r_sq, r):
        hsubr = jnp.maximum(self.h - r, 0.0)
        return self._norm * hsubr * hsubr * hsubr

    def gradient_coefficient(self, r_sq, r):
        hsubr = jnp.maximum(self.h - r, 0.0)
        return self._norm_grad * hsubr * hsubr / (r + DIVISION_EPSILON)


@dataclass(frozen=True)
class CubicSpline(SmoothingKernel):
    """Monaghan 1992 cubic spline (reference: cubic.rs:16-52), piecewise in q = r/h."""

    def __post_init__(self):
        h = float(self.h)
        object.__setattr__(self, "_h_inv", 1.0 / h)
        object.__setattr__(self, "_norm", 6.0 * 40.0 / (7.0 * math.pi * h * h))
        object.__setattr__(self, "_norm_grad", 6.0 * 40.0 / (7.0 * math.pi * h**3))

    def evaluate(self, r_sq, r):
        q = r * self._h_inv
        q_sq = q * q
        inner = (1.0 / 6.0) + q_sq * q - q_sq
        one_minus_q = 1.0 - q
        outer = one_minus_q * one_minus_q * one_minus_q * (2.0 / 6.0)
        w = jnp.where(q <= 0.5, inner, jnp.where(q <= 1.0, outer, 0.0))
        return self._norm * w

    def gradient_coefficient(self, r_sq, r):
        q = r * self._h_inv
        # The reference divides by r without an epsilon (cubic.rs:44-47); we add the
        # shared DIVISION_EPSILON to keep masked / exactly-coincident pair slots NaN
        # free. Neighbor lists filter r_sq > 1e-10, so live pairs are unaffected.
        r_safe = r + DIVISION_EPSILON
        inner = q * (2.0 - q * 3.0) / r_safe
        factor = 1.0 - q
        outer = factor * factor / r_safe
        c = jnp.where(q <= 0.5, inner, jnp.where(q < 1.0, outer, 0.0))
        return self._norm_grad * c


@dataclass(frozen=True)
class WendlandQuinticC2(SmoothingKernel):
    """Wendland quintic C2 (reference: wendland_quintic_c2.rs:16-47).

    Default DFSPH kernel: avoids the pairing instability (Dehnen & Aly 2012) and is
    cheaper to evaluate than CubicSpline.
    """

    def __post_init__(self):
        h = float(self.h)
        object.__setattr__(self, "_h_inv", 1.0 / h)
        object.__setattr__(self, "_norm", 4.0 * 7.0 / (math.pi * h * h))
        object.__setattr__(self, "_norm_grad", 140.0 / (math.pi * h**4))

    def evaluate(self, r_sq, r):
        q = jnp.minimum(r * self._h_inv, 1.0)
        one_minus_q = 1.0 - q
        omq_sq = one_minus_q * one_minus_q
        return self._norm * omq_sq * omq_sq * (q + 0.25)

    def gradient_coefficient(self, r_sq, r):
        q = jnp.minimum(r * self._h_inv, 1.0)
        one_minus_q = 1.0 - q
        return self._norm_grad * one_minus_q * one_minus_q * one_minus_q


@dataclass(frozen=True)
class Viscosity(SmoothingKernel):
    """Laplacian-only viscosity kernel (reference: viscosity.rs:11-48).

    Sjoestroem's 2D variant; Mueller's 3D viscosity kernel behaves badly in 2D. Only
    the laplacian is used by PhysicalViscosityModel. As in the reference, the
    normalizer of `evaluate` is suspect (its property tests are disabled,
    viscosity.rs:50-52) and `gradient` is unimplemented.
    """

    def __post_init__(self):
        h = float(self.h)
        object.__setattr__(self, "_hsq", h * h)
        object.__setattr__(self, "_norm", 90.0 / (29.0 * math.pi * h * h))
        object.__setattr__(self, "_norm_lapl", 360.0 / (29.0 * math.pi * h**5))

    def evaluate(self, r_sq, r):
        w = self._norm * (4.0 * r_sq * r / (9.0 * self.h) + r_sq) / self._hsq
        return jnp.where(r < self.h, w, 0.0)

    def laplacian(self, r_sq, r):
        # NOTE: like the reference (viscosity.rs:45-47) this does NOT clamp to zero
        # outside the support; callers rely on the neighbor radius == h.
        return self._norm_lapl * (self.h - r)


ALL_KERNELS = (Poly6, Spiky, CubicSpline, WendlandQuinticC2)
