"""Viscosity models: per-pair viscous acceleration.

TPU-native counterpart of the reference's viscosity-model trait and its two
implementations (reference: src/sph/viscositymodel/{mod,xsph,physical}.rs). Models are
frozen dataclasses evaluated on `(N, K)` pair tiles inside the jitted solver step.
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..units import REAL
from ..ops.smoothing_kernels import Poly6, Viscosity


@dataclass(frozen=True)
class ViscosityModel:
    """Interface (reference: viscositymodel/mod.rs:11-18): viscous acceleration of
    particle i from one neighbor j."""

    def compute_viscous_acceleration(self, dt, r_sq, r, mass_j, rho_j, velocity_diff):
        """dt, r_sq, r, rho_j: (...,); mass_j scalar; velocity_diff (vj - vi): (..., 2).
        Returns (..., 2)."""
        c = self.viscous_coefficient(dt, r_sq, r, mass_j, rho_j)
        return c[..., None] * velocity_diff

    def viscous_coefficient(self, dt, r_sq, r, mass_j, rho_j):
        """The per-pair scalar c with acceleration == c * (vj - vi). Both
        reference models have this form (xsph.rs:21-23, physical.rs:21-23);
        plane-form passes (ops/pallas_slotmajor.py) consume it directly."""
        raise NotImplementedError


@dataclass(frozen=True)
class XSPHViscosityModel(ViscosityModel):
    """XSPH velocity smoothing recast as an acceleration (divide by dt).

    Reference: viscositymodel/xsph.rs ("Ghost SPH for Animating Water", Schechter et
    al.); default epsilon 0.05. Used by both solvers in the reference app (main.rs:93).
    """

    smoothing_length: float
    epsilon: float = 0.05

    def __post_init__(self):
        object.__setattr__(self, "kernel", Poly6(self.smoothing_length))

    def viscous_coefficient(self, dt, r_sq, r, mass_j, rho_j):
        # python-float constant keeps weak typing (bf16 pair passes stay bf16)
        return (
            float(self.epsilon * mass_j)
            * self.kernel.evaluate(r_sq, r)
            / (rho_j * dt)
        )


@dataclass(frozen=True)
class PhysicalViscosityModel(ViscosityModel):
    """Mueller laplacian viscosity (reference: viscositymodel/physical.rs).

    fluid_viscosity is the dynamic viscosity mu in Pa*s; default is water at 20C.
    The reference app's high-viscosity config constructs it with mu=0.01
    (main.rs:95-96).
    """

    smoothing_length: float
    fluid_viscosity: float = 1.0016 / 1000.0

    def __post_init__(self):
        object.__setattr__(self, "kernel", Viscosity(self.smoothing_length))

    def viscous_coefficient(self, dt, r_sq, r, mass_j, rho_j):
        return (
            jnp.asarray(self.fluid_viscosity * mass_j, dtype=REAL)
            * self.kernel.laplacian(r_sq, r)
            / rho_j
        )
