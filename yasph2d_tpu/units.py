"""Simulation-wide scalar/vector type policy.

Mirrors the reference's unit layer (reference: src/units.rs:2-4) which pins the whole
simulation to f32 (`Real = f32`, `Point`/`Vector` = 2D f32). On TPU we keep the same
policy: every particle attribute is float32, 2D vectors are arrays whose trailing
dimension is 2 (`(..., 2)`), points and vectors share one representation.

float32 (not bfloat16) is deliberate: SPH pressure solves iterate on density *residuals*
that are small differences of O(rho0) quantities; bf16's 8-bit mantissa destroys them.
The MXU is not on the critical path for SPH pair interactions (VPU + HBM are), so f32
costs us nothing we were otherwise going to use.
"""

import jax.numpy as jnp

# Scalar type used for all physical quantities (reference: src/units.rs:2).
REAL = jnp.float32

# Integer type for particle/cell indices. int32 everywhere: TPUs have no fast int64.
INDEX = jnp.int32

# Number of spatial dimensions. The reference is strictly 2D.
NDIM = 2

# Epsilon guarding divisions in kernel gradients (reference: smoothing_kernel/kernel.rs:9).
DIVISION_EPSILON = 1.0e-10


def as_real(x):
    """Coerce a python/numpy scalar or array to the simulation scalar dtype."""
    return jnp.asarray(x, dtype=REAL)
