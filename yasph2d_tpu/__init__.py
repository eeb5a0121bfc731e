"""yasph2d_tpu: a TPU-native 2D SPH framework (JAX / XLA / Pallas).

Brand-new implementation with the capabilities of the Rust reference Wumpf/yasph2d:
WCSPH and DFSPH pressure solvers, five smoothing kernels, XSPH + physical viscosity,
static boundary particles, cell-grid neighborhood search with fixed-degree neighbor
tables, adaptive CFL time stepping, scene construction, headless rendering/recording,
and multi-chip spatial domain sharding.
"""

from .units import REAL, INDEX
from .world import (
    FluidParticleWorld,
    FluidProperties,
    ParticleState,
    update_densities,
    update_neighborhood,
    GRAVITY,
)
from .ops.neighborhood import GridConfig
from .ops import smoothing_kernels

__version__ = "0.1.0"
