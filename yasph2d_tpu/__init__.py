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
from .ops.dense_grid import DenseGridConfig
from .ops import smoothing_kernels
from .config import SimulationConfig
from .timemanager import AdaptiveTimeStep, FixedTimeStep, TimeManager, TimerConfig

__version__ = "0.1.0"


def __getattr__(name):
    # Solver classes import jax-heavy modules; resolve lazily.
    lazy = {
        "WCSPHSolver": ("yasph2d_tpu.models.wcsph", "WCSPHSolver"),
        "WCSPHDenseSolver": ("yasph2d_tpu.models.wcsph_dense", "WCSPHDenseSolver"),
        "WCSPHPaddedSolver": ("yasph2d_tpu.models.wcsph_dense", "WCSPHPaddedSolver"),
        "DFSPHSolver": ("yasph2d_tpu.models.dfsph", "DFSPHSolver"),
        "DFSPHDenseSolver": ("yasph2d_tpu.models.dfsph_dense", "DFSPHDenseSolver"),
        "DFSPHPaddedSolver": ("yasph2d_tpu.models.dfsph_dense", "DFSPHPaddedSolver"),
        "DFSPHPlaneSolver": ("yasph2d_tpu.models.dfsph_plane", "DFSPHPlaneSolver"),
        "WCSPHPlaneSolver": ("yasph2d_tpu.models.wcsph_plane", "WCSPHPlaneSolver"),
        "ShardedDFSPHPadded": (
            "yasph2d_tpu.parallel.shard_dense", "ShardedDFSPHPadded"
        ),
        "ShardedWCSPHPadded": (
            "yasph2d_tpu.parallel.shard_dense", "ShardedWCSPHPadded"
        ),
        "ShardedDFSPHPlane": (
            "yasph2d_tpu.parallel.shard_plane", "ShardedDFSPHPlane"
        ),
        "ShardedWCSPHPlane": (
            "yasph2d_tpu.parallel.shard_plane", "ShardedWCSPHPlane"
        ),
        "SimulationApp": ("yasph2d_tpu.app", "SimulationApp"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
