"""Per-step diagnostics pytree.

The reference surfaces solver health as printlns (non-convergence warnings,
dfsph.rs:236-245/391-400, neighbor overflow, neighborhood_search.rs:361) and an
on-screen HUD. Here every solver step returns a `Diagnostics` pytree so health stays
on device (no sync) until the host chooses to look.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..units import REAL


class Diagnostics(NamedTuple):
    dt: jax.Array  # () f32: dt used to advance this step
    max_velocity: jax.Array  # () f32: CFL velocity estimate
    neighbor_drops: jax.Array  # () i32: neighbors lost to fixed-degree caps
    density_iterations: jax.Array  # () i32: DFSPH density loop count (0 for WCSPH)
    divergence_iterations: jax.Array  # () i32: DFSPH divergence loop count
    avg_density_error: jax.Array  # () f32: last density residual (abs, kg/m^2)
    avg_divergence: jax.Array  # () f32: last divergence residual (relative, 1/s)

    @classmethod
    def zeros(cls) -> "Diagnostics":
        f = jnp.zeros((), dtype=REAL)
        i = jnp.zeros((), dtype=jnp.int32)
        return cls(f, f, i, i, i, f, f)
