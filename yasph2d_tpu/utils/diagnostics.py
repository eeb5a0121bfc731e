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
    # () i32: particles that wanted to change shards but found no buffer/capacity
    # slot (shard_map spatial decomposition only; 0 single-device)
    migration_drops: jax.Array

    @classmethod
    def zeros(cls) -> "Diagnostics":
        f = jnp.zeros((), dtype=REAL)
        i = jnp.zeros((), dtype=jnp.int32)
        return cls(f, f, i, i, i, f, f, i)

    def accumulate(self, step: "Diagnostics") -> "Diagnostics":
        """Fold one step's diagnostics into a running aggregate.

        `simulate()` carries this through its fori_loop so a transient mid-run
        problem (a cell overflowing for one step, a loop hitting its iteration cap)
        is never silently discarded (the reference accounts overflow per update,
        neighborhood_search.rs:361). Aggregate semantics per field:
        dt = last step's, max_velocity / neighbor_drops / residuals = max over
        steps, iteration counts = SUM over steps (divide by num_steps for the
        iterations-to-tolerance metric)."""
        return Diagnostics(
            dt=step.dt,
            max_velocity=jnp.maximum(self.max_velocity, step.max_velocity),
            neighbor_drops=jnp.maximum(self.neighbor_drops, step.neighbor_drops),
            density_iterations=self.density_iterations + step.density_iterations,
            divergence_iterations=(
                self.divergence_iterations + step.divergence_iterations
            ),
            avg_density_error=jnp.maximum(
                self.avg_density_error, step.avg_density_error
            ),
            avg_divergence=jnp.maximum(self.avg_divergence, step.avg_divergence),
            migration_drops=jnp.maximum(self.migration_drops, step.migration_drops),
        )
