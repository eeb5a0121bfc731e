"""Multi-chip sharding of the solver state over a device mesh.

The reference is single-process shared-memory (rayon) only (SURVEY.md section 2,
"Parallelism & communication"); the TPU-native scaling path is sharding over a
`jax.sharding.Mesh` with XLA collectives over ICI.

Round-1 strategy: **particle-dimension data parallelism**. Every per-particle array
(leading dimension N) is sharded over the mesh's 'particles' axis; the boundary index
space and all scalars are replicated. Under `jit` with these shardings XLA:
  - partitions every (N, K) gather / per-pair VPU op / masked reduction,
  - turns the residual means of the DFSPH pressure loops into all-reduces
    (the reference's `par_iter().sum()/len`, dfsph.rs:221, 376-377),
  - inserts the all-gathers required by the global cell-key sort.

The global sort is the known scaling limit of this strategy; the planned follow-up is
spatial domain decomposition via `shard_map` with one-cell halo exchange
(`lax.ppermute`), per SURVEY.md section 7 stage 8.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTICLE_AXIS = "particles"


def make_mesh(devices=None, axis_name: str = PARTICLE_AXIS) -> Mesh:
    """1D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _leaf_spec(leaf, num_particles: int) -> P:
    """Shard any array whose leading dim is the particle count; replicate the rest.

    This resolves correctly for the whole DFSPHCarry/WCSPH carry pytree: particle
    state (N,2)/(N,), neighbor tables (N,K), warm-start accumulators (N,) are sharded;
    TimeState scalars, iteration counts, and per-table drop counters are replicated.
    """
    if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == num_particles:
        return P(PARTICLE_AXIS)
    return P()


def carry_shardings(carry, mesh: Mesh):
    """NamedSharding pytree for a solver carry with `num_particles` leading dims."""
    num_particles = carry.particles.positions.shape[0]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, num_particles)), carry
    )


def replicated(pytree, mesh: Mesh):
    """Fully-replicated NamedSharding pytree (boundary grid, static config arrays)."""
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), pytree)


def shard_carry(carry, boundary, mesh: Mesh):
    """Place a solver carry + boundary grid onto the mesh."""
    carry = jax.device_put(carry, carry_shardings(carry, mesh))
    boundary = jax.device_put(boundary, replicated(boundary, mesh))
    return carry, boundary


def pad_particle_count(state, multiple: int, park_at=(-99.0, -99.0), spacing=0.5):
    """Pad a ParticleState so N divides the mesh size.

    Padding particles are parked on a sparse lattice far outside any reasonable scene
    (near the virtual grid origin, default grid_min=(-100,-100)): they have no
    neighbors within the search radius, so they contribute nothing to any pair sum;
    they simply free-fall under gravity like any isolated particle. Production scenes
    should pick counts divisible by the mesh instead (this helper is exact but the
    falling padding inflates the CFL v_max estimate over long runs).
    """
    import jax.numpy as jnp

    n = state.positions.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return state
    side = int(np.ceil(np.sqrt(pad)))
    gx, gy = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
    lattice = np.stack([gx.ravel(), gy.ravel()], axis=-1)[:pad] * spacing
    park = np.asarray(park_at, dtype=np.float32) + lattice.astype(np.float32)
    return type(state)(
        positions=jnp.concatenate([state.positions, jnp.asarray(park)], axis=0),
        velocities=jnp.concatenate(
            [state.velocities, jnp.zeros((pad, 2), state.velocities.dtype)], axis=0
        ),
        densities=jnp.concatenate(
            [state.densities, jnp.zeros((pad,), state.densities.dtype)], axis=0
        ),
    )
