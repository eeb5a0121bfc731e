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


SPACE_AXIS = "space"


def make_space_mesh(devices=None) -> Mesh:
    """1D mesh whose axis shards the dense grid's cell-row (ny) dimension."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SPACE_AXIS,))


def dense_leaf_spec(leaf, num_particles: int, ny: int, nx: int) -> P:
    """PartitionSpec for a DFSPHDenseCarry / BoundaryDense leaf.

    Padded-layout arrays (leading dims (ny, nx) or (ny*nx,)) shard their cell-row
    axis over SPACE_AXIS — XLA's SPMD partitioner converts the +-1-row static slices
    of `neighbor_windows` into one-cell-row halo exchanges over ICI. Sorted (N,)
    particle arrays shard over the same axis (pure data parallelism; the padded <->
    sorted conversion gathers become collectives). Everything else replicates.
    """
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    s = leaf.shape
    if leaf.ndim >= 2 and s[0] == ny and s[1] == nx:
        return P(SPACE_AXIS)
    if s[0] == ny * nx:  # flat (C, P) slot arrays
        return P(SPACE_AXIS)
    if s[0] == num_particles:
        return P(SPACE_AXIS)
    return P()


def dense_shardings(pytree, mesh: Mesh, num_particles: int, ny: int, nx: int):
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, dense_leaf_spec(leaf, num_particles, ny, nx)
        ),
        pytree,
    )


def shard_dense(carry, boundary, mesh: Mesh, grid):
    """Place a DFSPHDenseCarry + BoundaryDense onto the mesh."""
    n = carry.particles.positions.shape[0]
    carry = jax.device_put(carry, dense_shardings(carry, mesh, n, grid.ny, grid.nx))
    boundary = jax.device_put(
        boundary, dense_shardings(boundary, mesh, -1, grid.ny, grid.nx)
    )
    return carry, boundary


def pad_particles_dense(state, multiple: int, grid):
    """Pad a ParticleState so N divides the mesh size — dense-grid variant.

    Padding particles are DEAD (alive == False): the dense backend assigns them
    sentinel cell keys so they never occupy a slot, never interact, and the
    solvers freeze them (zero acceleration, excluded from the CFL max-velocity
    estimate and the residual averages) — a padded run's dt and residuals are
    identical to the unpadded run's. The park position below the domain is
    therefore cosmetic.
    """
    import jax.numpy as jnp

    n = state.positions.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return state
    h = grid.cell_size
    # park positions may overlap freely: dead particles never enter the grid
    xs = grid.origin[0] + (0.5 + np.arange(pad, dtype=np.float32) % grid.nx) * h
    ys = np.full((pad,), grid.origin[1] + 0.5 * h, dtype=np.float32)
    park = np.stack([xs, ys], axis=-1)
    return type(state)(
        positions=jnp.concatenate([state.positions, jnp.asarray(park)], axis=0),
        velocities=jnp.concatenate(
            [state.velocities, jnp.zeros((pad, 2), state.velocities.dtype)], axis=0
        ),
        densities=jnp.concatenate(
            [state.densities, jnp.zeros((pad,), state.densities.dtype)], axis=0
        ),
        alive=jnp.concatenate([state.alive, jnp.zeros((pad,), bool)], axis=0),
    )


def pad_particle_count(state, multiple: int, park_at=(-99.0, -99.0), spacing=0.5):
    """Pad a ParticleState so N divides the mesh size.

    Padding particles are DEAD (alive == False) and parked on a sparse lattice far
    outside any reasonable scene (near the virtual grid origin, default
    grid_min=(-100,-100)): they have no neighbors within the search radius, the
    solvers freeze them (zero acceleration, no advection) and exclude them from
    the CFL max-velocity estimate and the residual averages — padding has no
    effect on dt or physics at any run length.
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
        alive=jnp.concatenate([state.alive, jnp.zeros((pad,), bool)], axis=0),
    )
