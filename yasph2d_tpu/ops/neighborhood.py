"""TPU-native neighborhood search: cell-key sort + fixed-degree neighbor tables.

This replaces the reference's Morton compressed-cell-list search (reference:
src/sph/neighborhood_search.rs) with a design that maps onto XLA/TPU:

reference mechanism                          -> TPU-native replacement
--------------------------------------------------------------------------------------
par_sort_unstable_by_key by morton cell key     `jax.lax.sort` of int32 row-major cell
(neighborhood_search.rs:111-119)                keys, co-sorting a permutation index
compact cell list + BIGMIN 3x3 box scan         row-major keys make each 3-cell row of
(neighborhood_search.rs:90-259)                 the 3x3 neighbor box ONE contiguous key
                                                run; run bounds via vectorized binary
                                                search (jnp.searchsorted)
variable-length neighbor lists in a shared      fixed-degree `(N, K)` neighbor index
AppendBuffer pool (MAX_NUM_NEIGHBORS=64,        matrix + validity mask, built by a
neighborhood_search.rs:312-397)                 masked cumsum-compaction scatter
separate dynamic + static cell grids            same: one sorted table per index space
(neighborhood_search.rs:452-459)                (fluid and boundary particles)

Behavioral contracts carried over from the reference:
- cell size == search radius == smoothing length (neighborhood_search.rs:461-479).
- a particle j is a neighbor of i iff dist^2 <= radius^2 AND dist^2 > MIN_DISTANCE
  (self / degenerate filter, neighborhood_search.rs:324, 352, 370).
- every dynamic update re-sorts ALL particle attributes into cell order; particle
  identity is not stable across steps (fluidparticleworld.rs:235-261). Solvers must
  route persistent per-particle state through the returned permutation.
- neighbor overflow saturates and is *counted* (the reference just printlns,
  neighborhood_search.rs:361) — overflow counts surface in Diagnostics.

The virtual grid is `ROW_WIDTH` cells wide with origin at `grid_min` (the reference
hardcodes grid_min=(-100,-100), neighborhood_search.rs:476-479, with a 2^16-cell morton
wraparound caveat; here keys are row-major int32 and coordinates are clamped to the
virtual grid, so far-escaped particles land in edge cells where the distance filter
discards them — no wraparound aliasing).
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..units import INDEX, REAL

# Self / degenerate-pair filter (reference: neighborhood_search.rs:324).
MIN_DISTANCE_SQ = 1.0e-10


@dataclass(frozen=True)
class GridConfig:
    """Static configuration of the uniform cell grid (hashable; folds into jit)."""

    cell_size: float  # == search radius == smoothing length h
    grid_min: tuple = (-100.0, -100.0)  # reference: neighborhood_search.rs:476-479
    # Virtual row width in cells. Keys are cy * row_width + cx; with 2^15 rows max the
    # key stays within int32. 32768 cells x h covers any reference-scale scene.
    row_width: int = 1 << 15
    # Fixed neighbor degrees. The reference caps dynamic+static combined at 64
    # (MAX_NUM_NEIGHBORS, neighborhood_search.rs:322); we keep separate caps per index
    # space which is how every solver loop consumes them anyway.
    max_neighbors_dynamic: int = 64
    max_neighbors_static: int = 64
    # Max particles gathered per contiguous 3-cell run (per row of the 3x3 box).
    # Default scene occupancy is ~4 particles/cell; 32 per 3 cells is ~2.5x headroom.
    window: int = 32

    @property
    def radius_sq(self) -> float:
        return self.cell_size * self.cell_size

    @property
    def num_rows(self) -> int:
        return (1 << 30) // self.row_width  # keep keys < 2^30


class NeighborTable(NamedTuple):
    """Fixed-degree neighbor lists of query particles into one source index space."""

    idx: jax.Array  # (N, K) int32 indices into the (sorted) source positions
    mask: jax.Array  # (N, K) bool, True where the slot holds a real neighbor
    count: jax.Array  # (N,) int32 number of valid neighbors (post-cap)
    num_dropped: jax.Array  # () int32 neighbors lost to window/K caps (diagnostics)


class CellGrid(NamedTuple):
    """A sorted index space: positions sorted by cell key (the 'compact cell grid')."""

    positions: jax.Array  # (M, 2) sorted by key
    keys: jax.Array  # (M,) int32 sorted cell keys


def cell_keys(positions: jax.Array, grid: GridConfig) -> jax.Array:
    """Row-major cell key per position, clamped into the virtual grid."""
    inv = jnp.asarray(1.0 / grid.cell_size, dtype=REAL)
    gmin = jnp.asarray(grid.grid_min, dtype=REAL)
    coords = jnp.floor((positions - gmin) * inv).astype(INDEX)
    cx = jnp.clip(coords[..., 0], 1, grid.row_width - 2)
    cy = jnp.clip(coords[..., 1], 1, grid.num_rows - 2)
    return cy * grid.row_width + cx


def sort_by_cell_keys(positions: jax.Array, grid: GridConfig):
    """Sort particles into cell order.

    Returns (sorted_keys, permutation) where `permutation[k]` is the pre-sort index of
    the particle now in slot k. Callers apply the permutation to the whole particle
    state pytree (the reference re-sorts all attribute arrays the same way,
    neighborhood_search.rs:122-140).
    """
    keys = cell_keys(positions, grid)
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=INDEX)
    sorted_keys, perm = jax.lax.sort((keys, iota), num_keys=1)
    return sorted_keys, perm


def build_cell_grid(positions: jax.Array, grid: GridConfig) -> CellGrid:
    """Build a sorted index space (used for the static/boundary grid,
    reference: NeighborhoodSearch::update_static, neighborhood_search.rs:488-491)."""
    sorted_keys, perm = sort_by_cell_keys(positions, grid)
    return CellGrid(positions=positions[perm], keys=sorted_keys)


def _run_bounds(query_keys: jax.Array, source_keys: jax.Array, grid: GridConfig):
    """For each query key, the 3 contiguous source runs covering the 3x3 cell box.

    Row-major keys make cells (cy+dy, cx-1..cx+1) one contiguous key interval
    [key + dy*W - 1, key + dy*W + 1]. Returns (starts, ends) of shape (N, 3).
    """
    w = grid.row_width
    base = query_keys[:, None] + jnp.asarray([-w, 0, w], dtype=INDEX)[None, :]
    starts = jnp.searchsorted(source_keys, base - 1, side="left", method="scan_unrolled")
    ends = jnp.searchsorted(source_keys, base + 1, side="right", method="scan_unrolled")
    return starts.astype(INDEX), ends.astype(INDEX)


@partial(jax.jit, static_argnames=("grid", "max_neighbors"))
def build_neighbor_table(
    query_positions: jax.Array,
    query_keys: jax.Array,
    source: CellGrid,
    grid: GridConfig,
    max_neighbors: int,
) -> NeighborTable:
    """Build the fixed-degree neighbor table of queries into a sorted source space.

    Fully vectorized: 3 searchsorted run lookups, a (N, 3*window) candidate gather,
    distance filter, then cumsum-compaction into (N, K) via one scatter.
    """
    n = query_positions.shape[0]
    m = source.positions.shape[0]
    k = max_neighbors
    win = grid.window

    if m == 0:  # empty index space (e.g. a scene without boundary particles)
        return NeighborTable(
            idx=jnp.zeros((n, k), dtype=INDEX),
            mask=jnp.zeros((n, k), dtype=bool),
            count=jnp.zeros((n,), dtype=INDEX),
            num_dropped=jnp.zeros((), dtype=INDEX),
        )

    starts, ends = _run_bounds(query_keys, source.keys, grid)  # (N, 3)

    # Candidate source indices: start of each run + lane offset. (N, 3, win)
    lane = jnp.arange(win, dtype=INDEX)
    cand = starts[:, :, None] + lane[None, None, :]
    in_run = cand < ends[:, :, None]
    # Truncation diagnostics: run entries beyond the gather window.
    run_len = ends - starts
    dropped_window = jnp.sum(jnp.maximum(run_len - win, 0))

    cand = jnp.clip(cand.reshape(n, 3 * win), 0, max(m - 1, 0))
    in_run = in_run.reshape(n, 3 * win)

    cand_pos = source.positions[cand]  # (N, 3*win, 2)
    diff = cand_pos - query_positions[:, None, :]
    dist_sq = jnp.sum(diff * diff, axis=-1)
    valid = (
        in_run
        & (dist_sq <= jnp.asarray(grid.radius_sq, dtype=REAL))
        & (dist_sq > jnp.asarray(MIN_DISTANCE_SQ, dtype=REAL))
    )

    # Compact each row's valid candidates into the first K slots, preserving order.
    slot = jnp.cumsum(valid.astype(INDEX), axis=1) - 1  # target slot per candidate
    write = valid & (slot < k)
    count_all = jnp.where(valid.shape[1] > 0, slot[:, -1] + 1, 0)
    count = jnp.minimum(count_all, k)
    dropped_cap = jnp.sum(jnp.maximum(count_all - k, 0))

    row = jnp.arange(n, dtype=INDEX)[:, None]
    flat_target = jnp.where(write, row * k + slot, n * k)  # out-of-range -> dropped
    idx_flat = jnp.zeros((n * k,), dtype=INDEX)
    idx_flat = idx_flat.at[flat_target.reshape(-1)].set(
        cand.reshape(-1), mode="drop", unique_indices=True
    )
    idx = idx_flat.reshape(n, k)
    mask = jnp.arange(k, dtype=INDEX)[None, :] < count[:, None]

    return NeighborTable(
        idx=idx,
        mask=mask,
        count=count.astype(INDEX),
        num_dropped=(dropped_window + dropped_cap).astype(INDEX),
    )


class Neighborhood(NamedTuple):
    """Both neighbor tables of the fluid particles, rebuilt once per step.

    Mirrors the reference's dual dynamic/static index spaces
    (NeighborRange{count_dynamic, count_total}, neighborhood_search.rs:268-287).
    """

    dynamic: NeighborTable  # fluid -> fluid
    static: NeighborTable  # fluid -> boundary


def build_neighborhood(
    sorted_positions: jax.Array,
    sorted_keys: jax.Array,
    boundary: CellGrid,
    grid: GridConfig,
) -> Neighborhood:
    """Build both tables for already-sorted fluid positions."""
    dyn_source = CellGrid(positions=sorted_positions, keys=sorted_keys)
    dynamic = build_neighbor_table(
        sorted_positions, sorted_keys, dyn_source, grid, grid.max_neighbors_dynamic
    )
    static = build_neighbor_table(
        sorted_positions, sorted_keys, boundary, grid, grid.max_neighbors_static
    )
    return Neighborhood(dynamic=dynamic, static=static)
