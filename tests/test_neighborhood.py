"""Neighborhood search tests.

Centerpiece is the brute-force oracle test, the port of
`neighbors_contains_neighbors` (reference: src/sph/neighborhood_search.rs:529-556):
1000 seeded-random points, the accelerated neighbor lists must equal an O(n^2) scan.
The reference asserts order equality too; our fixed-degree tables are order-stable in
cell-key order, not reference morton order, so we assert set equality (SURVEY.md
section 7 build order, step 2).
"""

import numpy as np
import jax.numpy as jnp

from yasph2d_tpu.ops.neighborhood import (
    CellGrid,
    GridConfig,
    build_cell_grid,
    build_neighborhood,
    cell_keys,
    sort_by_cell_keys,
)


def brute_force_neighbors(queries, sources, radius, exclude_same_point=True):
    """O(n^2) oracle with the reference's filters (dist^2 <= r^2, dist^2 > 1e-10)."""
    out = []
    for q in queries:
        d = sources - q[None, :]
        dist_sq = (d * d).sum(-1)
        mask = (dist_sq <= radius * radius) & (dist_sq > 1.0e-10)
        out.append(set(np.nonzero(mask)[0].tolist()))
    return out


def test_neighbors_match_bruteforce_dynamic():
    num, density, radius = 1000, 10.0, 1.0
    rng = np.random.default_rng(123456789)
    positions = rng.random((num, 2), dtype=np.float32) * np.sqrt(num / density)

    grid = GridConfig(cell_size=radius, max_neighbors_dynamic=64, window=64)
    sorted_keys, perm = sort_by_cell_keys(jnp.asarray(positions), grid)
    sorted_pos = jnp.asarray(positions)[perm]
    empty_boundary = build_cell_grid(jnp.zeros((0, 2), dtype=jnp.float32), grid)
    nbh = build_neighborhood(sorted_pos, sorted_keys, empty_boundary, grid)

    assert int(nbh.dynamic.num_dropped) == 0
    sorted_np = np.asarray(sorted_pos)
    oracle = brute_force_neighbors(sorted_np, sorted_np, radius)
    idx = np.asarray(nbh.dynamic.idx)
    mask = np.asarray(nbh.dynamic.mask)
    for i in range(num):
        got = set(idx[i][mask[i]].tolist())
        assert got == oracle[i], f"particle {i}: {got ^ oracle[i]} differ"


def test_neighbors_match_bruteforce_static():
    """Fluid-vs-boundary neighbor table against the oracle."""
    rng = np.random.default_rng(42)
    radius = 0.5
    fluid = rng.random((300, 2), dtype=np.float32) * 5.0
    boundary = rng.random((200, 2), dtype=np.float32) * 5.0

    grid = GridConfig(cell_size=radius, max_neighbors_static=64, window=64)
    bgrid = build_cell_grid(jnp.asarray(boundary), grid)
    sorted_keys, perm = sort_by_cell_keys(jnp.asarray(fluid), grid)
    sorted_pos = jnp.asarray(fluid)[perm]
    nbh = build_neighborhood(sorted_pos, sorted_keys, bgrid, grid)

    assert int(nbh.static.num_dropped) == 0
    oracle = brute_force_neighbors(np.asarray(sorted_pos), np.asarray(bgrid.positions), radius)
    idx = np.asarray(nbh.static.idx)
    mask = np.asarray(nbh.static.mask)
    for i in range(fluid.shape[0]):
        got = set(idx[i][mask[i]].tolist())
        assert got == oracle[i]


def test_coincident_particles_filtered():
    """Self and exactly-coincident pairs are filtered by MIN_DISTANCE
    (reference: neighborhood_search.rs:324, 352)."""
    positions = jnp.asarray([[1.0, 1.0], [1.0, 1.0], [1.2, 1.0]], dtype=jnp.float32)
    grid = GridConfig(cell_size=0.5)
    sorted_keys, perm = sort_by_cell_keys(positions, grid)
    sorted_pos = positions[perm]
    empty = build_cell_grid(jnp.zeros((0, 2), dtype=jnp.float32), grid)
    nbh = build_neighborhood(sorted_pos, sorted_keys, empty, grid)
    counts = np.asarray(nbh.dynamic.count)
    # the two coincident particles see only the third; the third sees both coincident
    assert sorted(counts.tolist()) == [1, 1, 2]


def test_neighbor_cap_saturates_and_counts():
    """Overflow saturates at K and is reported, not corrupting
    (vs the reference's println at neighborhood_search.rs:361)."""
    rng = np.random.default_rng(7)
    positions = rng.random((64, 2), dtype=np.float32) * 0.01  # all mutual neighbors
    grid = GridConfig(cell_size=1.0, max_neighbors_dynamic=8, window=128)
    sorted_keys, perm = sort_by_cell_keys(jnp.asarray(positions), grid)
    sorted_pos = jnp.asarray(positions)[perm]
    empty = build_cell_grid(jnp.zeros((0, 2), dtype=jnp.float32), grid)
    nbh = build_neighborhood(sorted_pos, sorted_keys, empty, grid)
    assert int(nbh.dynamic.count.max()) == 8
    assert int(nbh.dynamic.num_dropped) == 64 * (63 - 8)
    # indices in capped slots are still valid in-range indices
    assert np.asarray(nbh.dynamic.idx).max() < 64


def test_escaped_particles_are_harmless():
    """Positions far outside the virtual grid are clamped into edge cells, where the
    distance filter discards them (no wraparound aliasing)."""
    positions = jnp.asarray(
        [[0.0, 0.0], [0.3, 0.0], [1e7, 1e7], [-1e7, -1e7]], dtype=jnp.float32
    )
    grid = GridConfig(cell_size=0.5)
    sorted_keys, perm = sort_by_cell_keys(positions, grid)
    sorted_pos = positions[perm]
    empty = build_cell_grid(jnp.zeros((0, 2), dtype=jnp.float32), grid)
    nbh = build_neighborhood(sorted_pos, sorted_keys, empty, grid)
    counts = np.asarray(nbh.dynamic.count)
    assert counts.sum() == 2  # only the two near-origin particles pair up


def test_cell_keys_contiguous_rows():
    grid = GridConfig(cell_size=1.0, grid_min=(0.0, 0.0))
    # probe interior cells (cell coords are clamped to >= 1 at the virtual-grid edge)
    pos = jnp.asarray([[5.5, 5.5], [6.5, 5.5], [5.5, 6.5]], dtype=jnp.float32)
    keys = np.asarray(cell_keys(pos, grid))
    assert keys[1] - keys[0] == 1  # +1 in x
    assert keys[2] - keys[0] == grid.row_width  # +1 in y
