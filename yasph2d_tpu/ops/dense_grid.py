"""Dense padded cell grid: gather-free neighbor access for TPU.

The fixed-degree `(N, K)` neighbor tables (ops/neighborhood.py) are faithful to the
reference's per-particle neighbor lists (neighborhood_search.rs:312-397) but their
construction and consumption are gather/scatter bound — the worst ops on TPU. This
module is the TPU-first alternative:

  1. particles are sorted by row-major cell key (as before);
  2. the *whole domain* becomes a dense (ny, nx, P) slot grid (P = max occupancy per
     cell, static). Slot tables are built WITHOUT scatters: cell starts come from one
     vectorized binary search, and a cell's slots are `start + lane` because sorted
     particles of one cell are contiguous;
  3. every per-pair interaction reads its 3x3 cell neighborhood through NINE STATIC
     SLICES of a (ny+2, nx+2, P, ...) zero-padded array — no gather, no scatter, no
     searchsorted in the hot loop. Pair reductions are dense (ny, nx, P, 9P) VPU ops
     that XLA fuses.

The (9P,) candidate axis plays the role of the reference's neighbor list; masked
slots simply contribute zero (kernels evaluate to 0 outside support). The domain box
is static configuration (DenseGridConfig); escaped particles clamp into border cells
where the distance filter drops their interactions, and cell overflow beyond P is
counted and surfaced in diagnostics, mirroring the reference's neighbor-overflow
accounting (neighborhood_search.rs:361).

Sharding: the ny axis is the natural `shard_map` spatial-decomposition axis; the
zero-padding rows become one-cell-row halos exchanged with `lax.ppermute`.
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..units import INDEX, REAL

MIN_DISTANCE_SQ = 1.0e-10  # self/degenerate filter (reference: neighborhood_search.rs:324)

# Below this many slots (num_cells * occupancy), pair passes and the re-bucket
# run UNBANDED (single block): the lax.map band machinery dominates small grids
# (measured on the bench scenes: 10k scene = 127k slots, unbanded 3.06 vs
# banded 4.37 ms/step; 100k scene = 1.17M slots, unbanded 66.9 vs banded
# 19.6 ms/step — the crossover sits between).
SMALL_GRID_SLOTS = 300_000


@dataclass(frozen=True)
class DenseGridConfig:
    """Static dense-grid configuration (hashable; folds into jit).

    The grid covers [origin, origin + (nx, ny) * cell_size); cell_size == search
    radius == smoothing length (neighborhood_search.rs:461-479 contract).
    """

    cell_size: float
    origin: tuple  # (x0, y0)
    nx: int
    ny: int
    occupancy: int = 8  # P: max particles per cell (static)
    # Pair passes process (row_block x col_block) cell tiles at a time (lax.map):
    # bounds per-pair temporaries (keeps 1M-particle grids inside HBM) and sets the
    # granularity of empty-tile skipping — tiles with no live query or source slots
    # are skipped with lax.cond. row_block 16 measured ~15% faster than 64 at 100k.
    # None = no chunking along that axis.
    row_block: Optional[int] = 16
    col_block: Optional[int] = None
    # Column blocking for the fluid-vs-boundary pass ONLY: boundary particles
    # occupy a thin shell (walls ~3 columns wide + floor), so most of a live
    # band's tiles see no boundary at all and skip (1M: 238 -> 233 ms/step).
    # General-pass column blocking measured counterproductive at every scale
    # (PERF.md); None disables.
    boundary_col_block: Optional[int] = 256
    # Pair passes loop the nine 3x3 views with per-view accumulation instead of
    # concatenating them into one (.., 9Ps) candidate axis (see
    # _pair_reduce_block_views). Same math; f32 reduction grouping differs.
    pair_view_loop: bool = False
    # Run pair passes through the Pallas TPU kernel (ops/pallas_pair.py) instead of
    # the XLA lax.map path. Same math, VMEM-resident windows. This first-generation
    # kernel does not compile on the deployment's remote Mosaic service (PERF.md);
    # prefer use_pallas_slotmajor.
    use_pallas: bool = False
    pallas_block_rows: int = 8
    # Run the FLUID-FLUID pair passes through the slot-major Pallas kernel
    # (ops/pallas_slotmajor.py): spatial dims on (sublane, lane), slots/vector
    # components as leading-dim planes — the layout Mosaic compiles and runs
    # 2.86x faster than the XLA band (PERF.md round 3). The fluid-vs-boundary
    # pass keeps the XLA path (thin-shell column blocking). Single-device only.
    use_pallas_slotmajor: bool = False
    pallas_sm_row_block: int = 8
    # Column-chunk width (lanes, multiple of 128) of the plane-form kernels'
    # occupancy-adaptive slot bounds: smaller chunks skip dead work at finer
    # granularity but pay 13x the loop-control overhead at the 1M grid; None =
    # one full-width chunk per band (per-BAND slot bounds, every vector op on
    # whole (BR, NXP) planes). Outputs are bitwise-identical at every width.
    pallas_pf_chunk_lanes: Optional[int] = None
    # Chunk width for the fluid-BOUNDARY (stat) pair passes only. The boundary
    # is a thin shell but its side walls flag every band, so a full-width stat
    # pass runs the whole grid width per band while almost all interior column
    # chunks contain no boundary source at all — finer chunks skip them
    # outright (the skip-if-dead-on-either-side test in _pf_kernel), and the
    # ILP cost of narrow chunks is irrelevant when the surviving work is a few
    # edge chunks per band. Measured PERF.md round 4. Sentinel -1 = inherit
    # pallas_pf_chunk_lanes.
    pallas_pf_stat_chunk_lanes: Optional[int] = -1
    # Chunk width for the plane-form RE-BUCKET only. pf_rebucket's per-VIEW
    # slot bounds only pay at fine chunks (at full width every band has some
    # mover in every direction; in a 128-lane window most of the eight mover
    # views are empty and their slot loops run zero iterations). Sentinel
    # -1/None = inherit pallas_pf_chunk_lanes. Outputs are bitwise identical
    # at every width (measured PERF.md round 5).
    pallas_pf_rebucket_chunk_lanes: Optional[int] = -1
    # Unroll the pf kernels' slot loops statically (the round-3 kernel
    # structure) instead of occupancy-bounded fori_loops. On SMALL grids the
    # fori loop-control overhead dominates and the unrolled kernel's ILP wins
    # (the round-4 10k regression, 2.38 -> 3.00 ms); on large grids unrolling
    # at high occupancy is the round-3 Mosaic compile wall. "auto" = unroll
    # below SMALL_GRID_SLOTS. Outputs are bitwise identical either way (every
    # candidate a bound excludes was masked to an exact +0.0).
    pallas_pf_unroll: Union[bool, str] = "auto"
    # Dtype of the per-pair math inside pair_reduce: "float32" (exact, default) or
    # "bfloat16" (fast path). bfloat16 uses CELL-RELATIVE coordinates: positions are
    # rebased onto their own cell center (magnitude <= h/2, so pair differences
    # survive the 8-bit mantissa; absolute coordinates would not — see
    # arXiv:2401.08586 for the mixed-precision MD analog), per-pair kernel math runs
    # in bf16, and every candidate-axis reduction accumulates in float32. Expected
    # per-pair position error ~0.5% of h; densities land well inside the DFSPH
    # per-second tolerance band but NOT within float32 parity of the reference —
    # this is an opt-in speed mode (halves the HBM traffic of windowed operands and
    # materialized pair intermediates), not the conformance path.
    pair_dtype: str = "float32"
    # Multi-chip spatial decomposition (parallel/shard_dense.py): when set to
    # (axis_name, n_shards), this config describes ONE SHARD's row slice (ny =
    # ny_global / n_shards) running inside `shard_map`, and pair_reduce fetches its
    # +-1 source cell rows from the neighbor shards with `lax.ppermute` instead of
    # zero-padding — the one-cell halo exchange of SURVEY.md section 7 stage 8.
    halo_axis: Optional[Tuple[str, int]] = None

    @property
    def pair_jnp_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.pair_dtype]

    @property
    def pf_unroll_resolved(self) -> bool:
        """Whether the pf kernels unroll their slot loops (see
        pallas_pf_unroll)."""
        if self.pallas_pf_unroll == "auto":
            return self.num_cells * self.occupancy < SMALL_GRID_SLOTS
        return bool(self.pallas_pf_unroll)

    @property
    def pf_stat_chunk_kw(self) -> dict:
        """chunk_lanes override kwargs for the fluid-BOUNDARY (stat) pf pair
        passes. Both -1 (documented sentinel) and None (the sibling field's
        convention) mean "inherit pallas_pf_chunk_lanes" -> empty kwargs."""
        v = self.pallas_pf_stat_chunk_lanes
        return {} if v in (None, -1) else {"chunk_lanes": v}

    @property
    def radius_sq(self) -> float:
        return self.cell_size * self.cell_size

    @property
    def num_cells(self) -> int:
        return self.nx * self.ny

    def contains(self, rect) -> bool:
        x, y, w, h = rect
        x1 = self.origin[0] + self.nx * self.cell_size
        y1 = self.origin[1] + self.ny * self.cell_size
        return x >= self.origin[0] and y >= self.origin[1] and x + w <= x1 and y + h <= y1


def cell_coords(positions: jax.Array, grid: DenseGridConfig):
    """(cx, cy) int32 cell coordinates, clamped into the grid."""
    inv = jnp.asarray(1.0 / grid.cell_size, dtype=REAL)
    origin = jnp.asarray(grid.origin, dtype=REAL)
    coords = jnp.floor((positions - origin) * inv).astype(INDEX)
    cx = jnp.clip(coords[..., 0], 0, grid.nx - 1)
    cy = jnp.clip(coords[..., 1], 0, grid.ny - 1)
    return cx, cy


def cell_keys(positions: jax.Array, grid: DenseGridConfig, alive=None) -> jax.Array:
    """Row-major cell key per particle. Dead particles (alive == False) get the
    sentinel key `num_cells`, which sorts after every real cell and is excluded
    from the slot grid entirely (see build_slot_grid) — padding particles
    therefore cost no pair work and cannot overflow cells."""
    cx, cy = cell_coords(positions, grid)
    keys = cy * grid.nx + cx
    if alive is not None:
        keys = jnp.where(alive, keys, jnp.asarray(grid.num_cells, dtype=keys.dtype))
    return keys


class SlotGrid(NamedTuple):
    """Dense slot layout of one sorted index space.

    `slot_idx[c, p]` indexes into the SORTED particle arrays; `slot_mask[c, p]` marks
    live slots. `inverse[i] = c_i * P + rank_i` maps sorted particle order to flat
    slot order (for padded<->sorted conversions). `num_dropped` counts particles
    beyond the per-cell occupancy cap.
    """

    slot_idx: jax.Array  # (C, P) int32 into sorted arrays (clamped where masked)
    slot_mask: jax.Array  # (C, P) bool
    inverse: jax.Array  # (N,) int32 into flat (C*P,) slot order
    in_grid: jax.Array  # (N,) bool: particle kept (rank < P)
    num_dropped: jax.Array  # () int32


def build_slot_grid(sorted_keys: jax.Array, grid: DenseGridConfig) -> SlotGrid:
    """Build the dense slot layout from sorted cell keys. Scatter-free."""
    n = sorted_keys.shape[0]
    p = grid.occupancy
    c = grid.num_cells

    if n == 0:
        return SlotGrid(
            slot_idx=jnp.zeros((c, p), dtype=INDEX),
            slot_mask=jnp.zeros((c, p), dtype=bool),
            inverse=jnp.zeros((0,), dtype=INDEX),
            in_grid=jnp.zeros((0,), dtype=bool),
            num_dropped=jnp.zeros((), dtype=INDEX),
        )

    # counts[c] by scatter-add, starts[c] by exclusive cumsum: measured 10.8x
    # faster than searchsorted(method="scan_unrolled") on TPU (19.8 -> 1.8 ms at
    # C=167k, tools/probe_layout_ops.py). Equivalent because keys are sorted:
    # starts[c] = first sorted index with key >= c. Keys >= C are the
    # dead-particle sentinel (cell_keys with an alive mask): mode="drop" excludes
    # them from counts, and they sort to the tail, past every cell's slots.
    counts = jnp.zeros((c,), dtype=INDEX).at[sorted_keys].add(
        jnp.ones((), dtype=INDEX), mode="drop"
    )
    starts = (jnp.cumsum(counts) - counts).astype(INDEX)

    lane = jnp.arange(p, dtype=INDEX)
    slot_idx = starts[:, None] + lane[None, :]
    slot_mask = lane[None, :] < jnp.minimum(counts, p)[:, None]
    slot_idx = jnp.clip(slot_idx, 0, n - 1)

    # rank of each sorted particle within its cell
    rank = jnp.arange(n, dtype=INDEX) - starts[jnp.minimum(sorted_keys, c - 1)]
    in_grid = (rank < p) & (sorted_keys < c)
    inverse = jnp.clip(sorted_keys * p + jnp.minimum(rank, p - 1), 0, c * p - 1)
    num_dropped = jnp.sum(jnp.maximum(counts - p, 0)).astype(INDEX)

    return SlotGrid(
        slot_idx=slot_idx,
        slot_mask=slot_mask,
        inverse=inverse.astype(INDEX),
        in_grid=in_grid,
        num_dropped=num_dropped,
    )


def sort_by_dense_keys(pytree, positions: jax.Array, grid: DenseGridConfig,
                       alive=None):
    """Sort a particle-attribute pytree into dense cell-key order.

    Shared by the dense solvers; same identity-instability contract as
    world.sort_particles. Dead particles (alive mask) get the sentinel key and
    sort to the tail, outside every cell. Returns (sorted_pytree, sorted_keys)."""
    keys = cell_keys(positions, grid, alive)
    n = positions.shape[0]
    sorted_keys, perm = jax.lax.sort(
        (keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    return jax.tree_util.tree_map(lambda a: a[perm], pytree), sorted_keys


def pad_to_slots(values: jax.Array, slots: SlotGrid, grid: DenseGridConfig,
                 row_block: int = None):
    """Sorted per-particle values (N, ...) -> padded (ny, nx, P, ...); masked slots
    hold the value at a clamped index (callers must mask). An empty index space
    (N == 0, e.g. a scene without boundary particles) yields zeros — its slot mask
    is all-false so the values never matter.

    `row_block`: chunk the gather over cell-row bands and SKIP bands with no live
    slots (their output is zeros — callers mask anyway). Slot-pad gather cost
    scales with output rows and the slot grid holds ~10x more slots than particles
    at large scales where most of the domain is empty air, so band skipping cuts
    the dominant rebuild gather roughly by the empty-band fraction (PERF.md).
    """
    shape = (grid.ny, grid.nx, grid.occupancy) + values.shape[1:]
    if values.shape[0] == 0:
        return jnp.zeros(shape, dtype=values.dtype)
    # Band skipping pays at production scales (measured: 26.1 vs 29.5 ms/step at
    # 100k = 1.17M slots, 64.9 -> 26.8 ms for the rebuild gather at 1M); below
    # ~1M slots (test-sized grids) the per-band lax.map overhead dominates.
    if (row_block is None or row_block >= grid.ny
            or grid.num_cells * grid.occupancy < 1_000_000):
        padded = values[slots.slot_idx]  # (C, P, ...)
        return padded.reshape(shape)

    rb = row_block
    nbr = -(-grid.ny // rb)
    rows_pad = nbr * rb
    idx = slots.slot_idx.reshape(grid.ny, grid.nx, grid.occupancy)
    msk = slots.slot_mask.reshape(grid.ny, grid.nx, grid.occupancy)
    if rows_pad != grid.ny:
        extra = rows_pad - grid.ny
        idx = jnp.concatenate(
            [idx, jnp.zeros((extra, grid.nx, grid.occupancy), idx.dtype)], axis=0
        )
        msk = jnp.concatenate(
            [msk, jnp.zeros((extra, grid.nx, grid.occupancy), bool)], axis=0
        )
    idx_b = idx.reshape(nbr, rb, grid.nx, grid.occupancy)
    msk_b = msk.reshape(nbr, rb, grid.nx, grid.occupancy)

    def body(args):
        i_b, m_b = args

        def run(_):
            return values[i_b]

        def skip(_):
            return jnp.zeros(
                (rb, grid.nx, grid.occupancy) + values.shape[1:], values.dtype
            )

        return jax.lax.cond(jnp.any(m_b), run, skip, None)

    out = jax.lax.map(body, (idx_b, msk_b))
    out = out.reshape((rows_pad, grid.nx, grid.occupancy) + values.shape[1:])
    return out[: grid.ny]


def slots_to_sorted(padded: jax.Array, slots: SlotGrid, grid: DenseGridConfig,
                    fallback=None):
    """Padded (ny, nx, P, ...) -> sorted per-particle (N, ...).

    Particles dropped by cell overflow (rank >= P) have no slot; they receive
    `fallback` (per-particle array or scalar; default 0) instead of another
    particle's values — overflow degrades gracefully, like the reference's neighbor
    truncation (neighborhood_search.rs:361), never corrupts.
    """
    flat = padded.reshape((grid.num_cells * grid.occupancy,) + padded.shape[3:])
    gathered = flat[slots.inverse]
    if fallback is None:
        fallback = jnp.zeros((), dtype=gathered.dtype)
    in_grid = slots.in_grid.reshape((-1,) + (1,) * (gathered.ndim - 1))
    return jnp.where(in_grid, gathered, fallback)


def neighbor_windows(padded: jax.Array):
    """All 3x3 cell-neighborhood slots as one candidate axis.

    padded: (ny, nx, P, ...) -> (ny, nx, 9P, ...): for each cell, the slots of its
    nine surrounding cells (zero-padded at the domain border). Nine STATIC slices —
    the only data movement is XLA-fused shifting.
    """
    ny, nx, p = padded.shape[:3]
    z = jnp.zeros_like(padded[:1])
    rows = jnp.concatenate([z, padded, z], axis=0)  # (ny+2, nx, P, ...)
    zc = jnp.zeros_like(rows[:, :1])
    full = jnp.concatenate([zc, rows, zc], axis=1)  # (ny+2, nx+2, P, ...)

    views = [
        full[dy : dy + ny, dx : dx + nx]  # (ny, nx, P, ...)
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.concatenate(views, axis=2)  # (ny, nx, 9P, ...)


def _view_offsets(grid: DenseGridConfig, num_source_slots: int, dtype):
    """(9*Ps, 2) constant: for candidate k of view (dy, dx), the cell-center delta
    (candidate cell center - query cell center) = ((dx-1)*h, (dy-1)*h). Added back
    to cell-relative pair differences to recover absolute geometry."""
    import numpy as np

    h = grid.cell_size
    off = np.asarray(
        [((dx - 1) * h, (dy - 1) * h) for dy in range(3) for dx in range(3)],
        dtype=np.float32,
    )
    return jnp.asarray(np.repeat(off, num_source_slots, axis=0), dtype=dtype)


def halo_rows(a: jax.Array, grid: DenseGridConfig) -> jax.Array:
    """+-1 cell rows around a (ny, nx, ...) padded array: zero-padded on a single
    device; fetched from the neighbor shards with `lax.ppermute` under spatial
    sharding (grid.halo_axis). The exchange runs unconditionally on every shard."""
    if grid.halo_axis is None:
        zr = jnp.zeros_like(a[:1])
        return jnp.concatenate([zr, a, zr], axis=0)
    axis_name, n_shards = grid.halo_axis
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    # shard i+1's "row below 0" is shard i's last row; edge shards get zeros
    # (ppermute fills unaddressed destinations with zeros)
    below = jax.lax.ppermute(a[-1:], axis_name, fwd)
    above = jax.lax.ppermute(a[:1], axis_name, bwd)
    return jnp.concatenate([below, a, above], axis=0)


def halo2d(a: jax.Array, grid: DenseGridConfig) -> jax.Array:
    """One-cell halo on all four sides: shard-exchanged rows, zero columns."""
    a = halo_rows(a, grid)
    zc = jnp.zeros_like(a[:, :1])
    return jnp.concatenate([zc, a, zc], axis=1)


def halo2d_multi(arrays, grid: DenseGridConfig) -> list:
    """`halo2d` over several same-grid arrays sharing ONE ppermute pair.

    Under spatial sharding every collective launch carries fixed latency —
    measured as +94% whole-step wrapper overhead at n_shards=1/100k (PERF.md
    round 3) where the permutes are empty — and per-operand halo exchange
    costs 2 ppermutes per array per pass. Here the boundary cell rows of ALL
    operands are packed along one trailing axis, exchanged with a single
    ppermute pair, and unpacked. Single-device grids (halo_axis None) keep
    the plain per-array zero-padding path: no packing cost where there is no
    collective to save.

    Exactness: operands are packed in float32 (or bfloat16 iff every operand
    is bfloat16); bool and bfloat16 round-trip exactly through float32, as do
    integers up to 2^24 — the operand sets in play are positions/masks/values
    (pair passes) and 0..9 move codes (re-bucket).
    """
    arrays = list(arrays)
    if grid.halo_axis is None or len(arrays) <= 1:
        return [halo2d(a, grid) for a in arrays]
    axis_name, n_shards = grid.halo_axis
    pack = (
        jnp.bfloat16
        if all(a.dtype == jnp.bfloat16 for a in arrays)
        else REAL
    )
    nx = arrays[0].shape[1]

    def row(a, sl):
        return a[sl].astype(pack).reshape(1, nx, -1)

    bottom = jnp.concatenate([row(a, slice(-1, None)) for a in arrays], axis=-1)
    top = jnp.concatenate([row(a, slice(0, 1)) for a in arrays], axis=-1)
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    # shard i+1's "row below 0" is shard i's last row; edge shards get zeros
    below = jax.lax.ppermute(bottom, axis_name, fwd)
    above = jax.lax.ppermute(top, axis_name, bwd)
    out, o = [], 0
    for a in arrays:
        k = 1
        for s in a.shape[2:]:
            k *= s
        shp = (1,) + a.shape[1:]
        b = below[..., o : o + k].reshape(shp).astype(a.dtype)
        t = above[..., o : o + k].reshape(shp).astype(a.dtype)
        o += k
        h = jnp.concatenate([b, a, t], axis=0)
        zc = jnp.zeros_like(h[:, :1])
        out.append(jnp.concatenate([zc, h, zc], axis=1))
    return out


def _pair_reduce_block(fn, q_pos, q_mask, query_vals, s_pos_halo, s_mask_halo,
                       cand_vals_halo, grid: DenseGridConfig, scalar_args=(),
                       relative: bool = False):
    """One tile's pair reduction.

    q_* / query_vals: (B, C, P, ...) query tile; s_*_halo / cand_vals_halo:
    (B+2, C+2, Ps, ...) source tile including a one-cell halo on every side.

    `relative`: positions are CELL-RELATIVE (rebased onto each cell's own center);
    pair differences add the constant per-view center delta back. Used by the
    bfloat16 fast path, where absolute coordinates would not survive rounding.
    Candidate-axis reductions always accumulate in float32 regardless of the
    per-pair dtype.
    """
    if grid.pair_view_loop:
        return _pair_reduce_block_views(
            fn, q_pos, q_mask, query_vals, s_pos_halo, s_mask_halo,
            cand_vals_halo, grid, scalar_args, relative=relative,
        )
    b, c = q_pos.shape[0], q_pos.shape[1]

    def windows(halo):
        # stack the 3x3 neighborhood along the candidate axis (pure static slices)
        views = [
            halo[dy : dy + b, dx : dx + c]
            for dy in range(3)
            for dx in range(3)
        ]
        return jnp.concatenate(views, axis=2)  # (B, C, 9P, ...)

    cand_pos = windows(s_pos_halo)
    cand_mask = windows(s_mask_halo)
    cand_vals = [windows(v)[:, :, None] for v in cand_vals_halo]
    q_vals = [
        v[:, :, :, None] if v.ndim == 3 else v[:, :, :, None, :] for v in query_vals
    ]

    ri_to_rj = cand_pos[:, :, None, :, :] - q_pos[:, :, :, None, :]
    if relative:
        off = _view_offsets(grid, s_pos_halo.shape[2], q_pos.dtype)
        ri_to_rj = ri_to_rj + off[None, None, None, :, :]
    r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
    # python-float bounds keep weak typing: the compare runs in the pair dtype
    valid = (
        q_mask[:, :, :, None]
        & cand_mask[:, :, None, :]
        & (r_sq <= grid.radius_sq)
        & (r_sq > MIN_DISTANCE_SQ)
    )

    per_pair = fn(ri_to_rj, r_sq, jnp.sqrt(r_sq), *scalar_args, *q_vals, *cand_vals)
    red, widths, treedef = _packed_candidate_reduce(per_pair, valid)
    return _unpack_components(red, widths, treedef)


def _packed_candidate_reduce(per_pair, valid):
    """Pack EVERY output leaf of a pair pass (scalars get a unit axis, vectors
    decompose into scalar components) along one trailing component axis and
    reduce the candidate axis ONCE (measured whole-step: ~4% at 1M; a single
    reduce also guarantees one consumer of the per-pair tensor — the round-1
    regression came from several reduce consumers forcing rematerialization).
    Returns (reduced (..., L) float32, widths, treedef) for _unpack_components."""
    leaves, treedef = jax.tree_util.tree_flatten(per_pair)
    widths = [None if l.ndim == valid.ndim else l.shape[-1] for l in leaves]
    comps = []
    for leaf, w in zip(leaves, widths):
        if w is None:
            comps.append(leaf)
        else:
            comps.extend(leaf[..., i] for i in range(w))
    packed = comps[0][..., None] if len(comps) == 1 else jnp.stack(comps, axis=-1)
    red = jnp.sum(jnp.where(valid[..., None], packed, 0.0), axis=3, dtype=REAL)
    return red, widths, treedef


def _unpack_components(red, widths, treedef):
    outs = []
    off = 0
    for w in widths:
        k = 1 if w is None else w
        piece = red[..., off:off + k]
        outs.append(piece[..., 0] if w is None else piece)
        off += k
    return jax.tree_util.tree_unflatten(treedef, outs)


def _pair_reduce_block_views(fn, q_pos, q_mask, query_vals, s_pos_halo,
                             s_mask_halo, cand_vals_halo, grid: DenseGridConfig,
                             scalar_args=(), relative: bool = False):
    """View-loop variant of _pair_reduce_block: instead of concatenating the nine
    3x3-neighborhood views into one (B, C, 9Ps) candidate axis and reducing it,
    loop the views in Python (static unroll) and ACCUMULATE nine per-view masked
    reduces of (B, C, P, Ps) tensors. The concatenate is a fusion boundary on TPU
    — the concatenated per-pair tensor round-trips HBM (~2.9 GB/pass at 1M);
    per-view tensors are 1/9 the size and each slice -> math -> reduce chain can
    fuse end-to-end. Same math, same f32 accumulation; only the reduction
    grouping (and thus f32 rounding order) differs."""
    b, c = q_pos.shape[0], q_pos.shape[1]
    q_vals = [
        v[:, :, :, None] if v.ndim == 3 else v[:, :, :, None, :] for v in query_vals
    ]

    acc = None
    widths = treedef = None
    h = grid.cell_size
    for dy in range(3):
        for dx in range(3):
            c_pos = s_pos_halo[dy : dy + b, dx : dx + c]  # (B, C, Ps, 2)
            c_mask = s_mask_halo[dy : dy + b, dx : dx + c]
            c_vals = [v[dy : dy + b, dx : dx + c][:, :, None] for v in cand_vals_halo]

            ri_to_rj = c_pos[:, :, None, :, :] - q_pos[:, :, :, None, :]
            if relative:
                off = jnp.asarray([(dx - 1) * h, (dy - 1) * h], dtype=q_pos.dtype)
                ri_to_rj = ri_to_rj + off
            r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
            valid = (
                q_mask[:, :, :, None]
                & c_mask[:, :, None, :]
                & (r_sq <= grid.radius_sq)
                & (r_sq > MIN_DISTANCE_SQ)
            )
            per_pair = fn(
                ri_to_rj, r_sq, jnp.sqrt(r_sq), *scalar_args, *q_vals, *c_vals
            )
            red, widths, treedef = _packed_candidate_reduce(per_pair, valid)
            acc = red if acc is None else acc + red

    return _unpack_components(acc, widths, treedef)


def pair_map(
    fn,
    query_padded_pos: jax.Array,  # (ny, nx, P, 2)
    query_mask: jax.Array,  # (ny, nx, P)
    source_padded_pos: jax.Array,  # (ny, nx, Ps, 2)
    source_mask: jax.Array,  # (ny, nx, Ps)
    grid: DenseGridConfig,
):
    """Per-pair map WITHOUT reduction: returns fn applied to every (query, candidate)
    pair, invalid pairs zeroed. Output leaves are (ny, nx, P, 9Ps[, D]) — LARGE
    (9Ps times the slot count); used to cache pair-invariant quantities (kernel
    gradients) consumed by several loop iterations. Callers are responsible for the
    memory tradeoff."""
    cand_pos = neighbor_windows(source_padded_pos)
    cand_mask = neighbor_windows(source_mask)
    ri_to_rj = cand_pos[:, :, None, :, :] - query_padded_pos[:, :, :, None, :]
    r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
    valid = (
        query_mask[:, :, :, None]
        & cand_mask[:, :, None, :]
        & (r_sq <= jnp.asarray(grid.radius_sq, dtype=REAL))
        & (r_sq > jnp.asarray(MIN_DISTANCE_SQ, dtype=REAL))
    )
    per_pair = fn(ri_to_rj, r_sq, jnp.sqrt(r_sq))

    def mask_leaf(leaf):
        mask = valid if leaf.ndim == valid.ndim else valid[..., None]
        return jnp.where(mask, leaf, 0.0)

    return jax.tree_util.tree_map(mask_leaf, per_pair)


def move_codes(positions_pad: jax.Array, mask: jax.Array, grid: DenseGridConfig,
               row0=None) -> jax.Array:
    """Per-slot clamped move code for the re-bucket, in the OLD slot layout.

    A live slot whose (advected) position falls in cell (cy, cx) relative to its
    current cell (iy, ix) gets code (dy+1)*3 + (dx+1) + 1 in 1..9 with
    dy/dx = clip(c-i, -1, 1); dead slots get 0 (never selected). `row0` is the
    shard's global cell-row offset (see `rebucket`)."""
    ny, nx, p = mask.shape
    iy = jnp.arange(ny, dtype=INDEX)[:, None, None]
    if row0 is not None:
        iy = iy + row0
    ix = jnp.arange(nx, dtype=INDEX)[None, :, None]
    cx, cy = cell_coords(positions_pad, grid)  # clamped into the (global) grid
    if row0 is not None:
        # cell_coords clamps cy into [0, ny-1] of the LOCAL grid config; recompute
        # against the global row range so cross-shard moves survive
        inv = jnp.asarray(1.0 / grid.cell_size, dtype=REAL)
        origin = jnp.asarray(grid.origin, dtype=REAL)
        n_shards = grid.halo_axis[1] if grid.halo_axis is not None else 1
        cy = jnp.clip(
            jnp.floor((positions_pad[..., 1] - origin[1]) * inv).astype(INDEX),
            0, ny * n_shards - 1,
        )
    dy = jnp.clip(cy - iy, -1, 1)
    dx = jnp.clip(cx - ix, -1, 1)
    return jnp.where(mask, (dy + 1) * 3 + (dx + 1) + 1, 0).astype(jnp.int32)


def rebucket(positions_pad: jax.Array, mask: jax.Array, values_pad: jax.Array,
             grid: DenseGridConfig, row_block: int = None, row0=None):
    """Windowed re-bucketing: move every live slot into the cell containing its
    (advected) position, entirely in padded layout — the padded-resident carry's
    replacement for the sort -> slot-build -> pad gather -> unpad gather chain of
    the sorted pipeline (reference: the per-step Morton re-sort of
    neighborhood_search.rs:90-166; same identity-instability contract).

    Correctness rests on the CFL bound: dt <= cfl * 0.4 * diameter / v_max keeps
    per-step displacement under one cell (cell_size == h = 2 * smoothing_factor
    * r), so a particle's new cell is always inside its old 3x3 neighborhood.
    Moves are CLAMPED to that window (a faster-than-CFL particle — already
    physically broken — is slowed in grid space rather than lost), so every live
    slot lands in exactly one target cell and sum(new_mask) == sum(mask) -
    num_dropped, where num_dropped counts target-cell occupancy overflow beyond P.
    Unlike the sorted pipeline (where overflow particles survive outside the grid
    and can return), padded-resident overflow REMOVES the particle; callers
    surface the count in Diagnostics and healthy runs keep it at zero.

    positions_pad: (ny, nx, P, 2) advected positions in the OLD slot layout;
    values_pad: (ny, nx, P, D) extra state columns that travel with the particle.
    `row0`: this shard's global cell-row offset under spatial sharding (halo rows
    then come from the neighbor shards via lax.ppermute, which also performs the
    cross-shard particle migration structurally).

    Returns (new_positions_pad, new_mask, new_values_pad, num_dropped).

    Per target cell the nine neighbor views contribute 9P candidates; a candidate
    is selected iff its clamped move code matches the view it is seen through:
    a move of (dy, dx) gets code (dy+1)*3 + (dx+1) + 1 in 1..9 (0 = dead slot or
    halo padding, never selected), and a candidate seen through view v (source
    cell (y + v//3 - 1, x + v%3 - 1)) lands at (y, x) iff its code equals 9 - v.
    Selected candidates compact into slots in deterministic (view, slot) order
    via a running count and a one-hot contraction (a batched (P x 9P) @
    (9P x D+2) matmul per cell — MXU work, not gather/scatter).
    """
    ny, nx, p = mask.shape
    d = values_pad.shape[-1]

    code = move_codes(positions_pad, mask, grid, row0)

    # candidate payload: [positions | values]
    payload = jnp.concatenate([positions_pad, values_pad], axis=-1)

    code_h, payload_h = halo2d_multi([code, payload], grid)

    # windows convention (neighbor_windows): view v = dy*3+dx slices
    # full[dy:dy+ny, dx:dx+nx], i.e. the candidate's source cell is
    # (y+dy-1, x+dx-1); it lands at (y, x) iff its move is (1-dy, 1-dx),
    # whose code is (1-dy+1)*3 + (1-dx+1) + 1 = 9 - v + ... = 10 - (v+1) = 9-v+0
    expected_view = jnp.asarray(
        [(2 - dy_) * 3 + (2 - dx_) + 1 for dy_ in range(3) for dx_ in range(3)],
        dtype=jnp.int32,
    )
    expected = jnp.repeat(expected_view, p)  # (9P,)

    rb = min(row_block or ny, ny)
    if grid.num_cells * grid.occupancy < SMALL_GRID_SLOTS:
        rb = ny  # small grid: see SMALL_GRID_SLOTS
    nbr = -(-ny // rb)
    if nbr * rb != ny:
        # row padding would desynchronize halo rows under sharding; extend with
        # dead rows on a single device only (callers pick rb | ny when sharded)
        assert grid.halo_axis is None, (
            f"sharded rebucket needs ny ({ny}) divisible by row_block ({rb})"
        )
        extra = nbr * rb - ny
        code_h = jnp.concatenate(
            [code_h, jnp.zeros((extra,) + code_h.shape[1:], code_h.dtype)], axis=0
        )
        payload_h = jnp.concatenate(
            [payload_h, jnp.zeros((extra,) + payload_h.shape[1:], payload_h.dtype)],
            axis=0,
        )

    lane = jnp.arange(p, dtype=jnp.int32)

    def windows(h):
        # (rb+2, nx+2, P, ...) haloed tile -> (rb, nx, 9P, ...) candidate axis
        views = [
            h[dy_ : dy_ + rb, dx_ : dx_ + nx]
            for dy_ in range(3)
            for dx_ in range(3)
        ]
        return jnp.concatenate(views, axis=2)

    def block(r0):
        c_t = jax.lax.dynamic_slice(
            code_h, (r0, 0, 0), (rb + 2, nx + 2, p)
        )
        v_t = jax.lax.dynamic_slice(
            payload_h, (r0, 0, 0, 0), (rb + 2, nx + 2, p, d + 2)
        )

        def run(_):
            c_w = windows(c_t)  # (rb, nx, 9P)
            v_w = windows(v_t)  # (rb, nx, 9P, D+2)
            sel = c_w == expected[None, None, :]
            rank = jnp.cumsum(sel.astype(jnp.int32), axis=-1) - 1  # rank of selected
            total = rank[..., -1] + 1  # selected count per cell
            keep = sel & (rank < p)
            onehot = (
                keep[:, :, None, :] & (rank[:, :, None, :] == lane[:, None])
            ).astype(REAL)  # (rb, nx, P, 9P)
            out = jax.lax.dot_general(
                onehot, v_w,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=REAL,
                # HIGHEST: the payload must pass through EXACTLY (TPU default
                # precision truncates f32 matmul operands to bf16 — positions
                # rounded by 0.4% explode the pressure solve; measured as 4k
                # dropped particles + NaN within 10 steps at 100k)
                precision=jax.lax.Precision.HIGHEST,
            )  # (rb, nx, P, D+2)
            new_mask = lane[None, None, :] < total[:, :, None]
            dropped = jnp.sum(jnp.maximum(total - p, 0))
            return out, new_mask, dropped

        def skip(_):
            return (
                jnp.zeros((rb, nx, p, d + 2), REAL),
                jnp.zeros((rb, nx, p), bool),
                jnp.zeros((), jnp.int32),
            )

        return jax.lax.cond(jnp.any(c_t != 0), run, skip, None)

    if nbr == 1:
        out, new_mask, dropped = block(0)
        out = out[:ny]
        new_mask = new_mask[:ny]
        num_dropped = dropped
    else:
        outs, masks, drops = jax.lax.map(
            block, jnp.arange(nbr, dtype=jnp.int32) * rb
        )
        out = outs.reshape(nbr * rb, nx, p, d + 2)[:ny]
        new_mask = masks.reshape(nbr * rb, nx, p)[:ny]
        num_dropped = jnp.sum(drops)

    return out[..., :2], new_mask, out[..., 2:], num_dropped.astype(jnp.int32)


def cached_pair_reduce(fn, cache, source_values=(), query_values=()):
    """Reduction over the candidate axis using a cached per-pair pytree.

    `fn(cache, *query_vals, *cand_vals) -> pytree of (ny, nx, P, 9Ps[, D])` combines
    the cache (masked: dead pairs are exact zeros) with per-slot values; windowed
    candidate values arrive as (ny, nx, 1, 9Ps[, D]) and query values as
    (ny, nx, P, 1[, D]). Every output leaf is summed over the candidate axis.
    Because the cache is zero for invalid pairs, fn must keep each term proportional
    to a cache entry (gradients scale every solver correction, so this holds).
    """
    cand_vals = [neighbor_windows(v)[:, :, None] for v in source_values]
    q_vals = [
        v[:, :, :, None] if v.ndim == 3 else v[:, :, :, None, :] for v in query_values
    ]
    per_pair = fn(cache, *q_vals, *cand_vals)

    return jax.tree_util.tree_map(lambda leaf: jnp.sum(leaf, axis=3), per_pair)


def pair_reduce(
    fn,
    query_padded_pos: jax.Array,  # (ny, nx, P, 2)
    query_mask: jax.Array,  # (ny, nx, P) bool
    source_padded_pos: jax.Array,  # (ny, nx, Ps, 2)
    source_mask: jax.Array,  # (ny, nx, Ps) bool
    grid: DenseGridConfig,
    source_values=(),
    query_values=(),
    scalar_args=(),
):
    """Fused masked pair reduction over each query slot's 3x3 cell neighborhood.

    `fn(ri_to_rj, r_sq, r, *scalar_args, *query_values, *cand_values) -> pytree`
    computes per-pair
    contributions; each leaf has shape (B, nx, P, 9Ps) or (B, nx, P, 9Ps, D) for a
    row block B. Invalid pairs (dead slots, out of radius, self) are zeroed, then
    every leaf is summed over the candidate axis -> (ny, nx, P[, D]).

    Per-query-slot arrays in `query_values` (each (ny, nx, P[, D])) reach `fn`
    broadcast-ready as (B, nx, P, 1[, D]); per-source-slot arrays in `source_values`
    (each (ny, nx, Ps[, D])) are windowed to the candidate axis and passed as
    (B, nx, 1, 9Ps[, D]). `fn` must NOT close over full-domain arrays — blocks only
    see their row slice.

    The pass is chunked over (row_block x col_block) cell tiles via `lax.map`, so
    per-pair temporaries never exceed one tile's worth regardless of domain size —
    1M-particle grids would otherwise blow HBM on materialized pair tensors — and
    tiles with no live query or source slots are skipped entirely (lax.cond).

    With grid.pair_dtype == "bfloat16" all per-pair math runs in bf16 on
    CELL-RELATIVE coordinates (see DenseGridConfig.pair_dtype); reductions still
    accumulate float32, so every output leaf is float32 either way.
    """
    ny, nx = query_padded_pos.shape[:2]
    rb = min(grid.row_block or ny, ny)
    # clamp to nx: a col_block wider than the grid (e.g. boundary_col_block=256 on
    # a narrow test scene) would pad dead columns into every tile
    cb = min(grid.col_block or nx, nx)
    if grid.num_cells * grid.occupancy < SMALL_GRID_SLOTS:
        rb, cb = ny, nx  # small grid: band machinery costs more than it skips

    dtype = grid.pair_jnp_dtype
    relative = dtype != REAL
    if relative:
        # rebase every position onto its own cell center: values in [-h/2, h/2]
        # (border-clamped strays excepted) survive the cast to bf16
        h = grid.cell_size
        row0 = 0
        if grid.halo_axis is not None:  # this shard's global row offset
            row0 = jax.lax.axis_index(grid.halo_axis[0]) * ny
        cx = (jnp.arange(nx, dtype=REAL) + 0.5) * h + grid.origin[0]
        cy = (jnp.arange(ny, dtype=REAL) + 0.5 + row0) * h + grid.origin[1]
        centers = jnp.stack(
            [jnp.broadcast_to(cx[None, :], (ny, nx)),
             jnp.broadcast_to(cy[:, None], (ny, nx))], axis=-1
        )[:, :, None, :]  # (ny, nx, 1, 2)
        query_padded_pos = (query_padded_pos - centers).astype(dtype)
        source_padded_pos = (source_padded_pos - centers).astype(dtype)
        query_values = [v.astype(dtype) for v in query_values]
        source_values = [v.astype(dtype) for v in source_values]
        scalar_args = tuple(
            jnp.asarray(a, dtype=REAL).astype(dtype) for a in scalar_args
        )

    if ny <= rb and nx <= cb:
        s_pos_h, s_mask_h, *s_vals_h = halo2d_multi(
            [source_padded_pos, source_mask, *source_values], grid
        )
        return _pair_reduce_block(
            fn, query_padded_pos, query_mask, list(query_values),
            s_pos_h, s_mask_h, s_vals_h, grid, scalar_args,
            relative=relative,
        )

    nbr = -(-ny // rb)
    nbc = -(-nx // cb)
    ny_pad, nx_pad = nbr * rb, nbc * cb
    if grid.halo_axis is not None:
        # the halo rows come from neighbor shards; appending zero row-padding after
        # them would misalign the tile slices, so the local row count must tile
        # exactly (parallel/shard_dense.py picks row_block accordingly)
        assert ny_pad == ny, (
            f"sharded pair_reduce needs ny ({ny}) divisible by row_block ({rb})"
        )

    def pad2d(a):
        er, ec = ny_pad - a.shape[0], nx_pad - a.shape[1]
        if er:
            a = jnp.concatenate(
                [a, jnp.zeros((er,) + a.shape[1:], dtype=a.dtype)], axis=0
            )
        if ec:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], ec) + a.shape[2:], dtype=a.dtype)], axis=1
            )
        return a

    q_pos = pad2d(query_padded_pos)
    q_mask = pad2d(query_mask)
    q_vals = [pad2d(v) for v in query_values]
    s_pos, s_mask, *s_vals = halo2d_multi(
        [pad2d(source_padded_pos), pad2d(source_mask)]
        + [pad2d(v) for v in source_values],
        grid,
    )

    def slice2d(a, r0, c0, h, w):
        starts = (r0, c0) + (0,) * (a.ndim - 2)
        sizes = (h, w) + a.shape[2:]
        return jax.lax.dynamic_slice(a, starts, sizes)

    def body(k):
        i, j = k // nbc, k % nbc
        r0, c0 = i * rb, j * cb
        q_p = slice2d(q_pos, r0, c0, rb, cb)
        q_m = slice2d(q_mask, r0, c0, rb, cb)
        q_v = [slice2d(v, r0, c0, rb, cb) for v in q_vals]
        s_p = slice2d(s_pos, r0, c0, rb + 2, cb + 2)
        s_m = slice2d(s_mask, r0, c0, rb + 2, cb + 2)
        s_v = [slice2d(v, r0, c0, rb + 2, cb + 2) for v in s_vals]

        def run(_):
            return _pair_reduce_block(fn, q_p, q_m, q_v, s_p, s_m, s_v, grid,
                                      scalar_args, relative=relative)

        def skip(_):
            out_shape = jax.eval_shape(run, None)
            return jax.tree_util.tree_map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), out_shape
            )

        # Skip tiles with no live query slots OR no live source slots in range: in
        # typical scenes a large fraction of the domain is empty, and for the
        # fluid-vs-boundary pass most interior fluid tiles see no boundary at all.
        return jax.lax.cond(jnp.any(q_m) & jnp.any(s_m), run, skip, None)

    out = jax.lax.map(body, jnp.arange(nbr * nbc, dtype=jnp.int32))

    def unblock(leaf):
        # (nbr*nbc, rb, cb, ...) -> (ny, nx, ...)
        tiles = leaf.reshape((nbr, nbc, rb, cb) + leaf.shape[3:])
        merged = jnp.moveaxis(tiles, 1, 2).reshape(
            (ny_pad, nx_pad) + leaf.shape[3:]
        )
        return merged[:ny, :nx]

    return jax.tree_util.tree_map(unblock, out)
