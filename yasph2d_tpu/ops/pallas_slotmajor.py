"""Slot-major Pallas pair passes — the production TPU kernel path.

Why slot-major: the first-generation kernel (ops/pallas_pair.py) carries
(P, Ps)- or (P, 2)-minor operands, which Mosaic pads to (8, 128) register
tiles — an 18-64x VMEM amplification that OOMs scoped VMEM or blows the
compile (PERF.md round 3). Here the SPATIAL dims live on (sublane, lane) and
slots / vector components are separate leading-dim planes:

  query geometry   q_geom[band, {x,y,mask}, slot, BR, NX]
  source geometry  s_geom[band, {x,y}, slot, BR+2, NXS]   (one-cell halo;
                   no mask plane — dead slots carry SENTINEL_POS and are
                   excluded by the radius test)
  pass values      *_vals[band, plane, slot, ...]              (vectors -> 2 planes)
  outputs          out[band, plane, slot, BR, NX]

The kernel loops the query slot OUTERMOST so the live VMEM set is n_out
(BR, NX) accumulator planes per slot (a whole-block functional accumulator
keeps all 9*Ps unrolled candidate temporaries live: measured 48.5 MB scoped
VMEM vs the 16 MB limit). Probe measurement (tools/probe_pallas_slotmajor.py,
real TPU, 1M band shape): 2.86x faster than the XLA pair_reduce band.

Empty-band skipping (the XLA path's lax.cond) becomes a per-band flag in SMEM:
skipped bands write zeros and do no pair math. Band DMA still runs — at 1M
that is ~2 ms/step of the ~45 ms the kernels save.

Pass math arrives as a PLANE-FORM term function
    term_fn(dx, dy, r_sq, r, scalars, q_planes, s_planes) -> tuple of planes
with every argument a (BR, NX) f32 plane (dx = xj - xi, matching the
`ri_to_rj` convention of kernel.rs:22-28); the kernel masks each output with
the validity plane (dead slot / out of radius / self — the filters of
neighborhood_search.rs:312-397) and accumulates over the 9 views x Ps source
slots. Plane-form physics comes from the coefficient methods on the smoothing
kernels and viscosity models (gradient_coefficient / viscous_coefficient).

Sharding: the PLANE-FORM (pf_*) functions shard over cell rows like the XLA
path — all collectives stay OUTSIDE the kernels. With grid.halo_axis set,
`_pf_block_source`'s zero-pad boundary rows are instead filled from the
neighbor shards with ONE `lax.ppermute` pair per source build (geometry once
per rebuild via pf_build_geom(grid=...); values once per pass / loop
iteration inside pf_pair_reduce), and the band skip flags carry the
neighbor's edge-row occupancy through PFGeom.edge_*_any. pf_rebucket's halo
rows then ARE the cross-shard migration, exactly like dense_grid.rebucket.
Requires NYP == ny per shard (row block divides the shard's row count) so the
exchanged rows are grid-adjacent. The vector-last sm_* entry points remain
single-device (the padded shard solvers keep the XLA pair_reduce path).
"""

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import REAL
from .dense_grid import MIN_DISTANCE_SQ, DenseGridConfig, move_codes

LANE = 128  # TPU lane width: the trailing spatial dim pads to a multiple

# Dead-slot position sentinel in the pf geometry planes: far enough that
# r_sq = dx^2 + dy^2 overflows f32 to +inf against ANY live coordinate (and
# representable in bfloat16), so `r_sq <= radius_sq` excludes dead sources
# with no source-mask load. Dead-vs-dead pairs cancel the sentinel (dx = 0,
# or the +-1-cell rebase delta under bf16) and can pass the radius test —
# the query mask plane still gates those, which keeps every dead-lane
# output at the exact +0.0 the masked three-plane kernel produced.
SENTINEL_POS = 3.0e38


def _maybe_jit_call(call, interpret: bool):
    """Interpret-mode pallas executes the kernel body EAGERLY op-by-op when
    the caller is not already inside jit — the dominant cost of the CPU test
    suite. Wrapping the call in jax.jit compiles it once instead; inside an
    outer jit the extra jit is transparent (inlined at trace time), and
    on-device (interpret=False) nothing changes."""
    return jax.jit(call) if interpret else call


def _num_bands(ny: int, br: int) -> int:
    return -(-ny // br)


def _nx_padded(nx: int) -> int:
    return -(-nx // LANE) * LANE


class SMGeom(NamedTuple):
    """Blocked slot-major geometry of one index space (fluid or boundary),
    rebuilt once per neighborhood rebuild and shared by every pass.

    Band occupancy bits drive per-pass skip flags: a band's source window
    covers its own rows plus one halo row on each side, so the window bit of
    band i is band_any[i] | last_any[i-1] | first_any[i+1]."""

    q_geom: jax.Array  # (nbr, 3, P, BR, NXP) f32: x, y, mask planes
    s_geom: jax.Array  # (nbr, 3, P, BR+2, NXS) f32: haloed source blocking
    band_any: jax.Array  # (nbr,) bool: any live slot in the band
    first_any: jax.Array  # (nbr,) bool: any live slot in the band's first row
    last_any: jax.Array  # (nbr,) bool: any live slot in the band's last row


def _values_to_planes(vals: Sequence[jax.Array]) -> jax.Array:
    """List of (ny, nx, P) / (ny, nx, P, 2) arrays -> (L, P, ny, nx) planes
    (vector arrays decompose into one plane per component)."""
    comps = []
    for v in vals:
        if v.ndim == 3:
            comps.append(v)
        else:
            comps.extend(v[..., k] for k in range(v.shape[-1]))
    planes = jnp.stack([c.astype(REAL) for c in comps], axis=0)
    return jnp.transpose(planes, (0, 3, 1, 2))


def _block_query(planes: jax.Array, br: int) -> jax.Array:
    """(L, P, ny, nx) -> (nbr, L, P, BR, NXP): non-overlapping row bands,
    rows/lanes zero-padded."""
    l, p, ny, nx = planes.shape
    nbr = _num_bands(ny, br)
    nxp = _nx_padded(nx)
    padded = jnp.pad(planes, ((0, 0), (0, 0), (0, nbr * br - ny), (0, nxp - nx)))
    return padded.reshape(l, p, nbr, br, nxp).transpose(2, 0, 1, 3, 4)


def _block_source(planes: jax.Array, br: int) -> jax.Array:
    """(L, P, ny, nx) -> (nbr, L, P, BR+2, NXS): overlapping (BR+2)-row windows
    around each band with a one-cell zero halo ring (Pallas blocks cannot
    overlap, so the windows are materialized host-side; columns pad to
    NXP + LANE because Mosaic requires the last block dim to be 128-divisible
    or equal to the array dim)."""
    l, p, ny, nx = planes.shape
    nbr = _num_bands(ny, br)
    nxs = _nx_padded(nx) + LANE
    padded = jnp.pad(
        planes, ((0, 0), (0, 0), (1, nbr * br - ny + 1), (1, nxs - nx - 1))
    )
    return jnp.stack(
        [padded[:, :, i * br : i * br + br + 2] for i in range(nbr)], axis=0
    )


def _band_bits(mask: jax.Array, br: int):
    """(ny, nx, P) mask -> (band_any, first_any, last_any), each (nbr,) bool."""
    ny = mask.shape[0]
    nbr = _num_bands(ny, br)
    row_any = jnp.any(mask, axis=(1, 2))
    row_any = jnp.pad(row_any, (0, nbr * br - ny))
    bands = row_any.reshape(nbr, br)
    return jnp.any(bands, axis=1), bands[:, 0], bands[:, -1]


def build_geom(pos_pad: jax.Array, mask: jax.Array, br: int) -> SMGeom:
    """Blocked geometry for one index space from its padded positions + mask."""
    planes = _values_to_planes([pos_pad, mask.astype(REAL)])  # x, y, mask
    band_any, first_any, last_any = _band_bits(mask, br)
    return SMGeom(
        q_geom=_block_query(planes, br),
        s_geom=_block_source(planes, br),
        band_any=band_any,
        first_any=first_any,
        last_any=last_any,
    )


def _edge_bits(s, grid: DenseGridConfig):
    """Occupancy of the neighbor shards' seam rows: (below_any, above_any),
    each (1,) bool — False at the mesh edges / on a single device. A PFGeom
    built with `grid` carries these precomputed from its own halo exchange
    (no extra collectives); the ppermute fallback below serves SMGeom."""
    if getattr(s, "edge_below", None) is not None:
        return s.edge_below, s.edge_above
    if grid is None or grid.halo_axis is None:
        false = jnp.zeros((1,), dtype=bool)
        return false, false
    axis_name, n_shards = grid.halo_axis
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    below = jax.lax.ppermute(s.last_any[-1:].astype(jnp.int32), axis_name, fwd)
    above = jax.lax.ppermute(s.first_any[:1].astype(jnp.int32), axis_name, bwd)
    return below > 0, above > 0


def pass_flags(q, s, grid: DenseGridConfig = None) -> jax.Array:
    """(nbr, 1) int32 skip flags for a pass with query space q, source space s
    (SMGeom or PFGeom). Under sharding (grid.halo_axis set) the first/last
    band's source window extends into the neighbor shard's exchanged seam row."""
    edge_below, edge_above = _edge_bits(s, grid)
    below = jnp.concatenate([edge_below, s.last_any[:-1]])  # row above the band
    above = jnp.concatenate([s.first_any[1:], edge_above])  # row below the band
    window = s.band_any | below | above
    return (q.band_any & window).astype(jnp.int32)[:, None]


def _sm_kernel(term_fn, n_sc, n_qv, n_sv, n_out, p, ps, br, nx, radius_sq, *refs):
    """Pallas kernel body. refs: flag(SMEM), *scalars(SMEM), q_geom, s_geom,
    [q_vals], [s_vals], out."""
    flag_ref = refs[0]
    flag = flag_ref[pl.program_id(0), 0]
    scalars = tuple(refs[1 + i][0, 0] for i in range(n_sc))
    qg = refs[1 + n_sc]
    sg = refs[2 + n_sc]
    idx = 3 + n_sc
    qv = refs[idx] if n_qv else None
    idx += 1 if n_qv else 0
    sv = refs[idx] if n_sv else None
    out_ref = refs[-1]

    @pl.when(flag == 0)
    def _skip():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(flag != 0)
    def _run():
        for qp in range(p):
            qx = qg[0, 0, qp]
            qy = qg[0, 1, qp]
            qm = qg[0, 2, qp] > 0.0
            q_planes = tuple(qv[0, l, qp] for l in range(n_qv))
            accs = [jnp.zeros((br, nx), dtype=REAL) for _ in range(n_out)]
            for dyv in range(3):
                for dxv in range(3):
                    for sp in range(ps):
                        cx = sg[0, 0, sp, dyv : dyv + br, dxv : dxv + nx]
                        cy = sg[0, 1, sp, dyv : dyv + br, dxv : dxv + nx]
                        cm = sg[0, 2, sp, dyv : dyv + br, dxv : dxv + nx]
                        s_planes = tuple(
                            sv[0, l, sp, dyv : dyv + br, dxv : dxv + nx]
                            for l in range(n_sv)
                        )
                        dx = cx - qx
                        dy = cy - qy
                        r_sq = dx * dx + dy * dy
                        valid = (
                            qm
                            & (cm > 0.0)
                            & (r_sq <= radius_sq)
                            & (r_sq > MIN_DISTANCE_SQ)
                        )
                        outs = term_fn(
                            dx, dy, r_sq, jnp.sqrt(r_sq), scalars, q_planes,
                            s_planes,
                        )
                        for k, o in enumerate(outs):
                            # where (not multiply): masked slots may hold
                            # inf/NaN and NaN * 0 == NaN
                            accs[k] = accs[k] + jnp.where(valid, o, 0.0)
            for k in range(n_out):
                out_ref[0, k, qp] = accs[k]


def sm_pair_reduce(
    term_fn,
    n_out: int,
    q: SMGeom,
    s: SMGeom,
    flags: jax.Array,
    grid: DenseGridConfig,
    br: int,
    q_vals: Sequence[jax.Array] = (),
    s_vals: Sequence[jax.Array] = (),
    scalars: Sequence = (),
    interpret: bool = None,
):
    """Masked pair reduction over each query slot's 3x3 cell neighborhood,
    computed band-by-band in one slot-major Pallas kernel.

    Same semantics as dense_grid.pair_reduce restricted to plane-form term
    functions: `term_fn(dx, dy, r_sq, r, scalars, q_planes, s_planes)` returns
    `n_out` (BR, NX) planes per (query-slot, view, source-slot) combination;
    invalid pairs are zeroed and everything is summed over the candidate axis.
    `q_vals` / `s_vals` are (ny, nx, P[, 2]) padded arrays (vectors decompose
    into component planes, in order). Returns a list of `n_out` (ny, nx, P)
    float32 arrays.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ny, nx = grid.ny, grid.nx
    nbr = q.q_geom.shape[0]
    p = q.q_geom.shape[2]
    ps = s.s_geom.shape[2]
    nxp = q.q_geom.shape[4]
    nxs = s.s_geom.shape[4]

    qv_b = _block_query(_values_to_planes(q_vals), br) if q_vals else None
    sv_b = _block_source(_values_to_planes(s_vals), br) if s_vals else None
    n_qv = qv_b.shape[1] if q_vals else 0
    n_sv = sv_b.shape[1] if s_vals else 0

    scalars_2d = [jnp.asarray(a, dtype=REAL).reshape(1, 1) for a in scalars]

    def vmem_spec(a):
        blk = (1,) + a.shape[1:]
        nd = a.ndim
        return pl.BlockSpec(
            blk, lambda i, nd=nd: (i,) + (0,) * (nd - 1), memory_space=pltpu.VMEM
        )

    # the whole flag vector stays SMEM-resident (Mosaic requires block dims
    # divisible by the register tile OR equal to the array dims); the kernel
    # picks its band's flag by program_id
    flag_spec = pl.BlockSpec(
        flags.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    operands = [flags] + scalars_2d + [q.q_geom, s.s_geom]
    in_specs = (
        [flag_spec]
        + [scalar_spec for _ in scalars_2d]
        + [vmem_spec(q.q_geom), vmem_spec(s.s_geom)]
    )
    if q_vals:
        operands.append(qv_b)
        in_specs.append(vmem_spec(qv_b))
    if s_vals:
        operands.append(sv_b)
        in_specs.append(vmem_spec(sv_b))

    out_shape = jax.ShapeDtypeStruct((nbr, n_out, p, br, nxp), REAL)
    out_spec = pl.BlockSpec(
        (1, n_out, p, br, nxp), lambda i: (i, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _sm_kernel, term_fn, len(scalars_2d), n_qv, n_sv, n_out, p, ps, br, nxp,
        grid.radius_sq,
    )
    out = _maybe_jit_call(pl.pallas_call(
        kernel,
        grid=(nbr,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        # the 5-output ctx pass at the 1M grid (NXP 1664) needs 17.1 MB of
        # scoped VMEM — just past the default 16 MB limit; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    ), interpret)(*operands)

    # (nbr, n_out, P, BR, NXP) -> n_out planes of (ny, nx, P)
    out = out.transpose(1, 0, 3, 4, 2).reshape(n_out, nbr * br, nxp, p)
    out = out[:, :ny, :nx]
    return [out[k] for k in range(n_out)]


# --------------------------------------------------------------------------
# Plane-form (PF) layout: the zero-transpose generation.
#
# The band-blocked layout above still pays per-pass layout flips: callers hold
# (ny, nx, P) solver arrays, so every sm_pair_reduce call transposes values
# into plane form, materializes band blocks with the band axis LEADING, and
# transposes the output back. In PF form the solver state itself lives as
# (P, NYP, NXP) planes (vectors as (2, P, NYP, NXP)), with
#   NYP = ceil(ny / BR) * BR   (whole bands)
#   NXP = ceil(nx / 128) * 128 (whole lanes)
# and the padding region permanently dead (mask False). Then:
#   - query blocking is a RESHAPE: (L, P, NYP, NXP) -> (L, P, nbr, BR, NXP)
#     with the band axis indexed mid-tensor by the BlockSpec index map;
#   - kernel outputs come back as (n_out, P, nbr, BR, NXP) -> reshape to
#     (n_out, P, NYP, NXP) — the component axis of a vector output IS the
#     leading axis, no stack, no transpose;
#   - only source operands still materialize (window overlap forces it), and
#     that is a pad + band-slice stack of large contiguous rows — no transpose.
# The boundary (static) index space gets its own PFGeom built once at scene
# build, so the fluid-vs-boundary ctx pass runs in the same kernel with
# per-band thin-shell skipping via the flags.
# --------------------------------------------------------------------------


class PFGeom(NamedTuple):
    """Plane-form blocked geometry of one index space. Field names match SMGeom
    so `pass_flags` works on either.

    The occupancy metadata (q_cnt for the query role, s_cnt for the source
    role; both per (band, 128-lane column chunk)) drives the kernels'
    dead-work skipping: slot loops run `fori_loop(0, cnt)` with the CHUNK's
    live bound instead of unrolling all P slots, and chunks whose bound is 0
    on either side are skipped outright. Bounds use the max live slot INDEX
    (not the count), so they are exact for non-compacted masks too;
    everything a bound excludes is a slot the old fully-unrolled kernels
    would have masked to an exact +0.0 — outputs are bitwise-identical.
    Computed from the blocked geometry itself, so under sharding the
    exchanged halo rows are included automatically."""

    q_geom: jax.Array  # (3, P, nbr, BR, NXP): x, y, mask planes (dead-slot
    #   positions hold SENTINEL_POS)
    s_geom: jax.Array  # (2, P, nbr, BR+2, NXS): haloed source windows — x, y
    #   ONLY. Dead source slots carry SENTINEL_POS, so the kernels exclude
    #   them by radius (r_sq overflows to inf) without loading a source mask
    #   plane; that drops a third of the biggest per-pass operand's
    #   HBM/VMEM traffic and one load+compare per candidate step.
    band_any: jax.Array  # (nbr,) bool
    first_any: jax.Array  # (nbr,) bool
    last_any: jax.Array  # (nbr,) bool
    q_cnt: jax.Array  # (nbr, NXP//128) int32: query slot bound per chunk
    s_cnt: jax.Array  # (nbr, NXP//128) int32: source slot bound per chunk
    #   window (s_geom columns [cc*128, cc*128 + 130))
    # Neighbor shards' seam-row occupancy, derived from the geometry halo
    # exchange itself (the received rows carry the mask plane) — saves
    # `pass_flags` two scalar ppermutes per call vs `_edge_bits`. None on a
    # geometry built without a grid (single-device call sites).
    edge_below: jax.Array = None  # (1,) bool
    edge_above: jax.Array = None  # (1,) bool


def pf_dims(grid: DenseGridConfig, br: int):
    """(nbr, NYP, NXP, NXS) of the plane-form resident layout."""
    nbr = _num_bands(grid.ny, br)
    nxp = _nx_padded(grid.nx)
    return nbr, nbr * br, nxp, nxp + LANE


def to_planes(a: jax.Array, grid: DenseGridConfig, br: int) -> jax.Array:
    """(ny, nx, P[, 2]) solver array -> resident plane form (P, NYP, NXP) /
    (2, P, NYP, NXP), zero-padded. Layout boundary only (init/export/tests)."""
    _, nyp, nxp, _ = pf_dims(grid, br)
    ny, nx = a.shape[0], a.shape[1]
    if a.ndim == 3:
        pl_ = jnp.transpose(a, (2, 0, 1))
    else:
        pl_ = jnp.transpose(a, (3, 2, 0, 1))
    pad = [(0, 0)] * (pl_.ndim - 2) + [(0, nyp - ny), (0, nxp - nx)]
    return jnp.pad(pl_, pad)


def from_planes(p: jax.Array, grid: DenseGridConfig) -> jax.Array:
    """Inverse of `to_planes`: (P, NYP, NXP) -> (ny, nx, P); (2, P, NYP, NXP)
    -> (ny, nx, P, 2)."""
    ny, nx = grid.ny, grid.nx
    if p.ndim == 3:
        return jnp.transpose(p[:, :ny, :nx], (1, 2, 0))
    return jnp.transpose(p[:, :, :ny, :nx], (2, 3, 1, 0))


def _pf_concat(vals: Sequence[jax.Array]) -> jax.Array:
    """Stack plane-form values ((P, NYP, NXP) scalars and (2, P, NYP, NXP)
    vectors, in order) into one (L, P, NYP, NXP) operand."""
    comps = []
    for v in vals:
        comps.append(v[None] if v.ndim == 3 else v)
    return comps[0] if len(comps) == 1 else jnp.concatenate(comps, axis=0)


def _pf_dtype(grid: DenseGridConfig):
    """Operand dtype of the pf kernels: `grid.pair_dtype` selects bfloat16
    STORAGE/TRAFFIC (geometry + value planes live in HBM/VMEM/halo ppermutes at
    half the bytes); kernel math and accumulation stay float32 (the kernel
    upcasts at load), so this mode is strictly more accurate than the XLA
    pair_reduce's bf16 mode, which also computes in bf16."""
    return REAL if grid is None else grid.pair_jnp_dtype


def _pf_rebase(pos: jax.Array, grid: DenseGridConfig) -> jax.Array:
    """Rebase plane-form positions (2, P, NYP, NXP) onto each cell's own
    CENTER (global cell rows under sharding, so cross-seam pairs of different
    shards agree): values in [-h/2, h/2] survive the cast to bf16, absolute
    coordinates would not. The kernel adds the constant per-view center delta
    ((dxv-1)*h, (dyv-1)*h) back in f32 — same scheme as the XLA bf16 path
    (dense_grid.pair_reduce `relative=True`)."""
    _, _, nyp, nxp = pos.shape
    h = jnp.asarray(grid.cell_size, REAL)
    row0 = 0
    if grid.halo_axis is not None:  # this shard's global cell-row offset
        row0 = jax.lax.axis_index(grid.halo_axis[0]) * grid.ny
    cx = (jnp.arange(nxp, dtype=REAL) + 0.5) * h + grid.origin[0]
    cy = (jnp.arange(nyp, dtype=REAL) + 0.5 + row0) * h + grid.origin[1]
    return jnp.stack(
        [pos[0] - cx[None, None, :], pos[1] - cy[None, :, None]], axis=0
    )


def _pf_block_query(planes: jax.Array, br: int) -> jax.Array:
    """(L, P, NYP, NXP) -> (L, P, nbr, BR, NXP): a pure reshape."""
    l, p, nyp, nxp = planes.shape
    assert nyp % br == 0, f"plane rows {nyp} not divisible by row block {br}"
    return planes.reshape(l, p, nyp // br, br, nxp)


def _pf_halo(planes: jax.Array, grid: DenseGridConfig):
    """Neighbor-shard boundary rows of a (L, P, NYP, NXP) plane stack: one
    `lax.ppermute` pair for ALL planes (below = previous shard's last row,
    above = next shard's first row; zeros at the mesh edges / single device
    returns None). Requires NYP == grid.ny (no dead padding rows between
    shards — the sharded drivers pick row blocks dividing the shard height)."""
    if grid is None or grid.halo_axis is None:
        return None
    assert planes.shape[2] == grid.ny, (
        f"sharded plane layout needs NYP ({planes.shape[2]}) == ny ({grid.ny}): "
        "pick a row block dividing the shard's row count"
    )
    axis_name, n_shards = grid.halo_axis
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    below = jax.lax.ppermute(planes[:, :, -1:], axis_name, fwd)
    above = jax.lax.ppermute(planes[:, :, :1], axis_name, bwd)
    return below, above


def _pf_block_source(planes: jax.Array, br: int, halo=None,
                     pad_value: float = 0.0) -> jax.Array:
    """(L, P, NYP, NXP) -> (L, P, nbr, BR+2, NXS): overlapping row windows with
    a one-cell halo ring (left column halo = 1, right pads to NXS). `halo`
    (from `_pf_halo`) supplies the boundary rows under spatial sharding; they
    are `pad_value` on a single device (SENTINEL_POS for position blockings —
    the padding ring must be excluded by radius like any dead slot; 0.0 for
    value blockings, whose padded lanes the sentinel geometry already
    excludes)."""
    l, p, nyp, nxp = planes.shape
    assert nyp % br == 0, f"plane rows {nyp} not divisible by row block {br}"
    nbr = nyp // br
    nxs = nxp + LANE
    if halo is None:
        padded = jnp.pad(planes, ((0, 0), (0, 0), (1, 1), (1, nxs - nxp - 1)),
                         constant_values=pad_value)
    else:
        below, above = halo
        padded = jnp.pad(
            jnp.concatenate([below, planes, above], axis=2),
            ((0, 0), (0, 0), (0, 0), (1, nxs - nxp - 1)),
            constant_values=pad_value,
        )
    return jnp.stack(
        [padded[:, :, i * br : i * br + br + 2] for i in range(nbr)], axis=2
    )


def _pf_band_bits(mask: jax.Array, br: int):
    """(P, NYP, NXP) mask -> (band_any, first_any, last_any)."""
    nyp = mask.shape[1]
    row_any = jnp.any(mask, axis=(0, 2))
    bands = row_any.reshape(nyp // br, br)
    return jnp.any(bands, axis=1), bands[:, 0], bands[:, -1]


def _col_slot_bound(mask: jax.Array) -> jax.Array:
    """(P, nbr, R, C) bool -> (nbr, C) int32: per column, 1 + highest live
    slot index in any of the band's rows (exact for non-compacted masks,
    unlike a count)."""
    p = mask.shape[0]
    sl = jnp.arange(1, p + 1, dtype=jnp.int32).reshape(p, 1, 1, 1)
    return jnp.max(jnp.where(mask, sl, 0), axis=(0, 2))


def _pf_meta(qm: jax.Array, sm: jax.Array):
    """Occupancy metadata from the blocked masks (qm: (P, nbr, BR, NXP) bool,
    sm: (P, nbr, BR+2, NXS) bool): (q_cnt, s_cnt), both (nbr, ncb) int32
    slot-loop bounds per 128-lane column chunk. Chunk cc of the query covers
    NXP lanes [cc*128, (cc+1)*128); its source window covers s_geom columns
    [cc*128, cc*128 + 130) (the NXS layout is left-shifted by the one-lane
    halo, so no extra offset)."""
    _, nbr, _, nxp = qm.shape
    ncb = nxp // LANE
    qb = _col_slot_bound(qm)  # (nbr, NXP)
    q_cnt = jnp.max(qb.reshape(nbr, ncb, LANE), axis=2)
    s_cnt = _pf_source_meta(sm, ncb)
    return q_cnt, s_cnt


def _window_chunk_max(sb: jax.Array, ncb: int) -> jax.Array:
    """(nbr, NXS) per-column bounds -> (nbr, ncb) max over each 128-lane query
    chunk's source window (s_geom columns [cc*128, cc*128 + 130); the NXS
    layout is left-shifted by the one-lane halo, so no extra offset)."""
    nbr = sb.shape[0]
    chunk = jnp.max(sb[:, : ncb * LANE].reshape(nbr, ncb, LANE), axis=2)
    return jnp.maximum(
        chunk,
        jnp.maximum(
            sb[:, LANE::LANE][:, :ncb], sb[:, LANE + 1 :: LANE][:, :ncb]
        ),
    )


def _pf_source_meta(sm: jax.Array, ncb: int) -> jax.Array:
    """Source-side occupancy meta from a blocked source mask (P, nbr, BR+2,
    NXS) bool: (nbr, ncb) int32 slot-loop bound over query chunk cc's source
    window."""
    return _window_chunk_max(_col_slot_bound(sm), ncb)


_CHUNK_FROM_GRID = object()  # sentinel: resolve width from the grid config


def _pf_chunks(grid: DenseGridConfig, nxp: int,
               override=_CHUNK_FROM_GRID) -> tuple:
    """Resolve the chunk decomposition of the NXP lanes as a static tuple of
    (start, width) pairs. Width comes from `override` if given, else
    `grid.pallas_pf_chunk_lanes`; None / oversized -> one full-width chunk.
    A width that does not divide NXP yields a ragged (narrower) final chunk —
    every width stays a multiple of 128, so each chunk's vector ops run on
    whole VREG rows (NXP itself is always a multiple of 128)."""
    cw = grid.pallas_pf_chunk_lanes if override is _CHUNK_FROM_GRID else override
    if cw is None or cw >= nxp:
        return ((0, nxp),)
    assert cw % LANE == 0, f"chunk width {cw} must be a multiple of {LANE}"
    return tuple((c0, min(cw, nxp - c0)) for c0 in range(0, nxp, cw))


def _pf_coarsen(cnt: jax.Array, chunks: tuple) -> jax.Array:
    """Coarsen (nbr, NXP//128) slot bounds to (nbr, len(chunks)) by per-chunk
    group max. A chunk's source coverage is the union of its 128-lane windows
    [cc*128, cc*128+130), i.e. exactly [c0, c0+w+2) — the chunk-wide window."""
    if len(chunks) == 1:
        return jnp.max(cnt, axis=1, keepdims=True)
    cols = [
        jnp.max(cnt[:, c0 // LANE : (c0 + w) // LANE], axis=1, keepdims=True)
        for c0, w in chunks
    ]
    return jnp.concatenate(cols, axis=1)


def pf_build_geom(pos: jax.Array, mask: jax.Array, br: int,
                  grid: DenseGridConfig = None) -> PFGeom:
    """Blocked geometry from plane-form positions (2, P, NYP, NXP) + mask
    (P, NYP, NXP). With `grid.halo_axis` set the source windows' boundary rows
    come from the neighbor shards (one ppermute pair per rebuild); pass
    `grid` to `pass_flags` as well so the band skip flags see the seam rows.
    Occupancy metadata (slot-loop bounds + column-chunk flags) is computed
    from the blocked masks, halo rows included.

    With `grid.pair_dtype == "bfloat16"` the blocked geometry is stored in
    bf16 with positions rebased onto their own cell center (see `_pf_rebase`;
    the mask plane's 0/1 is exact in bf16)."""
    dtype = _pf_dtype(grid)
    if dtype != REAL:
        pos = _pf_rebase(pos, grid)
    # dead slots carry SENTINEL_POS so the kernels exclude them by radius
    # alone (see the constant's contract) — the source blocking then needs
    # no mask plane at all
    pos = jnp.where(mask[None], pos, jnp.asarray(SENTINEL_POS, REAL))
    planes = jnp.concatenate(
        [pos, mask.astype(REAL)[None]], axis=0
    ).astype(dtype)
    band_any, first_any, last_any = _pf_band_bits(mask, br)
    q_geom = _pf_block_query(planes, br)
    halo = _pf_halo(planes, grid)
    if halo is None:
        pos_halo = mask_halo = None
    else:  # one ppermute pair for all three planes, split per blocking
        below, above = halo
        sent = jnp.asarray(SENTINEL_POS, dtype)
        # mesh-EDGE halo rows arrive as ppermute's zero fill (mask 0,
        # position 0) — re-sentinel them like any dead slot; interior rows
        # already carry the sender's sentinels and pass through unchanged
        pos_halo = (
            jnp.where(below[2:] > 0, below[:2], sent),
            jnp.where(above[2:] > 0, above[:2], sent),
        )
        mask_halo = (below[2:], above[2:])
    s_geom = _pf_block_source(
        planes[:2], br, halo=pos_halo, pad_value=SENTINEL_POS
    )
    # blocked source mask: build-time metadata only — never a kernel operand
    s_mask = _pf_block_source(planes[2:], br, halo=mask_halo)
    q_cnt, s_cnt = _pf_meta(q_geom[2] > 0.0, s_mask[0] > 0.0)
    if halo is None:
        false = jnp.zeros((1,), dtype=bool)
        edge_below = edge_above = false
    else:
        # seam-row occupancy from the received halo rows' mask plane — the
        # neighbor's last_any/first_any without extra collectives
        edge_below = jnp.any(halo[0][2].astype(REAL) > 0.0).reshape(1)
        edge_above = jnp.any(halo[1][2].astype(REAL) > 0.0).reshape(1)
    return PFGeom(
        q_geom=q_geom,
        s_geom=s_geom,
        band_any=band_any,
        first_any=first_any,
        last_any=last_any,
        q_cnt=q_cnt,
        s_cnt=s_cnt,
        edge_below=edge_below,
        edge_above=edge_above,
    )


def _pf_kernel(term_fn, post_fn, n_sc, n_qv, n_sv, post_plan, n_acc, n_out,
               p, ps, br, nx, chunks, radius_sq, rebase_cell, unroll, *refs):
    """PF kernel body — occupancy-adaptive: per column chunk (static
    (start, width) pairs, see `_pf_chunks`), the query/source slot loops are
    fori_loops bounded by the CHUNK's live slot bounds (SMEM, per
    (band, chunk)); a chunk dead on either side is skipped outright. The
    chunk width tunes skip granularity vs loop-control amortization: one
    full-width chunk per band runs every vector op on whole (BR, NXP) planes
    with per-BAND slot bounds. Per output element the accumulation order is
    the fully-unrolled kernel's exact (dyv, dxv, sp) order and every skipped
    candidate is one the unrolled kernel masked to an exact +0.0, so outputs
    are BITWISE identical to it (and so to _sm_kernel) at EVERY chunk
    decomposition. refs: flag(SMEM), q_cnt(SMEM (nbr, len(chunks))), s_cnt
    (SMEM (nbr, len(chunks))), *scalars(SMEM), q_geom, s_geom, [q_vals],
    [s_vals], [q_post], out.

    `post_fn(accs, post_planes, scalars) -> n_out tiles` (optional) maps the
    n_acc accumulated tiles to the stored outputs per query slot — the
    pressure-loop elementwise glue (boundary-term add, error/stiffness maps,
    velocity updates) folded into the kernel so it runs only on LIVE bands
    instead of as full-plane XLA fusions. `q_post` are query-side planes in
    exact f32 (never downcast: post outputs like updated velocities must be
    bit-identical to the XLA formulation on live slots). Dead bands/chunks
    and slots beyond the live bound emit ZEROS, not post_fn(0); dead LANES
    below a live bound DO store post_fn(0, post_planes). Consumers mask dead
    slots everywhere (the solver contract): a post output is NOT the
    XLA-composed value on any dead lane — only live-lane values are pinned.

    `rebase_cell` (None in f32 mode, cell_size under bf16 operands) selects
    cell-relative geometry: operands upcast to f32 at load and dx/dy add the
    per-view center delta back — all math/accumulation stays f32."""
    i = pl.program_id(0)
    flag = refs[0][i, 0]
    qcnt_ref = refs[1]
    scnt_ref = refs[2]
    scalars = tuple(refs[3 + k][0, 0] for k in range(n_sc))
    qg = refs[3 + n_sc]
    sg = refs[4 + n_sc]
    idx = 5 + n_sc
    qv = refs[idx] if n_qv else None
    idx += 1 if n_qv else 0
    sv = refs[idx] if n_sv else None
    idx += 1 if n_sv else 0
    n_post_ops = 1 + max((op for op, _ in post_plan), default=-1)
    qpost_refs = refs[idx : idx + n_post_ops]
    out_ref = refs[-1]

    def post_tile(l, qp, c0, cw):
        """Logical post plane l of query slot qp — post_plan maps it to its
        own (separately passed, reshape-blocked) operand ref."""
        op, comp = post_plan[l]
        r = qpost_refs[op]
        if comp is None:
            return r[qp, 0, :, c0 : c0 + cw]
        return r[comp, qp, 0, :, c0 : c0 + cw]

    # dead bands/chunks/slots must output exact zeros (the unrolled kernel's
    # masked sums); live chunks overwrite below
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(flag != 0)
    def _run():
        for cc, (c0, cw) in enumerate(chunks):
            q_cnt = qcnt_ref[i, cc]
            s_cnt = scnt_ref[i, cc]

            @pl.when((q_cnt > 0) & (s_cnt > 0))
            def _chunk(c0=c0, cw=cw, q_cnt=q_cnt, s_cnt=s_cnt):
                def qp_body(qp, _):
                    qx = qg[0, qp, 0, :, c0 : c0 + cw].astype(REAL)
                    qy = qg[1, qp, 0, :, c0 : c0 + cw].astype(REAL)
                    # compare in f32: Mosaic mis-relayouts masks born from
                    # bf16 (16,128)-tiled compares against f32-born masks
                    qm = qg[2, qp, 0, :, c0 : c0 + cw].astype(REAL) > 0.0
                    q_planes = tuple(
                        qv[l, qp, 0, :, c0 : c0 + cw].astype(REAL)
                        for l in range(n_qv)
                    )
                    accs = tuple(
                        jnp.zeros((br, cw), dtype=REAL) for _ in range(n_acc)
                    )
                    for dyv in range(3):
                        for dxv in range(3):

                            def sp_body(sp, accs, dyv=dyv, dxv=dxv):
                                cols = pl.ds(c0 + dxv, cw)
                                rows = pl.ds(dyv, br)
                                cx = sg[0, sp, 0, rows, cols].astype(REAL)
                                cy = sg[1, sp, 0, rows, cols].astype(REAL)
                                s_planes = tuple(
                                    sv[l, sp, 0, rows, cols].astype(REAL)
                                    for l in range(n_sv)
                                )
                                dx = cx - qx
                                dy = cy - qy
                                if rebase_cell is not None:
                                    dx = dx + (dxv - 1) * rebase_cell
                                    dy = dy + (dyv - 1) * rebase_cell
                                r_sq = dx * dx + dy * dy
                                # no source-mask operand: dead sources carry
                                # SENTINEL_POS -> r_sq = inf -> radius-culled
                                valid = (
                                    qm
                                    & (r_sq <= radius_sq)
                                    & (r_sq > MIN_DISTANCE_SQ)
                                )
                                outs = term_fn(
                                    dx, dy, r_sq, jnp.sqrt(r_sq), scalars,
                                    q_planes, s_planes,
                                )
                                # where (not multiply): masked slots may hold
                                # inf/NaN and NaN * 0 == NaN
                                return tuple(
                                    a + jnp.where(valid, o, 0.0)
                                    for a, o in zip(accs, outs)
                                )

                            if unroll:
                                for sp in range(ps):
                                    accs = sp_body(sp, accs)
                            else:
                                accs = jax.lax.fori_loop(
                                    0, s_cnt, sp_body, accs
                                )
                    if post_fn is None:
                        outs = accs
                    else:
                        post_planes = tuple(
                            post_tile(l, qp, c0, cw)
                            for l in range(len(post_plan))
                        )
                        outs = post_fn(accs, post_planes, scalars)
                    for k in range(n_out):
                        out_ref[k, qp, 0, :, c0 : c0 + cw] = outs[k]
                    return 0

                if unroll:
                    for qp in range(p):
                        qp_body(qp, 0)
                else:
                    jax.lax.fori_loop(0, q_cnt, qp_body, 0)


def pf_pair_reduce(
    term_fn,
    n_out: int,
    q: PFGeom,
    s: PFGeom,
    flags: jax.Array,
    grid: DenseGridConfig,
    br: int,
    q_vals: Sequence[jax.Array] = (),
    s_vals: Sequence[jax.Array] = (),
    scalars: Sequence = (),
    interpret: bool = None,
    chunk_lanes=_CHUNK_FROM_GRID,
    post_fn=None,
    post_planes: Sequence[jax.Array] = (),
    n_acc: int = None,
    unroll: bool = None,
):
    """sm_pair_reduce in plane form: q_vals / s_vals are resident plane arrays
    ((P, NYP, NXP) scalars, (2, P, NYP, NXP) vectors), the result is ONE
    stacked (n_out, P, NYP, NXP) array (a vector output's components are
    adjacent leading planes). Per-pass accumulation order is identical to
    sm_pair_reduce — outputs are bit-equal to it given equal inputs.

    `chunk_lanes` overrides `grid.pallas_pf_chunk_lanes` per call (the best
    width depends on the pass's accumulator count — see PERF.md round 4);
    outputs are bitwise-identical at every width.

    `unroll` (default `grid.pf_unroll_resolved`: auto-on below
    SMALL_GRID_SLOTS) replaces the occupancy-bounded slot fori_loops with
    static unrolls — the round-3 kernel structure, whose ILP wins on small
    grids where loop control dominates. No-post outputs are bitwise identical
    either way; with `post_fn`, dead lanes hold post_fn(0, ...) instead of
    zeros beyond the live bound (nothing consumes them — see the contract
    above).

    `post_fn(accs, post_tiles, scalars) -> n_out tiles` maps the `n_acc`
    accumulator tiles (default n_out) through an elementwise epilogue using
    `post_planes` (query-side resident planes, kept in EXACT f32 — never the
    bf16 operand dtype) before the store: pressure-loop glue fused into the
    kernel, running only on live bands. Each post entry is its own pallas
    operand (blocking = pure reshape, no concat copy): ndim-3 entries are one
    (P, NYP, NXP) plane; ndim-4 entries ((2, ...) vectors or pre-stacked
    outputs) contribute shape[0] logical planes in order. Exact post contract (only LIVE-masked
    lanes are pinned): live lanes are bit-identical to composing the same jnp
    ops on the no-post kernel's output; dead bands/chunks and slots >= the
    chunk's live bound emit zeros; dead LANES below a live bound store
    post_fn(0, post_planes) — e.g. stale-velocity-derived values from
    _apply_correction_pf. Every solver consumer masks dead slots; a new
    unmasked consumer must not rely on dead-lane values."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nbr = q.q_geom.shape[2]
    p = q.q_geom.shape[1]
    ps = s.s_geom.shape[1]
    nxp = q.q_geom.shape[4]

    dtype = _pf_dtype(grid)
    assert q.q_geom.dtype == dtype and s.s_geom.dtype == dtype, (
        f"geometry dtype {q.q_geom.dtype}/{s.s_geom.dtype} does not match "
        f"grid.pair_dtype {grid.pair_dtype}: build PFGeom with the same grid"
    )

    qv_b = (
        _pf_block_query(_pf_concat(q_vals).astype(dtype), br)
        if q_vals else None
    )
    if s_vals:
        sv_planes = _pf_concat(s_vals).astype(dtype)
        # one ppermute pair per pass for ALL source values (None on one device;
        # bf16 operands halve the exchanged halo bytes too)
        sv_b = _pf_block_source(sv_planes, br, halo=_pf_halo(sv_planes, grid))
    else:
        sv_b = None
    n_qv = qv_b.shape[0] if q_vals else 0
    n_sv = sv_b.shape[0] if s_vals else 0
    # Post planes stay exact f32 and need no halo (query-side only). Each
    # entry is its OWN pallas operand — query blocking is then a pure reshape
    # per entry, with no _pf_concat copy (at 1M the loop kernels' post concats
    # were ~3-6 ms/step of pure HBM round-trip — PERF.md round 5). An entry
    # with ndim 3 is one (P, NYP, NXP) plane; ndim 4 contributes shape[0]
    # logical planes ((2,...) vectors, or e.g. the ctx pass's stacked stat
    # output). post_plan maps logical plane index -> (operand, component).
    post_ops = []
    post_plan = []
    for v in post_planes:
        v = v.astype(REAL)
        blocked = v.reshape(v.shape[:-2] + (v.shape[-2] // br, br, v.shape[-1]))
        op_idx = len(post_ops)
        post_ops.append(blocked)
        if v.ndim == 3:
            post_plan.append((op_idx, None))
        else:
            post_plan.extend((op_idx, k) for k in range(v.shape[0]))
    post_plan = tuple(post_plan)
    assert post_fn is not None or not post_plan, "post_planes without post_fn"
    if n_acc is None:
        n_acc = n_out

    scalars_2d = [jnp.asarray(a, dtype=REAL).reshape(1, 1) for a in scalars]

    def vmem_spec(a):
        blk = a.shape[:2] + (1,) + a.shape[3:]
        return pl.BlockSpec(
            blk, lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
        )

    def smem_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    flag_spec = smem_spec(flags)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    chunks = _pf_chunks(grid, nxp, override=chunk_lanes)
    q_cnt = _pf_coarsen(q.q_cnt, chunks)
    s_cnt = _pf_coarsen(s.s_cnt, chunks)

    operands = [flags, q_cnt, s_cnt] + scalars_2d + [q.q_geom, s.s_geom]
    in_specs = (
        [flag_spec, smem_spec(q_cnt), smem_spec(s_cnt)]
        + [scalar_spec for _ in scalars_2d]
        + [vmem_spec(q.q_geom), vmem_spec(s.s_geom)]
    )
    if q_vals:
        operands.append(qv_b)
        in_specs.append(vmem_spec(qv_b))
    if s_vals:
        operands.append(sv_b)
        in_specs.append(vmem_spec(sv_b))
    for b in post_ops:
        operands.append(b)
        if b.ndim == 4:  # (P, nbr, BR, NXP) scalar plane
            in_specs.append(pl.BlockSpec(
                (b.shape[0], 1, br, nxp), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ))
        else:  # (L, P, nbr, BR, NXP) stacked planes
            in_specs.append(vmem_spec(b))

    out_shape = jax.ShapeDtypeStruct((n_out, p, nbr, br, nxp), REAL)
    out_spec = pl.BlockSpec(
        (n_out, p, 1, br, nxp), lambda i: (0, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )

    if unroll is None:
        # interpret mode (CPU tests) executes unrolled bodies eagerly, one
        # python iteration per (qp, view, sp) — ~8x slower than tracing the
        # fori_loop once, with no device ILP to win. Outputs are bitwise
        # identical either way (pinned by tests), so default it off there;
        # an explicit unroll=True still exercises the unrolled path.
        unroll = False if interpret else grid.pf_unroll_resolved
    kernel = functools.partial(
        _pf_kernel, term_fn, post_fn, len(scalars_2d), n_qv, n_sv, post_plan,
        n_acc, n_out, p, ps, br, nxp,
        chunks, grid.radius_sq,
        float(grid.cell_size) if dtype != REAL else None,
        unroll,
    )
    out = _maybe_jit_call(pl.pallas_call(
        kernel,
        grid=(nbr,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    ), interpret)(*operands)
    return out.reshape(n_out, p, nbr * br, nxp)


def pf_move_codes(pos: jax.Array, mask: jax.Array, grid: DenseGridConfig,
                  row0=None) -> jax.Array:
    """dense_grid.move_codes in plane form: (P, NYP, NXP) f32 code plane (0 =
    dead slot; padding rows/cols are dead by the mask invariant). `row0` is
    this shard's global cell-row offset under spatial sharding (codes are then
    computed against the GLOBAL row range so cross-shard moves survive,
    mirroring dense_grid.move_codes)."""
    _, nyp, nxp = mask.shape
    iy = jnp.arange(nyp, dtype=jnp.int32)[None, :, None]
    ix = jnp.arange(nxp, dtype=jnp.int32)[None, None, :]
    inv = jnp.asarray(1.0 / grid.cell_size, dtype=REAL)
    origin = jnp.asarray(grid.origin, dtype=REAL)
    cx = jnp.clip(
        jnp.floor((pos[0] - origin[0]) * inv).astype(jnp.int32), 0, grid.nx - 1
    )
    if row0 is None:
        cy = jnp.clip(
            jnp.floor((pos[1] - origin[1]) * inv).astype(jnp.int32),
            0, grid.ny - 1,
        )
    else:
        n_shards = grid.halo_axis[1] if grid.halo_axis is not None else 1
        cy = jnp.clip(
            jnp.floor((pos[1] - origin[1]) * inv).astype(jnp.int32),
            0, grid.ny * n_shards - 1,
        )
        iy = iy + row0
    dy = jnp.clip(cy - iy, -1, 1)
    dx = jnp.clip(cx - ix, -1, 1)
    return jnp.where(mask, (dy + 1) * 3 + (dx + 1) + 1, 0).astype(REAL)


def _pf_rebucket_kernel(n_pay, p, br, nx, chunks, *refs):
    """PF re-bucket body — occupancy-adaptive candidate scan with PER-VIEW
    slot bounds. refs: flag(SMEM (nbr, 1)), cnt9(SMEM (nbr, 9*len(chunks)):
    per (chunk, view) candidate slot bound, view-major within a chunk), src
    (1+n_pay, P, 1, BR+2, NXS) with plane 0 = move code, out (n_pay+1, P, 1,
    BR, NXP).

    View (dyv, dxv) only selects candidates whose move code equals
    (2-dyv)*3 + (2-dxv) + 1, so each view's slot loop is bounded by the max
    live slot index of THAT code in the chunk's window — most particles do
    not change cell per CFL step, so the eight mover views are usually empty
    (bound 0 -> the fori_loop body never runs) and the scan cost collapses
    to ~the stay view. Skipped candidates have a different code and would
    have contributed nothing to the running rank or the accumulators, so
    compaction order and payloads stay BITWISE identical to the all-candidate
    scan at every chunk width.

    Per live chunk: one counting scan yields the incoming-total plane
    (written at slot 0 — consumers read only slot 0) and the chunk's max
    incoming count, which bounds the target slot loop; each target slot then
    rescans candidates in the fully-unrolled kernel's exact (dyv, dxv, sp)
    order. Dead chunks / target slots beyond the incoming max keep the
    pre-written zeros, exactly what the unrolled kernel's masked sums
    produced."""
    flag_ref, cnt_ref, src, out_ref = refs
    i = pl.program_id(0)
    flag = flag_ref[i, 0]
    ncl = len(chunks)

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(flag != 0)
    def _run():
        for cc, (c0, cw) in enumerate(chunks):
            bounds = [cnt_ref[i, v * ncl + cc] for v in range(9)]
            any_live = bounds[0]
            for b in bounds[1:]:
                any_live = jnp.maximum(any_live, b)

            @pl.when(any_live > 0)
            def _chunk(c0=c0, cw=cw, bounds=bounds):
                # counting scan: per-cell incoming total for this chunk
                cnt = jnp.zeros((br, cw), dtype=REAL)
                for dyv in range(3):
                    for dxv in range(3):
                        expected = float((2 - dyv) * 3 + (2 - dxv) + 1)

                        def cnt_body(sp, cnt, dyv=dyv, dxv=dxv,
                                     expected=expected):
                            c = src[0, sp, 0, pl.ds(dyv, br),
                                    pl.ds(c0 + dxv, cw)]
                            return cnt + jnp.where(c == expected, 1.0, 0.0)

                        cnt = jax.lax.fori_loop(
                            0, bounds[dyv * 3 + dxv], cnt_body, cnt
                        )
                out_ref[n_pay, 0, 0, :, c0 : c0 + cw] = cnt
                qp_max = jnp.minimum(jnp.max(cnt).astype(jnp.int32), p)

                def qp_body(qp, _):
                    run = jnp.zeros((br, cw), dtype=REAL)
                    accs = tuple(
                        jnp.zeros((br, cw), dtype=REAL)
                        for _ in range(n_pay)
                    )
                    qp_f = qp.astype(REAL)
                    for dyv in range(3):
                        for dxv in range(3):
                            expected = float((2 - dyv) * 3 + (2 - dxv) + 1)

                            def sp_body(sp, carry, dyv=dyv, dxv=dxv,
                                        expected=expected):
                                run, accs = carry
                                rows = pl.ds(dyv, br)
                                cols = pl.ds(c0 + dxv, cw)
                                c = src[0, sp, 0, rows, cols]
                                sel = c == expected
                                hit = sel & (run == qp_f)
                                accs = tuple(
                                    a + jnp.where(
                                        hit, src[1 + k, sp, 0, rows, cols], 0.0
                                    )
                                    for k, a in enumerate(accs)
                                )
                                return run + jnp.where(sel, 1.0, 0.0), accs

                            run, accs = jax.lax.fori_loop(
                                0, bounds[dyv * 3 + dxv], sp_body, (run, accs)
                            )
                    for k in range(n_pay):
                        out_ref[k, qp, 0, :, c0 : c0 + cw] = accs[k]
                    return 0

                jax.lax.fori_loop(0, qp_max, qp_body, 0)


def pf_rebucket(pos, mask, values, grid: DenseGridConfig, br: int,
                interpret: bool = None, row0=None,
                chunk_lanes=_CHUNK_FROM_GRID):
    """sm_rebucket in plane form. pos (2, P, NYP, NXP), mask (P, NYP, NXP),
    values (D, P, NYP, NXP). Returns (new_pos, new_mask, new_values,
    num_dropped) in the same plane layout — no transposes anywhere.

    Under spatial sharding (grid.halo_axis set, `row0` = this shard's global
    cell-row offset) the exchanged halo rows ARE the cross-shard particle
    migration, exactly like dense_grid.rebucket: a particle whose advected
    cell row crosses the seam is re-bucketed into the neighbor shard's edge
    cells through the halo row (one ppermute pair for code+payload together).
    num_dropped is per-shard; callers psum it."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, nyp, nxp = mask.shape
    d = values.shape[0]
    n_pay = 2 + d

    code = pf_move_codes(pos, mask, grid, row0=row0)
    src_planes = jnp.concatenate([code[None], pos, values], axis=0)
    halo = _pf_halo(src_planes, grid)
    src = _pf_block_source(
        src_planes, br, halo=halo
    )  # (1+n_pay, P, nbr, BR+2, NXS)
    nbr = src.shape[2]

    band_any, first_any, last_any = _pf_band_bits(mask, br)
    if halo is None:
        edge_below = jnp.zeros((1,), dtype=bool)
        edge_above = jnp.zeros((1,), dtype=bool)
    else:
        # live candidates in the received rows (code plane > 0) may migrate in
        edge_below = jnp.any(halo[0][0] > 0.0).reshape(1)
        edge_above = jnp.any(halo[1][0] > 0.0).reshape(1)
    below = jnp.concatenate([edge_below, last_any[:-1]])
    above = jnp.concatenate([first_any[1:], edge_above])
    flags = (band_any | below | above).astype(jnp.int32)[:, None]

    # occupancy meta from the move-code plane, PER VIEW: view (dyv, dxv) only
    # selects code (2-dyv)*3 + (2-dxv) + 1, so its slot loop is bounded by
    # the max live slot index of that code over the chunk's (conservative,
    # all-rows + column-halo) window. Halo rows are included since src is
    # blocked post-exchange. XLA fuses the nine compares into one read of the
    # code plane; the nine (nbr, ncb) tables are tiny.
    if chunk_lanes is _CHUNK_FROM_GRID and grid.pallas_pf_rebucket_chunk_lanes \
            not in (None, -1):
        chunk_lanes = grid.pallas_pf_rebucket_chunk_lanes
    chunks = _pf_chunks(grid, nxp, override=chunk_lanes)
    ncb = nxp // LANE
    codes = src[0]  # (P, nbr, BR+2, NXS)
    view_bounds = []
    for dyv in range(3):
        for dxv in range(3):
            expected = float((2 - dyv) * 3 + (2 - dxv) + 1)
            colb = _col_slot_bound(codes == expected)  # (nbr, NXS)
            view_bounds.append(
                _pf_coarsen(_window_chunk_max(colb, ncb), chunks)
            )
    # (nbr, 9*ncl), view-major within a chunk: [i, v*ncl + cc]
    cnt9 = jnp.stack(view_bounds).transpose(1, 0, 2).reshape(
        src.shape[2], 9 * len(chunks)
    )

    def smem_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    src_spec = pl.BlockSpec(
        src.shape[:2] + (1,) + src.shape[3:], lambda i: (0, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_pay + 1, p, nbr, br, nxp), REAL)
    out_spec = pl.BlockSpec(
        (n_pay + 1, p, 1, br, nxp), lambda i: (0, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(_pf_rebucket_kernel, n_pay, p, br, nxp, chunks)
    out = _maybe_jit_call(pl.pallas_call(
        kernel,
        grid=(nbr,),
        in_specs=[smem_spec(flags), smem_spec(cnt9), src_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    ), interpret)(flags, cnt9, src)

    out = out.reshape(n_pay + 1, p, nbr * br, nxp)
    new_pos = out[0:2]
    new_values = out[2 : 2 + d]
    total = out[n_pay, 0].astype(jnp.int32)  # same for every slot
    lane = jnp.arange(p, dtype=jnp.int32)[:, None, None]
    new_mask = lane < total[None]
    num_dropped = jnp.sum(jnp.maximum(total - p, 0))
    return new_pos, new_mask, new_values, num_dropped.astype(jnp.int32)


def _sm_rebucket_kernel(n_pay, p, br, nx, *refs):
    """Slot-major re-bucket body. refs: flag(SMEM), src (1, 1+n_pay, P, BR+2,
    NXS) with plane 0 = move code, out (1, n_pay+1, P, BR, NXP) with the last
    plane = per-cell incoming total (identical for every qp; consumers read
    slot 0).

    For each target slot qp, candidates are scanned in the XLA re-bucket's
    (view, source-slot) order with a running selected-count plane; a candidate
    lands in qp iff its code matches the view and its rank equals qp. Payload
    passes through EXACTLY: each (cell, qp) has at most one hit, so the
    accumulating f32 adds only ever add one nonzero term (no precision caveat,
    unlike the XLA path's one-hot dot which needs Precision.HIGHEST)."""
    flag_ref, src, out_ref = refs
    flag = flag_ref[pl.program_id(0), 0]

    @pl.when(flag == 0)
    def _skip():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(flag != 0)
    def _run():
        for qp in range(p):
            cnt = jnp.zeros((br, nx), dtype=REAL)
            accs = [jnp.zeros((br, nx), dtype=REAL) for _ in range(n_pay)]
            for dyv in range(3):
                for dxv in range(3):
                    # a candidate seen through view (dyv, dxv) lands here iff
                    # its move code is (2-dyv)*3 + (2-dxv) + 1 (dense_grid.rebucket)
                    expected = float((2 - dyv) * 3 + (2 - dxv) + 1)
                    for sp in range(p):
                        c = src[0, 0, sp, dyv : dyv + br, dxv : dxv + nx]
                        sel = c == expected
                        hit = sel & (cnt == float(qp))
                        for k in range(n_pay):
                            accs[k] = accs[k] + jnp.where(
                                hit,
                                src[0, 1 + k, sp, dyv : dyv + br, dxv : dxv + nx],
                                0.0,
                            )
                        cnt = cnt + jnp.where(sel, 1.0, 0.0)
            for k in range(n_pay):
                out_ref[0, k, qp] = accs[k]
            out_ref[0, n_pay, qp] = cnt  # full selected count == incoming total


def sm_rebucket(positions_pad, mask, values_pad, grid: DenseGridConfig,
                br: int, interpret: bool = None):
    """Slot-major Pallas re-bucket — bit-exact replacement for
    dense_grid.rebucket on a single device (no halo collectives; the shard_map
    solvers keep the XLA path).

    Same contract as dense_grid.rebucket: every live slot moves to the cell
    containing its position (clamped into the old 3x3 window by the move code),
    selected candidates compact into slots in deterministic (view, slot) order,
    target-cell overflow beyond P drops the particle (counted). Returns
    (new_positions_pad, new_mask, new_values_pad, num_dropped).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert grid.halo_axis is None, (
        "sm_rebucket has no halo exchange; sharded solvers use dense_grid.rebucket"
    )
    ny, nx, p = mask.shape
    d = values_pad.shape[-1]
    n_pay = 2 + d

    code = move_codes(positions_pad, mask, grid).astype(REAL)
    planes = _values_to_planes([code, positions_pad, values_pad])
    src = _block_source(planes, br)  # (nbr, 1+n_pay, P, BR+2, NXS)
    nbr = src.shape[0]
    nxp = _nx_padded(nx)

    # a band runs iff any live source slot sits in its (BR+2)-row window
    band_any, first_any, last_any = _band_bits(mask, br)
    false = jnp.zeros((1,), dtype=bool)
    below = jnp.concatenate([false, last_any[:-1]])
    above = jnp.concatenate([first_any[1:], false])
    flags = (band_any | below | above).astype(jnp.int32)[:, None]

    flag_spec = pl.BlockSpec(flags.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    src_spec = pl.BlockSpec(
        (1,) + src.shape[1:], lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((nbr, n_pay + 1, p, br, nxp), REAL)
    out_spec = pl.BlockSpec(
        (1, n_pay + 1, p, br, nxp), lambda i: (i, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(_sm_rebucket_kernel, n_pay, p, br, nxp)
    out = _maybe_jit_call(pl.pallas_call(
        kernel,
        grid=(nbr,),
        in_specs=[flag_spec, src_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    ), interpret)(flags, src)

    # (nbr, n_pay+1, P, BR, NXP) -> planes of (ny, nx, P)
    out = out.transpose(1, 0, 3, 4, 2).reshape(n_pay + 1, nbr * br, nxp, p)
    out = out[:, :ny, :nx]
    new_pos = jnp.stack([out[0], out[1]], axis=-1)
    new_values = jnp.stack([out[2 + k] for k in range(d)], axis=-1)
    total = out[n_pay][..., 0].astype(jnp.int32)  # same for every slot
    lane = jnp.arange(p, dtype=jnp.int32)
    new_mask = lane[None, None, :] < total[:, :, None]
    num_dropped = jnp.sum(jnp.maximum(total - p, 0))
    return new_pos, new_mask, new_values, num_dropped.astype(jnp.int32)
