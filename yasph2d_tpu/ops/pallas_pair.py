"""Pallas TPU kernel for the dense pair pass.

Drop-in alternative to `dense_grid.pair_reduce` (same fn contract): the whole
pipeline — 3x3 window assembly, pair geometry, kernel math, masking, reduction —
runs inside one Pallas kernel per (row, column) cell tile, touching HBM once per
input and once per output. The XLA path materializes its per-pair tensors in HBM
(~2.9 GB per pass at 1M particles, the measured pass-cost floor — PERF.md round
3); here they are VMEM-local.

Layout: the pallas grid is 2D (num_row_blocks, num_col_blocks); each program sees
  - query tile   (BR, BC, P, ...)           [VMEM]
  - source tile  (BR+2, BC+2, Ps, ...)      [VMEM]  (one halo cell on every side,
    pre-blocked host-side into (nbr, nbc, BR+2, BC+2, ...) — Pallas blocks cannot
    overlap, so the halos are materialized once per pass)
and loops over the nine neighbor-cell offsets as STATIC slices of the haloed
source tile, accumulating masked per-pair contributions. Per-pair temporaries
are (BR, BC, P, Ps) — a few hundred KB at the default BR=8, BC=128, which is
what keeps the Mosaic scoped-VMEM allocation under the 16 MB limit (full-width
row blocks OOMed: 48 MB scoped at nx=168, PERF.md round 3).

`fn(ri_to_rj, r_sq, r, *scalars, *query_vals, *cand_vals) -> pytree` is traced
INSIDE the kernel; it must be pure jnp math (it is, for all solver uses).
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import REAL
from .dense_grid import MIN_DISTANCE_SQ, DenseGridConfig

DEFAULT_BLOCK_ROWS = 8
DEFAULT_BLOCK_COLS = 128


def _kernel(fn, grid: DenseGridConfig, n_sc, n_qv, n_sv, *refs):
    """Pallas kernel body. refs: *scalars(SMEM), q_pos, q_mask, *q_vals, s_pos,
    s_mask, *s_vals (haloed tiles), *out_refs (one per output leaf)."""
    scalars = [refs[i][0, 0] for i in range(n_sc)]
    refs = refs[n_sc:]
    q_pos = refs[0][:]  # (BR, BC, P, 2)
    q_mask = refs[1][:]  # (BR, BC, P) f32 (Mosaic cannot shift/broadcast i1)
    q_vals = [refs[2 + i][:] for i in range(n_qv)]
    base = 2 + n_qv
    # source tiles arrive with leading (1, 1) block axes; squeeze
    s_pos = refs[base][0, 0]  # (BR+2, BC+2, Ps, 2)
    s_mask = refs[base + 1][0, 0]
    s_vals = [refs[base + 2 + i][0, 0] for i in range(n_sv)]
    out_refs = refs[base + 2 + n_sv :]

    br, bc, p = q_mask.shape
    ps = s_mask.shape[2]

    radius_sq = jnp.asarray(grid.radius_sq, dtype=REAL)
    min_d = jnp.asarray(MIN_DISTANCE_SQ, dtype=REAL)

    q_vals_b = [
        v[:, :, :, None] if v.ndim == 3 else v[:, :, :, None, :] for v in q_vals
    ]

    accs = None
    for dy in range(3):
        for dx in range(3):
            c_pos = s_pos[dy : dy + br, dx : dx + bc]  # (BR, BC, Ps, 2)
            c_mask = s_mask[dy : dy + br, dx : dx + bc]
            c_vals = [v[dy : dy + br, dx : dx + bc][:, :, None] for v in s_vals]

            ri_to_rj = c_pos[:, :, None, :, :] - q_pos[:, :, :, None, :]
            r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)  # (BR, BC, P, Ps)
            qf = q_mask[:, :, :, None]
            cf = c_mask[:, :, None, :]
            in_radius = (r_sq <= radius_sq) & (r_sq > min_d)
            valid_f = jnp.where(in_radius, qf * cf, 0.0)

            per_pair = fn(ri_to_rj, r_sq, jnp.sqrt(r_sq), *scalars, *q_vals_b,
                          *c_vals)
            leaves = jax.tree_util.tree_leaves(per_pair)

            contribs = []
            for leaf in leaves:
                w = valid_f if leaf.ndim == valid_f.ndim else valid_f[..., None]
                # where (not multiply): masked slots may hold inf/NaN (e.g.
                # division by a dead slot's zero density) and NaN * 0 == NaN.
                contribs.append(jnp.sum(jnp.where(w > 0.0, leaf, 0.0), axis=3))
            accs = contribs if accs is None else [
                a + c for a, c in zip(accs, contribs)
            ]

    for ref, acc in zip(out_refs, accs):
        ref[:] = acc


def pallas_pair_reduce(
    fn,
    query_padded_pos,
    query_mask,
    source_padded_pos,
    source_mask,
    grid: DenseGridConfig,
    source_values: Sequence = (),
    query_values: Sequence = (),
    scalar_args: Sequence = (),
    block_rows: int = DEFAULT_BLOCK_ROWS,
    block_cols: int = DEFAULT_BLOCK_COLS,
    interpret: bool = False,
):
    """Same contract as dense_grid.pair_reduce, computed by a Pallas TPU kernel."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the kernel through the Pallas interpreter
    ny, nx, p = query_mask.shape
    ps = source_mask.shape[2]
    br = min(block_rows, ny)
    bc = min(block_cols, nx)
    nbr = -(-ny // br)
    nbc = -(-nx // bc)
    ny_pad, nx_pad = nbr * br, nbc * bc

    def pad2d(a):
        er, ec = ny_pad - a.shape[0], nx_pad - a.shape[1]
        if er:
            a = jnp.concatenate(
                [a, jnp.zeros((er,) + a.shape[1:], a.dtype)], axis=0
            )
        if ec:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], ec) + a.shape[2:], a.dtype)], axis=1
            )
        return a

    def halo2d(a):
        a = pad2d(a)
        zr = jnp.zeros_like(a[:1])
        a = jnp.concatenate([zr, a, zr], axis=0)
        zc = jnp.zeros_like(a[:, :1])
        return jnp.concatenate([zc, a, zc], axis=1)

    def block_source(a):
        """(ny_pad+2, nx_pad+2, ...) haloed -> (nbr, nbc, BR+2, BC+2, ...):
        overlapping tiles materialized host-side (Pallas blocks cannot overlap)."""
        rows = [
            jnp.stack(
                [a[i * br : i * br + br + 2, j * bc : j * bc + bc + 2]
                 for j in range(nbc)],
                axis=0,
            )
            for i in range(nbr)
        ]
        return jnp.stack(rows, axis=0)

    q_pos = pad2d(query_padded_pos)
    q_mask = pad2d(query_mask.astype(REAL))  # f32 masks for Mosaic
    q_vals = [pad2d(v) for v in query_values]

    s_pos_b = block_source(halo2d(source_padded_pos))
    s_mask_b = block_source(halo2d(source_mask.astype(REAL)))
    s_vals_b = [block_source(halo2d(v)) for v in source_values]

    scalars_2d = [jnp.asarray(a, dtype=REAL).reshape(1, 1) for a in scalar_args]

    # Output structure by abstract evaluation of the per-pair fn on one tile.
    def probe(ri, r_sq, r, sc, qv, cv):
        return fn(ri, r_sq, r, *sc, *qv, *cv)

    per_pair_shape = jax.eval_shape(
        probe,
        jax.ShapeDtypeStruct((br, bc, p, ps, 2), REAL),
        jax.ShapeDtypeStruct((br, bc, p, ps), REAL),
        jax.ShapeDtypeStruct((br, bc, p, ps), REAL),
        tuple(jax.ShapeDtypeStruct((), REAL) for _ in scalars_2d),
        tuple(
            jax.ShapeDtypeStruct((br, bc, p, 1), REAL) if v.ndim == 3
            else jax.ShapeDtypeStruct((br, bc, p, 1, v.shape[-1]), REAL)
            for v in q_vals
        ),
        tuple(
            jax.ShapeDtypeStruct((br, bc, 1, ps) + v.shape[5:], REAL)
            for v in s_vals_b
        ),
    )
    out_leaves_pp, out_treedef = jax.tree_util.tree_flatten(per_pair_shape)
    # reduce over the candidate axis (3)
    out_leaves = [
        jax.ShapeDtypeStruct(leaf.shape[:3] + leaf.shape[4:], leaf.dtype)
        for leaf in out_leaves_pp
    ]

    def q_spec(a):
        blk = (br, bc) + a.shape[2:]
        nd = a.ndim
        return pl.BlockSpec(blk, lambda i, j, nd=nd: (i, j) + (0,) * (nd - 2),
                            memory_space=pltpu.VMEM)

    def src_spec(a):
        blk = (1, 1) + a.shape[2:]
        nd = a.ndim
        return pl.BlockSpec(blk, lambda i, j, nd=nd: (i, j) + (0,) * (nd - 2),
                            memory_space=pltpu.VMEM)

    scalar_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)
    in_specs = (
        [scalar_spec for _ in scalars_2d]
        + [q_spec(q_pos), q_spec(q_mask)]
        + [q_spec(v) for v in q_vals]
        + [src_spec(s_pos_b), src_spec(s_mask_b)]
        + [src_spec(v) for v in s_vals_b]
    )
    out_specs = [
        pl.BlockSpec(
            (br, bc) + leaf.shape[2:],
            lambda i, j, nd=len(leaf.shape): (i, j) + (0,) * (nd - 2),
            memory_space=pltpu.VMEM,
        )
        for leaf in out_leaves
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((ny_pad, nx_pad) + leaf.shape[2:], leaf.dtype)
        for leaf in out_leaves
    ]

    kernel = functools.partial(
        _kernel, fn, grid, len(scalars_2d), len(q_vals), len(s_vals_b)
    )

    outs = pl.pallas_call(
        kernel,
        grid=(nbr, nbc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*scalars_2d, q_pos, q_mask, *q_vals, s_pos_b, s_mask_b, *s_vals_b)

    outs = [o[:ny, :nx] for o in outs]
    return jax.tree_util.tree_unflatten(out_treedef, outs)
