"""Pallas TPU kernel for the dense pair pass.

Drop-in alternative to `dense_grid.pair_reduce` (same fn contract): the whole
pipeline — 3x3 window assembly, pair geometry, kernel math, masking, reduction —
runs inside one Pallas kernel per row block, touching HBM once per input and once
per output. The XLA path materializes windowed candidate copies per pass; here the
windows are register/VMEM-local.

Layout: the grid is (num_row_blocks,); each program sees
  - query block  (B, nx, P, ...)      [VMEM]
  - source block (B+2, nx, Ps, ...)   [VMEM]  (one halo row above/below, pre-blocked)
and loops over the nine neighbor-cell offsets, accumulating masked per-pair
contributions. Per-pair temporaries are (B, nx, P, Ps) — sized to stay inside VMEM
for the default B=8, P=8.

`fn(ri_to_rj, r_sq, r, *query_vals, *cand_vals) -> pytree` is traced INSIDE the
kernel; it must be pure jnp math (it is, for all solver uses).
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


def _block_source(arr, nb, block):
    """(ny_pad, nx, Ps, ...) with halo rows -> (nb, block+2, nx, Ps, ...)."""
    views = [arr[i * block : i * block + block + 2] for i in range(nb)]
    return jnp.stack(views, axis=0)


def _kernel(fn, grid: DenseGridConfig, n_sc, n_qv, n_sv, leaf_treedef, *refs):
    """Pallas kernel body. refs: *scalars(SMEM), q_pos, q_mask, *q_vals, s_pos,
    s_mask, *s_vals, *out_refs (one per output leaf)."""
    scalars = [refs[i][0, 0] for i in range(n_sc)]
    refs = refs[n_sc:]
    q_pos = refs[0][:]  # (B, nx, P, 2)
    q_mask = refs[1][:]  # (B, nx, P) f32 (Mosaic cannot shift/broadcast i1 vectors)
    q_vals = [refs[2 + i][:] for i in range(n_qv)]
    base = 2 + n_qv
    s_pos = refs[base][:]  # (B+2, nx, Ps, 2)
    s_mask = refs[base + 1][:]  # f32
    s_vals = [refs[base + 2 + i][:] for i in range(n_sv)]
    out_refs = refs[base + 2 + n_sv :]

    b, nx, p = q_mask.shape
    ps = s_mask.shape[2]

    radius_sq = jnp.asarray(grid.radius_sq, dtype=REAL)
    min_d = jnp.asarray(MIN_DISTANCE_SQ, dtype=REAL)

    q_vals_b = [
        v[:, :, :, None] if v.ndim == 3 else v[:, :, :, None, :] for v in q_vals
    ]

    # zero-initialize accumulators
    accs = None

    for dy in range(3):
        # candidate rows for this dy: source rows [dy, dy+b)
        c_pos_rows = s_pos[dy : dy + b]
        c_mask_rows = s_mask[dy : dy + b]
        c_vals_rows = [v[dy : dy + b] for v in s_vals]
        for dx in range(3):
            # shift columns by dx-1 with zero fill
            def shift(a, dx=dx):
                if dx == 0:
                    z = jnp.zeros_like(a[:, :1])
                    return jnp.concatenate([z, a[:, :-1]], axis=1)
                if dx == 2:
                    z = jnp.zeros_like(a[:, :1])
                    return jnp.concatenate([a[:, 1:], z], axis=1)
                return a

            c_pos = shift(c_pos_rows)  # (B, nx, Ps, 2)
            c_mask = shift(c_mask_rows)
            c_vals = [shift(v)[:, :, None] for v in c_vals_rows]

            ri_to_rj = c_pos[:, :, None, :, :] - q_pos[:, :, :, None, :]
            r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)  # (B, nx, P, Ps)
            # Masks arrive as f32 (Mosaic cannot shift/broadcast i1 vectors); the
            # radius window (already full-rank) selects via where.
            qf = q_mask[:, :, :, None]
            cf = c_mask[:, :, None, :]
            in_radius = (r_sq <= radius_sq) & (r_sq > min_d)
            valid_f = jnp.where(in_radius, qf * cf, 0.0)  # (B, nx, P, Ps)

            per_pair = fn(ri_to_rj, r_sq, jnp.sqrt(r_sq), *scalars, *q_vals_b,
                          *c_vals)
            leaves = jax.tree_util.tree_leaves(per_pair)

            contribs = []
            for leaf in leaves:
                w = valid_f if leaf.ndim == valid_f.ndim else valid_f[..., None]
                # where (not multiply): masked slots may hold inf/NaN (e.g. division
                # by a dead slot's zero density) and NaN * 0 == NaN. The predicate is
                # derived from the f32 mask at full rank, avoiding i1 broadcasts.
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
    interpret: bool = False,
):
    """Same contract as dense_grid.pair_reduce, computed by a Pallas TPU kernel."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the kernel through the Pallas interpreter
    ny, nx, p = query_mask.shape
    ps = source_mask.shape[2]
    block = min(block_rows, ny)
    nb = -(-ny // block)
    ny_pad = nb * block

    def pad_rows(a, rows):
        extra = rows - a.shape[0]
        if extra == 0:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], dtype=a.dtype)], axis=0
        )

    q_pos = pad_rows(query_padded_pos, ny_pad)
    q_mask = pad_rows(query_mask.astype(REAL), ny_pad)  # f32 masks for Mosaic
    q_vals = [pad_rows(v, ny_pad) for v in query_values]

    def halo(a):
        return jnp.concatenate(
            [jnp.zeros_like(a[:1]), pad_rows(a, ny_pad), jnp.zeros_like(a[:1])],
            axis=0,
        )

    s_pos_b = _block_source(halo(source_padded_pos), nb, block)
    s_mask_b = _block_source(halo(source_mask.astype(REAL)), nb, block)
    s_vals_b = [_block_source(halo(v), nb, block) for v in source_values]

    scalars_2d = [jnp.asarray(a, dtype=REAL).reshape(1, 1) for a in scalar_args]

    # Determine output structure by abstract evaluation of one block.
    def one_block(q_p, q_m, q_v, s_p, s_m, s_v, sc):
        from .dense_grid import _pair_reduce_block

        return _pair_reduce_block(fn, q_p, q_m, list(q_v), s_p, s_m, list(s_v), grid,
                                  tuple(sc))

    def col_halo(shape):
        return (shape[0], shape[1] + 2) + shape[2:]

    out_shape_tree = jax.eval_shape(
        one_block,
        jax.ShapeDtypeStruct((block, nx, p, 2), REAL),
        jax.ShapeDtypeStruct((block, nx, p), jnp.bool_),
        [jax.ShapeDtypeStruct((block,) + v.shape[1:], v.dtype) for v in q_vals],
        jax.ShapeDtypeStruct(col_halo((block + 2, nx, ps, 2)), REAL),
        jax.ShapeDtypeStruct(col_halo((block + 2, nx, ps)), jnp.bool_),
        [jax.ShapeDtypeStruct(col_halo((block + 2,) + v.shape[2:]), v.dtype)
         for v in s_vals_b],
        [jax.ShapeDtypeStruct((), REAL) for _ in scalars_2d],
    )
    out_leaves, out_treedef = jax.tree_util.tree_flatten(out_shape_tree)

    def row_spec(a):
        blk = (block,) + a.shape[1:]
        return pl.BlockSpec(blk, lambda i: (i,) + (0,) * (a.ndim - 1),
                            memory_space=pltpu.VMEM)

    def src_spec(a):
        blk = (1,) + a.shape[1:]
        return pl.BlockSpec(blk, lambda i: (i,) + (0,) * (a.ndim - 1),
                            memory_space=pltpu.VMEM)

    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    in_specs = (
        [scalar_spec for _ in scalars_2d]
        + [row_spec(q_pos), row_spec(q_mask)]
        + [row_spec(v) for v in q_vals]
        + [src_spec(s_pos_b), src_spec(s_mask_b)]
        + [src_spec(v) for v in s_vals_b]
    )
    out_specs = [
        pl.BlockSpec((block,) + leaf.shape[1:],
                     lambda i, nd=len(leaf.shape): (i,) + (0,) * (nd - 1),
                     memory_space=pltpu.VMEM)
        for leaf in out_leaves
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((ny_pad,) + leaf.shape[1:], leaf.dtype)
        for leaf in out_leaves
    ]

    def kernel(*refs):
        # source refs arrive with a leading length-1 block axis; squeeze it
        n_sc = len(scalars_2d)
        n_qv = len(q_vals)
        n_sv = len(s_vals_b)
        sc_refs = refs[:n_sc]
        refs = refs[n_sc:]
        q_refs = refs[: 2 + n_qv]
        s_refs = refs[2 + n_qv : 2 + n_qv + 2 + n_sv]
        o_refs = refs[2 + n_qv + 2 + n_sv :]

        class _Squeezed:
            def __init__(self, ref):
                self._ref = ref

            def __getitem__(self, idx):
                return self._ref[0]

        squeezed = [_Squeezed(r) for r in s_refs]
        _kernel(fn, grid, n_sc, n_qv, n_sv, out_treedef, *sc_refs, *q_refs,
                *squeezed, *o_refs)

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*scalars_2d, q_pos, q_mask, *q_vals, s_pos_b, s_mask_b, *s_vals_b)

    outs = [o[:ny] for o in outs]
    return jax.tree_util.tree_unflatten(out_treedef, outs)
