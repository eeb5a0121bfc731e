"""Masked fixed-degree pair-interaction helpers.

Every solver hot loop in the reference is a gather formulation: particle i reads its
neighbors j and writes only slot i (SURVEY.md section 2, "Scatter-free design"). With
fixed-degree `(N, K)` neighbor tables those loops become exactly three steps on TPU:

    1. gather neighbor attributes          -> (N, K, ...)
    2. elementwise per-pair math (VPU)     -> (N, K, ...)
    3. masked sum over K                   -> (N, ...)

These helpers keep the masking discipline in one place: a masked slot's gathered data
is arbitrary (index 0), so every per-pair quantity must be multiplied by the mask
before reduction.
"""

import jax
import jax.numpy as jnp

from ..units import REAL


def gather(values: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-neighbor attributes: values (M, ...) x idx (N, K) -> (N, K, ...).

    An empty source space (M == 0, e.g. a scene without boundary particles) yields
    zeros: the matching neighbor table is all-masked, so the values never matter.
    """
    if values.shape[0] == 0:
        return jnp.zeros(idx.shape + values.shape[1:], dtype=values.dtype)
    return values[idx]


def pair_geometry(positions: jax.Array, neighbor_positions: jax.Array):
    """Relative geometry of each pair.

    positions: (N, 2); neighbor_positions: (N, K, 2).
    Returns (ri_to_rj, r_sq, r) with ri_to_rj = rj - ri, shapes (N,K,2), (N,K), (N,K).
    """
    ri_to_rj = neighbor_positions - positions[:, None, :]
    r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
    return ri_to_rj, r_sq, jnp.sqrt(r_sq)


def masked_sum(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Sum per-pair values (N, K, ...) over K, zeroing masked slots."""
    if values.ndim > mask.ndim:
        mask = mask[..., None]
    return jnp.sum(jnp.where(mask, values, jnp.zeros((), dtype=REAL)), axis=1)
