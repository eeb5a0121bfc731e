"""Probe: does stacking a pair pass's outputs into ONE leaf stop XLA from
materializing the (B, nx, P, 9P) per-pair tensor in HBM?

The round-3 padded-step trace at 1M shows pair-pass fusions emitting
f32[16,1612,7,63]-shaped outputs — the per-pair intermediates round-trip
through HBM (~2.9 GB per pass at 1M, ~7 ms at bandwidth), which matches the
measured ~8-11 ms/pass. If the whole pass fuses end-to-end, traffic drops to
inputs+outputs only.

Variants, each timed on one representative row-block tile at the 1M shape:
  dict4    : current ctx-pass shape — fn returns {w, vec, sq, count}
  stacked  : fn returns ONE (B, nx, P, 9P, 6) leaf, single masked reduce
  dict1    : single scalar leaf (density only) — the minimal fusion
Run on the real chip: python tools/probe_pair_fusion.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from yasph2d_tpu.ops.dense_grid import DenseGridConfig, pair_reduce
from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2
from yasph2d_tpu.units import REAL
from yasph2d_tpu.utils import compile_cache

compile_cache.enable()


def _sync(r):
    # block_until_ready returns early on the axon tunnel (measured 0.02 ms for a
    # multi-ms op); a device->host scalar read is the only reliable barrier
    return [float(np.asarray(leaf.ravel()[0])) for leaf in jax.tree_util.tree_leaves(r)]


def timeit(f, *args, n=30):
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # one 1M-scale stripe: 16 cell rows x 1612 cols x P7 (the real tile shape);
    # single-block pair_reduce (row_block >= ny) -> no lax.map wrapper
    ny, nx, p = 16, 1612, 7
    h = 0.004
    grid = DenseGridConfig(cell_size=h, origin=(0.0, 0.0), nx=nx, ny=ny,
                           occupancy=p, row_block=None)
    kern = WendlandQuinticC2(h)
    m = 0.001

    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, (ny, nx, p, 2)).astype(np.float32)
    # positions inside each cell
    iy, ix = np.indices((ny, nx))
    pos = (pos + np.stack([ix, iy], -1)[:, :, None, :]).astype(np.float32) * h
    mask = rng.uniform(size=(ny, nx, p)) < 0.6
    pos_j = jnp.asarray(pos)
    mask_j = jnp.asarray(mask)

    def terms_dict4(ri, r_sq, r):
        mg = kern.gradient(ri, r_sq, r) * m
        return {
            "w": kern.evaluate(r_sq, r),
            "vec": mg,
            "sq": jnp.sum(mg * mg, axis=-1),
            "count": jnp.ones_like(r_sq),
        }

    def terms_stacked(ri, r_sq, r):
        mg = kern.gradient(ri, r_sq, r) * m
        return jnp.stack(
            [
                kern.evaluate(r_sq, r),
                mg[..., 0],
                mg[..., 1],
                jnp.sum(mg * mg, axis=-1),
                jnp.ones_like(r_sq),
            ],
            axis=-1,
        )

    def terms_dict1(ri, r_sq, r):
        return kern.evaluate(r_sq, r)

    def terms_scalar_ax(ri, r_sq, r):
        # same scalar pass, but with an explicit trailing unit axis: the reduce
        # runs over axis 3 with a minor component axis instead of over the minor
        # axis itself (the shape the loop passes' div reduction would take)
        return kern.evaluate(r_sq, r)[..., None]

    def terms_vec(ri, r_sq, r):
        # k-correction shape: one (.., 9P, 2) vector leaf
        return kern.gradient(ri, r_sq, r) * m

    f4 = jax.jit(lambda q, qm: pair_reduce(terms_dict4, q, qm, q, qm, grid))
    fs = jax.jit(lambda q, qm: pair_reduce(terms_stacked, q, qm, q, qm, grid))
    f1 = jax.jit(lambda q, qm: pair_reduce(terms_dict1, q, qm, q, qm, grid))
    fsa = jax.jit(lambda q, qm: pair_reduce(terms_scalar_ax, q, qm, q, qm, grid))
    fv = jax.jit(lambda q, qm: pair_reduce(terms_vec, q, qm, q, qm, grid))

    print("dict4    :", timeit(f4, pos_j, mask_j), "ms/tile")
    print("stacked  :", timeit(fs, pos_j, mask_j), "ms/tile")
    print("dict1    :", timeit(f1, pos_j, mask_j), "ms/tile")
    print("scalar_ax:", timeit(fsa, pos_j, mask_j), "ms/tile")
    print("vec2     :", timeit(fv, pos_j, mask_j), "ms/tile")

    # equivalence of stacked vs dict4
    a = f4(pos_j, mask_j)
    b = fs(pos_j, mask_j)
    # rtol 1e-2: the stacked variant may reduce in a different order; f32 sums of
    # ~1e5-magnitude terms legitimately differ in the last few ulps
    np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b[..., 0]),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a["vec"]),
                               np.asarray(b[..., 1:3]), rtol=1e-2, atol=1e-4)
    print("stacked == dict4 (to f32)")


if __name__ == "__main__":
    main()
