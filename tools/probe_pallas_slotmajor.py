"""Slot-major Pallas pair-pass probe — the PERF.md round-3 recipe, executed.

The round-3 Pallas diagnosis: kernels whose operands carry (P, Ps) or (P, 2)
minor dims get padded by Mosaic to (8, 128) tiles — an 18-64x VMEM
amplification that OOMs scoped VMEM or blows the compile. The fix recorded in
PERF.md is a SLOT-MAJOR formulation: spatial dims (rows, cols) live on
(sublane, lane); slots and vector components become separate leading-dim
planes. Conveniently XLA already lays the padded (ny, nx, P, ...) arrays out
as {1,0,3,2} — physically (..., P, ny, nx) planes — so the host-side transpose
is layout-compatible.

This probe implements the ctx pass (the most expensive pair pass: W sum,
m*gradW vector sum, |m*gradW|^2 sum, neighbor count — dfsph_dense._ctx terms)
as one Pallas kernel over row bands, pre-blocked host-side like
ops/pallas_pair.py:

  inputs  (per band): query planes  q[3, P, BR, NX]     (x, y, mask)
                      source planes s[3, P, BR+2, NX+2] (with halo)
  outputs (per band): out[5, P, BR, NX]  (w, gx, gy, sq, count)

Run modes:
  python tools/probe_pallas_slotmajor.py check   # interpret-mode correctness (CPU ok)
  python tools/probe_pallas_slotmajor.py tpu     # compile + time at the 1M band shape
Reference: pair math per neighborhood_search.rs:312-397 / fluidparticleworld.rs:197-231.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

MIN_DISTANCE_SQ = 1.0e-10


def _wendland_terms(dx, dy, r_sq, valid, h, m):
    """W, m*gradW, |m*gradW|^2 for WendlandQuinticC2 (2D normalizers).

    Same math as ops/smoothing_kernels.WendlandQuinticC2 (reference
    wendland_quintic_c2.rs:26-46), restated on planes to keep the kernel
    self-contained."""
    inv_h = 1.0 / h
    r = jnp.sqrt(r_sq)
    q = r * inv_h
    one_m_q = jnp.maximum(1.0 - q, 0.0)
    norm_w = 28.0 / (np.pi * h * h)
    norm_g = 140.0 / (np.pi * h ** 4)
    w = norm_w * (one_m_q ** 4) * (q + 0.25)
    c = norm_g * (one_m_q ** 3)  # gradient = +c * ri_to_rj (kernel.rs convention)
    gx = m * c * dx
    gy = m * c * dy
    zero = jnp.zeros_like(w)
    w = jnp.where(valid, w, zero)
    gx = jnp.where(valid, gx, zero)
    gy = jnp.where(valid, gy, zero)
    return w, gx, gy


def ctx_pass_kernel(q_ref, s_ref, out_ref, *, p, ps, br, nx, h, m):
    """One row band: accumulate the four ctx reductions for every query slot.

    Block refs carry a leading size-1 band axis (the grid dim); index it away."""
    radius_sq = h * h

    # Loop order: query slot OUTERMOST so the live set is five small (BR, NX)
    # accumulator planes per slot (written to the out ref once), not a full
    # (5, P, BR, NX) functional accumulator — the latter made Mosaic keep all 63
    # unrolled iterations' temporaries on the VMEM stack (48.5 MB vs the 16 MB
    # scoped limit).
    for qp in range(p):
        qxp = q_ref[0, 0, qp]
        qyp = q_ref[0, 1, qp]
        qmp = q_ref[0, 2, qp] > 0.0
        aw = jnp.zeros((br, nx), dtype=jnp.float32)
        agx = jnp.zeros((br, nx), dtype=jnp.float32)
        agy = jnp.zeros((br, nx), dtype=jnp.float32)
        asq = jnp.zeros((br, nx), dtype=jnp.float32)
        acnt = jnp.zeros((br, nx), dtype=jnp.float32)
        for dyv in range(3):
            for dxv in range(3):
                for sp in range(ps):
                    cx = s_ref[0, 0, sp, dyv : dyv + br, dxv : dxv + nx]
                    cy = s_ref[0, 1, sp, dyv : dyv + br, dxv : dxv + nx]
                    cm = s_ref[0, 2, sp, dyv : dyv + br, dxv : dxv + nx]
                    dx = cx - qxp
                    dy = cy - qyp
                    r_sq = dx * dx + dy * dy
                    valid = (
                        qmp
                        & (cm > 0.0)
                        & (r_sq <= radius_sq)
                        & (r_sq > MIN_DISTANCE_SQ)
                    )
                    w, gx, gy = _wendland_terms(dx, dy, r_sq, valid, h, m)
                    aw = aw + w
                    agx = agx + gx
                    agy = agy + gy
                    asq = asq + (gx * gx + gy * gy)
                    acnt = acnt + jnp.where(valid, 1.0, 0.0)
        out_ref[0, 0, qp] = aw
        out_ref[0, 1, qp] = agx
        out_ref[0, 2, qp] = agy
        out_ref[0, 3, qp] = asq
        out_ref[0, 4, qp] = acnt


def ctx_pass_slotmajor(q_blocks, s_blocks, *, h, m, interpret=False):
    """q_blocks: (nbr, 3, P, BR, NX); s_blocks: (nbr, 3, Ps, BR+2, NX+2)."""
    nbr, _, p, br, nx = q_blocks.shape
    ps = s_blocks.shape[2]
    nxs = s_blocks.shape[-1]
    kernel = functools.partial(
        ctx_pass_kernel, p=p, ps=ps, br=br, nx=nx, h=h, m=m
    )
    return pl.pallas_call(
        kernel,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, p, br, nx), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, ps, br + 2, nxs), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, p, br, nx), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nbr, 5, p, br, nx), jnp.float32),
        interpret=interpret,
    )(q_blocks, s_blocks)


def make_blocks(pos, mask, br):
    """(ny, nx, P, 2) + (ny, nx, P) -> pre-blocked slot-major query and haloed
    source bands. NX is padded to a lane multiple of 128."""
    ny, nx, p = mask.shape
    nbr = -(-ny // br)
    nxp = -(-(nx) // 128) * 128
    ny_pad = nbr * br

    planes = jnp.stack(
        [pos[..., 0], pos[..., 1], mask.astype(jnp.float32)], axis=0
    )  # (3, ny, nx, P)
    planes = jnp.transpose(planes, (0, 3, 1, 2))  # (3, P, ny, nx)
    pad_rows = ny_pad - ny
    planes_q = jnp.pad(planes, ((0, 0), (0, 0), (0, pad_rows), (0, nxp - nx)))
    q_blocks = jnp.stack(
        [planes_q[:, :, i * br : (i + 1) * br] for i in range(nbr)], axis=0
    )  # (nbr, 3, P, BR, NXP)

    # haloed source: one zero row/col ring, then overlapping (BR+2)-row windows.
    # Columns pad to NXP + 128 (one extra lane tile): Mosaic requires the block's
    # last dim to be 128-divisible or equal to the array dim.
    nxs = nxp + 128
    planes_s = jnp.pad(
        planes, ((0, 0), (0, 0), (1, 1 + pad_rows), (1, nxs - nx - 1))
    )  # (3, P, ny_pad+2, NXS)
    s_blocks = jnp.stack(
        [planes_s[:, :, i * br : i * br + br + 2] for i in range(nbr)],
        axis=0,
    )  # (nbr, 3, P, BR+2, NXS)
    return q_blocks, s_blocks, nxp


def reference_ctx(pos, mask, h, m):
    """XLA pair_reduce ctx pass (the production path) for comparison."""
    from yasph2d_tpu.ops.dense_grid import DenseGridConfig, pair_reduce
    from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2

    ny, nx, p = mask.shape
    grid = DenseGridConfig(
        cell_size=h, origin=(0.0, 0.0), nx=nx, ny=ny, occupancy=p, row_block=None
    )
    kern = WendlandQuinticC2(h)

    def terms(ri, r_sq, r):
        mg = kern.gradient(ri, r_sq, r) * m
        return {
            "w": kern.evaluate(r_sq, r),
            "vec": mg,
            "sq": jnp.sum(mg * mg, axis=-1),
            "count": jnp.ones_like(r_sq),
        }

    return pair_reduce(terms, pos, mask, pos, mask, grid)


def run_check():
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    ny, nx, p = 12, 40, 5
    h = 0.1
    iy, ix = np.indices((ny, nx))
    pos = ((rng.uniform(0, 1, (ny, nx, p, 2)) + np.stack([ix, iy], -1)[:, :, None, :])
           * h).astype(np.float32)
    mask = rng.uniform(size=(ny, nx, p)) < 0.6
    pos_j = jnp.asarray(pos)
    mask_j = jnp.asarray(mask)
    m = 0.07

    q_blocks, s_blocks, nxp = make_blocks(pos_j, mask_j, br=4)
    out = ctx_pass_slotmajor(q_blocks, s_blocks, h=h, m=m, interpret=True)
    # (nbr, 5, P, BR, NXP) -> (ny, nx, P, 5)
    nbr = out.shape[0]
    out = jnp.concatenate([out[i] for i in range(nbr)], axis=2)  # (5, P, ny_pad, NXP)
    out = jnp.transpose(out, (2, 3, 1, 0))[:ny, :nx]

    ref = reference_ctx(pos_j, mask_j, h, m)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(ref["w"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[..., 1:3]), np.asarray(ref["vec"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(ref["sq"]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[..., 4]), np.asarray(ref["count"]),
                               rtol=1e-5, atol=1e-5)
    print("slot-major pallas ctx == XLA pair_reduce OK")


def run_tpu():
    from yasph2d_tpu.utils import compile_cache

    compile_cache.enable()
    rng = np.random.default_rng(0)
    # one 1M-scale stripe: the real band shape (BR 8, nx 1612 -> NX 1664, P 7);
    # nbr bands to amortize and to mimic the real grid row count
    ny, nx, p = 64, 1612, 7
    br = 8
    h = 0.004
    m = 0.001
    iy, ix = np.indices((ny, nx))
    pos = ((rng.uniform(0, 1, (ny, nx, p, 2)) + np.stack([ix, iy], -1)[:, :, None, :])
           * h).astype(np.float32)
    mask = rng.uniform(size=(ny, nx, p)) < 0.6
    pos_j = jnp.asarray(pos)
    mask_j = jnp.asarray(mask)

    q_blocks, s_blocks, nxp = make_blocks(pos_j, mask_j, br=br)
    print(f"q_blocks {q_blocks.shape}, s_blocks {s_blocks.shape}")

    f = jax.jit(functools.partial(ctx_pass_slotmajor, h=h, m=m))
    t0 = time.perf_counter()
    out = f(q_blocks, s_blocks)
    first = float(np.asarray(out[0, 0, 0, 0, 0]))
    t_compile = time.perf_counter() - t0
    print(f"compile + first run: {t_compile:.1f}s (probe value {first})")

    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(q_blocks, s_blocks)
    float(np.asarray(out[0, 0, 0, 0, 0]))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"pallas slot-major ctx pass: {dt:.3f} ms for {ny} rows "
          f"({dt / (ny // br):.3f} ms/band)")

    g = jax.jit(lambda q, qm: reference_ctx(q, qm, h, m))
    r = g(pos_j, mask_j)
    float(np.asarray(r["w"][0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(pos_j, mask_j)
    float(np.asarray(r["w"][0, 0, 0]))
    dt_x = (time.perf_counter() - t0) / n * 1e3
    print(f"XLA pair_reduce ctx pass:   {dt_x:.3f} ms for {ny} rows")

    # correctness on-TPU
    out_c = jnp.concatenate([out[i] for i in range(out.shape[0])], axis=2)
    out_c = jnp.transpose(out_c, (2, 3, 1, 0))[:ny, :nx]
    np.testing.assert_allclose(np.asarray(out_c[..., 0]), np.asarray(r["w"]),
                               rtol=1e-3, atol=1e-4)
    print("on-TPU values match XLA")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    {"check": run_check, "tpu": run_tpu}[mode]()
