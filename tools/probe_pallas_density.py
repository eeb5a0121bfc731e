"""One honest Pallas attempt on the real chip (round-3 verdict item 7).

Round 2's measurement: a single pallas_pair_reduce kernel at the 100k bench
shape exceeded a 40-minute remote Mosaic compile timeout. This probe retries
with the MINIMAL kernel (density pass only — one scalar output) at escalating
shapes, with the persistent compilation cache enabled so any successful compile
is reusable. Run each stage under an external `timeout`; record results in
PERF.md either way.

Usage: python tools/probe_pallas_density.py [stage]
  stage 0: tiny   (32 x 64 x P4,  block_rows 8)
  stage 1: 10k    (168 x 108 x P7, block_rows 8)
  stage 2: 100k   (515 x 325 x P7, block_rows 8)
Prints compile seconds + a timing vs the XLA pair_reduce path.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from yasph2d_tpu.ops.dense_grid import DenseGridConfig, pair_reduce
from yasph2d_tpu.ops.pallas_pair import pallas_pair_reduce
from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2
from yasph2d_tpu.utils import compile_cache

compile_cache.enable()

SHAPES = {
    0: (32, 64, 4),
    1: (168, 108, 7),
    2: (515, 325, 7),
}


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    block_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nx, ny, p = SHAPES[stage]
    h = 0.05
    grid = DenseGridConfig(cell_size=h, origin=(0.0, 0.0), nx=nx, ny=ny,
                           occupancy=p, row_block=16)
    kern = WendlandQuinticC2(h)

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (ny, nx, p, 2)).astype(np.float32)
    iy, ix = np.indices((ny, nx))
    pos = jnp.asarray(
        (base + np.stack([ix, iy], -1)[:, :, None, :]).astype(np.float32) * h
    )
    mask = jnp.asarray(rng.uniform(size=(ny, nx, p)) < 0.6)

    density = lambda ri, r_sq, r: kern.evaluate(r_sq, r)

    f_pallas = jax.jit(
        lambda q, qm: pallas_pair_reduce(density, q, qm, q, qm, grid,
                                         block_rows=block_rows)
    )
    t0 = time.perf_counter()
    out = f_pallas(pos, mask)
    _ = float(out.ravel()[0])  # force real completion through the tunnel
    compile_s = time.perf_counter() - t0
    print(f"stage {stage} ({ny}x{nx}x{p}) br{block_rows}: Mosaic compile+run {compile_s:.1f}s",
          flush=True)

    f_xla = jax.jit(lambda q, qm: pair_reduce(density, q, qm, q, qm, grid))
    ref = f_xla(pos, mask)
    _ = float(ref.ravel()[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    print("matches XLA path", flush=True)

    def timed(f, n=50):
        _ = float(f(pos, mask).ravel()[0])
        t0 = time.perf_counter()
        for _i in range(n):
            r = f(pos, mask)
        _ = float(r.ravel()[0])
        return (time.perf_counter() - t0) / n * 1e3

    print(f"pallas: {timed(f_pallas):.3f} ms  xla: {timed(f_xla):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
