"""Standalone VPU / HBM speed-of-light probes (roofline denominators).

The VPU probe runs K fused multiply-adds per element over the pf kernels'
(BR, NXP) plane shape with C INDEPENDENT accumulator chains — a single chain
is fma-latency-bound and underreports throughput ~4-8x. Prints sustained
element-ops/s for C in {1, 2, 4, 8, 16} plus a select/compare mix (closer to
the pair kernels' op blend), and an HBM stream rate.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from yasph2d_tpu.utils import compile_cache

compile_cache.enable()

NBR, BR, NXP = 127, 8, 1664


def run(f, x, reps=30):
    # block_until_ready does not reliably block on the experimental axon
    # platform (see bench.py), and EAGER device ops can hang there — so f
    # returns (out, scalar) with the scalar computed inside the jit, and the
    # host float() of that scalar forces completion
    _ = float(f(x)[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x)
    _ = float(out[1])
    return (time.perf_counter() - t0) / reps


def fma_probe(chains, k_ops=4096, inner=8):
    """k_ops fmas per element per call: an in-kernel fori_loop of
    k_ops/(chains*inner) iterations, each `inner` unrolled fmas per chain
    (enough ILP exposure per iteration; compile stays seconds, and one call
    does ~100x more work than the tunnel's per-dispatch overhead)."""
    def kernel(x_ref, o_ref):
        a = x_ref[0, 0]

        def body(i, accs):
            for _ in range(inner):
                accs = tuple(acc * a + 1.0e-7 for acc in accs)
            return accs

        accs = jax.lax.fori_loop(
            0, k_ops // (chains * inner),
            body, tuple(a * (1.0 + 0.001 * c) for c in range(chains)),
        )
        acc = accs[0]
        for c in range(1, chains):
            acc = acc + accs[c]
        o_ref[0, 0] = acc

    x = jnp.full((NBR, 1, BR, NXP), 0.999, jnp.float32)
    spec = pl.BlockSpec((1, 1, BR, NXP), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    def f(x):
        out = pl.pallas_call(
            kernel, grid=(NBR,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
        return out, out[0, 0, 0, 0]

    dt = run(jax.jit(f), x)
    ops = NBR * BR * NXP * (k_ops // chains) * chains * 2
    return ops / dt


def mix_probe(chains=8, k_ops=4096, inner=8):
    """compare+select+add mix (the pair kernels' masked-accumulate blend)."""
    def kernel(x_ref, o_ref):
        a = x_ref[0, 0]

        def body(i, accs):
            for _ in range(inner):
                accs = tuple(
                    acc + jnp.where(a > 0.5, a, 0.0) for acc in accs
                )
            return accs

        accs = jax.lax.fori_loop(
            0, k_ops // (chains * inner),
            body, tuple(a * (1.0 + 0.001 * c) for c in range(chains)),
        )
        acc = accs[0]
        for c in range(1, chains):
            acc = acc + accs[c]
        o_ref[0, 0] = acc

    x = jnp.full((NBR, 1, BR, NXP), 0.999, jnp.float32)
    spec = pl.BlockSpec((1, 1, BR, NXP), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    def f(x):
        out = pl.pallas_call(
            kernel, grid=(NBR,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
        return out, out[0, 0, 0, 0]

    dt = run(jax.jit(f), x)
    # each iteration = compare + select + add = 3 vector ops per chain
    ops = NBR * BR * NXP * (k_ops // chains) * chains * 3
    return ops / dt


def hbm_probe(k=16):
    a = jnp.ones((64, 1024, 1664), jnp.float32)  # 436 MB
    def g(x):
        # fori_loop carries the full array: each iteration is a whole-array
        # read+write through HBM (XLA cannot fuse across the loop carry), so
        # one call moves 2*k*436 MB — tunnel dispatch amortizes out
        y = jax.lax.fori_loop(0, k, lambda i, y: y * 1.0000001, x)
        return y, y[0, 0, 0]
    dt = run(jax.jit(g), a, reps=20)
    return 2 * k * a.nbytes / dt


def main():
    for chains in (4, 8):
        rate = fma_probe(chains)
        print(f"fma x{chains:>2} chains: {rate / 1e12:6.2f} Tflop/s",
              flush=True)
    print(f"select-mix x8:   {mix_probe() / 1e12:6.2f} Tvecop/s", flush=True)
    print(f"HBM stream:      {hbm_probe() / 1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
