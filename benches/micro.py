"""Micro-benchmarks mirroring the reference's criterion groups
(reference: benches/bench_main.rs:4-9 — smoothing_kernel, morton, neighborhood_search,
update_densities).

Each benchmark prints one JSON line; run `python benches/micro.py` (add `--cpu` to
force the CPU backend). Workloads match the reference definitions:
- kernels: evaluate+gradient for Poly6/Spiky/CubicSpline/WendlandQuinticC2
  (smoothing_kernel.rs:18-57) on a 1M-element batch (the TPU-native unit of work is a
  vector, not a scalar call).
- morton: encode/decode/find_bigmin (morton.rs:5-25) on 1M-element batches.
- neighborhood: warm update on 20k uniform-random particles, density 10/m^2, radius 1
  (neighborhood_search.rs:9-29).
- update_densities: ~8.1k-particle world + 20-thick boundary line, x3 kernels
  (update_densities.rs:71-130).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root


def _bench(label, fn, *args, repeats=20, warmup=2, unit="ms"):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _sync(out)
    elapsed = (time.perf_counter() - t0) / repeats
    print(json.dumps({"bench": label, "value": elapsed * 1e3, "unit": unit}))
    return elapsed


def _sync(out):
    """Force completion: host-transfer one scalar (block_until_ready alone does not
    reliably block on the experimental remote TPU platform)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(jax.device_get(jax.tree_util.tree_map(lambda a: a.ravel()[0], leaves[0])))


def bench_kernels():
    import jax
    import jax.numpy as jnp

    from yasph2d_tpu.ops.smoothing_kernels import ALL_KERNELS

    h = 0.1
    n = 1_000_000
    rng = np.random.default_rng(0)
    ri_to_rj = jnp.asarray(rng.random((n, 2), dtype=np.float32) * h * 1.2)
    r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
    r = jnp.sqrt(r_sq)

    for cls in ALL_KERNELS:
        k = cls(h)
        f_eval = jax.jit(lambda rs, rr, k=k: k.evaluate(rs, rr))
        f_grad = jax.jit(lambda d, rs, rr, k=k: k.gradient(d, rs, rr))
        _bench(f"kernel.{cls.__name__}.evaluate(1M)", f_eval, r_sq, r)
        _bench(f"kernel.{cls.__name__}.gradient(1M)", f_grad, ri_to_rj, r_sq, r)


def bench_morton():
    import jax
    import jax.numpy as jnp

    from yasph2d_tpu.ops import morton

    n = 1_000_000
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 1 << 16, n, dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 1 << 16, n, dtype=np.uint32))
    codes = morton.encode(x, y)

    _bench("morton.encode(1M)", jax.jit(morton.encode), x, y)
    _bench("morton.decode_x(1M)", jax.jit(morton.decode_x), codes)

    # find_bigmin is host-side scalar (like the reference's ns-scale criterion bench,
    # benches/benchmarks/morton.rs:5-14); time it per call in pure python.
    rect_min = morton.encode(np.uint32(2), np.uint32(2))
    rect_max = morton.encode(np.uint32(4), np.uint32(5))
    probe = int(morton.encode(np.uint32(3), np.uint32(6)))
    t0 = time.perf_counter()
    reps = 2000
    for _ in range(reps):
        morton.find_bigmin(probe, rect_min, rect_max)
    per_call = (time.perf_counter() - t0) / reps
    print(json.dumps({"bench": "morton.find_bigmin(host scalar)", "value": per_call * 1e6, "unit": "us"}))


def bench_neighborhood():
    import jax
    import jax.numpy as jnp

    from yasph2d_tpu.ops.neighborhood import (
        GridConfig,
        build_cell_grid,
        build_neighborhood,
        sort_by_cell_keys,
    )

    # reference workload: 20k particles uniform in [0, sqrt(20000/10)]^2, radius 1
    n = 20_000
    side = float(np.sqrt(n / 10.0))
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.random((n, 2), dtype=np.float32) * side)
    grid = GridConfig(cell_size=1.0)
    boundary = build_cell_grid(jnp.zeros((0, 2), jnp.float32), grid)

    @jax.jit
    def update(p):
        keys, perm = sort_by_cell_keys(p, grid)
        sp = p[perm]
        return build_neighborhood(sp, keys, boundary, grid)

    _bench("neighborhood.update_dynamic(20k)", update, pos)


def bench_update_densities():
    import jax
    import jax.numpy as jnp

    from yasph2d_tpu.ops.smoothing_kernels import CubicSpline, Poly6, WendlandQuinticC2
    from yasph2d_tpu.world import FluidParticleWorld, update_densities, update_neighborhood

    # reference workload (update_densities.rs:71-130): ~8.1k fluid + boundary line
    world = FluidParticleWorld(2.0, 1000.0, 100.0)
    world.add_fluid_rect((0.0, 0.0, 3.0, 3.0), 0.05)
    world.add_boundary_thick_line((-1.0, -0.05), (4.0, -0.05), 20)
    state = world.initial_state()
    boundary = world.boundary_grid()
    _, pos, nbr = jax.jit(
        lambda s, b: update_neighborhood(s, s.positions, b, world.grid)
    )(state, boundary)

    m = world.properties.particle_mass
    h = world.properties.smoothing_length
    for cls in (CubicSpline, Poly6, WendlandQuinticC2):
        k = cls(h)
        f = jax.jit(
            lambda p, nb, bp, k=k: update_densities(p, nb, bp, k, m, 100.0)
        )
        _bench(f"update_densities.{cls.__name__}(~8k)", f, pos, nbr, boundary.positions)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    parser.add_argument(
        "--only", default=None, help="comma-separated subset: kernels,morton,neighborhood,densities"
    )
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    groups = {
        "kernels": bench_kernels,
        "morton": bench_morton,
        "neighborhood": bench_neighborhood,
        "densities": bench_update_densities,
    }
    selected = args.only.split(",") if args.only else list(groups)
    for name in selected:
        groups[name]()


if __name__ == "__main__":
    main()
