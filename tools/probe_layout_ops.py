"""Micro-probes for the slot-layout plumbing ops on the real device.

The round-2 stage profile (tools/profile_stages.py) showed build_slot_grid
(searchsorted scan_unrolled) and pad_to_slots (a C*P-index gather) dominating the
step's fixed cost. This probes the alternatives in isolation.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from yasph2d_tpu.utils import compile_cache

compile_cache.enable()

N = 100_000
C = 515 * 325
P = 7

rng = np.random.default_rng(0)
keys_np = np.sort(rng.integers(0, C // 3, size=N))  # clustered like a fluid
keys = jnp.asarray(keys_np, dtype=jnp.int32)
vals = jnp.asarray(rng.standard_normal((N, 2)), dtype=jnp.float32)


def timeit(name, fn, *args, reps=50):
    fn = jax.jit(fn)
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    print(f"{name:55s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


iota = jnp.arange(C + 1, dtype=jnp.int32)

timeit("searchsorted scan_unrolled (current)",
       lambda k: jnp.searchsorted(k, iota, method="scan_unrolled"), keys)
timeit("searchsorted sort",
       lambda k: jnp.searchsorted(k, iota, method="sort"), keys)


def starts_scatter(k):
    # counts via scatter-add, starts via cumsum
    counts = jnp.zeros((C,), jnp.int32).at[k].add(1, mode="drop")
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])


s_scan = timeit("starts via scatter-add counts + cumsum", starts_scatter, keys)
ref = jnp.searchsorted(keys, iota, method="scan_unrolled")
print("  scatter starts == searchsorted:",
      bool(jnp.all(s_scan == ref)))

starts = ref[:-1]
lane = jnp.arange(P, dtype=jnp.int32)
slot_idx = jnp.clip(starts[:, None] + lane[None, :], 0, N - 1)
rank = jnp.arange(N, dtype=jnp.int32) - starts[jnp.minimum(keys, C - 1)]
inverse = jnp.clip(keys * P + jnp.minimum(rank, P - 1), 0, C * P - 1)
in_grid = rank < P

timeit("pad via gather slot_idx (current)",
       lambda v: v[slot_idx].reshape(C * P, 2), vals)


def pad_scatter(v):
    z = jnp.zeros((C * P, 2), v.dtype)
    src = jnp.where(in_grid[:, None], v, 0.0)
    return z.at[inverse].set(src, mode="drop", unique_indices=True)


g = timeit("pad via scatter at inverse", pad_scatter, vals)
gg = vals[slot_idx].reshape(C * P, 2)
mask = (lane[None, :] < jnp.minimum(jnp.diff(ref)[:, None], P)).reshape(-1)
print("  scatter pad == gather pad (masked):",
      bool(jnp.all(jnp.where(mask[:, None], g == gg, True))))

timeit("unpad via gather at inverse (current slots_to_sorted)",
       lambda p: p[inverse], g)

# P separate size-C gathers instead of one C*P gather
def pad_per_lane(v):
    cols = [v[jnp.clip(starts + i, 0, N - 1)] for i in range(P)]
    return jnp.stack(cols, axis=1).reshape(C * P, 2)


timeit("pad via P per-lane gathers", pad_per_lane, vals)

# full sort probes
timeit("lax.sort keys+iota (100k)",
       lambda k: jax.lax.sort((k, jnp.arange(N, dtype=jnp.int32)), num_keys=1),
       keys)

# scalar pad variants: 1D gather vs trailing-unit-dim 2D gather
svals = vals[:, 0]
timeit("scalar pad via 1D gather (current)",
       lambda v: v[slot_idx].reshape(C * P), svals)
timeit("scalar pad via (N,1) 2D gather",
       lambda v: v[:, None][slot_idx].reshape(C * P), svals)
timeit("scalar unpad 1D (current)", lambda p: p[inverse], g[:, 0])
timeit("scalar unpad via (C*P,1)", lambda p: p[:, None][inverse][:, 0], g[:, 0])
x = timeit("stacked pad (N,5) one gather",
       lambda v: v[slot_idx].reshape(C * P, 5),
       jnp.concatenate([vals, vals, svals[:, None]], axis=1))
