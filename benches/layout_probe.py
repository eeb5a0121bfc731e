"""Probe: pair-pass layout comparison on the current device.

Times one density-like pair pass (windows + geometry + kernel + masked reduce) in two
layouts:
  A. current: intermediates (ny, nx, P, 9P) — lane axis is the 9P candidate axis (72)
  B. transposed: intermediates (P, 9P, ny, nx) — lane axis is nx (hundreds)
If B wins decisively, pair_reduce gets the transposed internal layout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from yasph2d_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2  # noqa: E402

NY, NX, P = 328, 512, 8
H = 1.0


def windows_a(padded):
    ny, nx = padded.shape[:2]
    z = jnp.zeros_like(padded[:1])
    rows = jnp.concatenate([z, padded, z], axis=0)
    zc = jnp.zeros_like(rows[:, :1])
    full = jnp.concatenate([zc, rows, zc], axis=1)
    views = [full[dy:dy + ny, dx:dx + nx] for dy in range(3) for dx in range(3)]
    return jnp.concatenate(views, axis=2)  # (ny, nx, 9P, ...)


def pass_a(pos, mask):
    kernel = WendlandQuinticC2(H)
    cand_pos = windows_a(pos)
    cand_mask = windows_a(mask)
    ri_to_rj = cand_pos[:, :, None, :, :] - pos[:, :, :, None, :]
    r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
    valid = (
        mask[:, :, :, None] & cand_mask[:, :, None, :]
        & (r_sq <= H * H) & (r_sq > 1e-10)
    )
    w = kernel.evaluate(r_sq, jnp.sqrt(r_sq))
    return jnp.sum(jnp.where(valid, w, 0.0), axis=3)  # (ny, nx, P)


def windows_b(padded):
    # padded: (K, ny, nx, ...) with spatial axes 1, 2
    ny, nx = padded.shape[1], padded.shape[2]
    z = jnp.zeros_like(padded[:, :1])
    rows = jnp.concatenate([z, padded, z], axis=1)
    zc = jnp.zeros_like(rows[:, :, :1])
    full = jnp.concatenate([zc, rows, zc], axis=2)
    views = [full[:, dy:dy + ny, dx:dx + nx] for dy in range(3) for dx in range(3)]
    return jnp.concatenate(views, axis=0)  # (9K, ny, nx, ...)


def pass_b(pos_t, mask_t):
    # pos_t: (P, ny, nx, 2); mask_t: (P, ny, nx)
    kernel = WendlandQuinticC2(H)
    cand_pos = windows_b(pos_t)  # (9P, ny, nx, 2)
    cand_mask = windows_b(mask_t)  # (9P, ny, nx)
    ri_to_rj = cand_pos[None] - pos_t[:, None]  # (P, 9P, ny, nx, 2)
    r_sq = jnp.sum(ri_to_rj * ri_to_rj, axis=-1)
    valid = (
        mask_t[:, None] & cand_mask[None]
        & (r_sq <= H * H) & (r_sq > 1e-10)
    )
    w = kernel.evaluate(r_sq, jnp.sqrt(r_sq))
    return jnp.sum(jnp.where(valid, w, 0.0), axis=1)  # (P, ny, nx)


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def bench(label, fn, *args, repeats=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = f(*args)
    _sync(out)
    per = (time.perf_counter() - t0) / repeats
    print(json.dumps({"layout": label, "ms": per * 1e3, "compile_s": compile_s}),
          flush=True)


def main():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(
        rng.random((NY, NX, P, 2), dtype=np.float32)
        * np.asarray([NX * H, NY * H], dtype=np.float32)
    )
    mask = jnp.asarray(rng.random((NY, NX, P)) < 0.4)

    bench("A (ny,nx,P,9P)", pass_a, pos, mask)
    pos_t = jnp.transpose(pos, (2, 0, 1, 3))
    mask_t = jnp.transpose(mask, (2, 0, 1))
    bench("B (P,9P,ny,nx)", pass_b, pos_t, mask_t)

    # numerical agreement
    a = np.asarray(pass_a(pos, mask))
    b = np.transpose(np.asarray(pass_b(pos_t, mask_t)), (1, 2, 0))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    print(json.dumps({"agreement": "ok"}))


if __name__ == "__main__":
    main()
