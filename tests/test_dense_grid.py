"""Dense padded cell grid: slot layout invariants + pair reductions vs brute force."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from yasph2d_tpu.ops.dense_grid import (
    DenseGridConfig,
    build_slot_grid,
    cell_keys,
    pad_to_slots,
    pair_reduce,
    slots_to_sorted,
    MIN_DISTANCE_SQ,
)
from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2


def make_sorted(n, grid, seed=0, spread=None):
    rng = np.random.default_rng(seed)
    extent = np.asarray([grid.nx, grid.ny]) * grid.cell_size
    spread = spread if spread is not None else extent
    pos = np.asarray(grid.origin) + rng.random((n, 2)) * spread
    pos = jnp.asarray(pos.astype(np.float32))
    keys = cell_keys(pos, grid)
    order = jnp.argsort(keys)
    return pos[order], keys[order]


def test_slot_grid_roundtrip_and_masks():
    grid = DenseGridConfig(cell_size=0.25, origin=(0.0, 0.0), nx=8, ny=6, occupancy=16)
    pos, keys = make_sorted(300, grid, seed=1)
    slots = build_slot_grid(keys, grid)

    assert int(slots.num_dropped) == 0
    assert int(slots.slot_mask.sum()) == 300
    assert bool(slots.in_grid.all())

    # padded -> sorted round trip recovers every particle
    padded = pad_to_slots(pos, slots, grid)
    assert padded.shape == (6, 8, 16, 2)
    back = slots_to_sorted(padded, slots, grid)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pos))

    # each live slot holds a particle whose key matches its cell
    mask = np.asarray(slots.slot_mask)
    idx = np.asarray(slots.slot_idx)
    k = np.asarray(keys)
    for c in range(grid.num_cells):
        for p in range(grid.occupancy):
            if mask[c, p]:
                assert k[idx[c, p]] == c


def test_slot_overflow_counted():
    grid = DenseGridConfig(cell_size=1.0, origin=(0.0, 0.0), nx=2, ny=2, occupancy=4)
    # 7 particles in one cell -> 3 dropped
    pos = jnp.asarray(np.full((7, 2), 0.5, dtype=np.float32) + np.arange(7)[:, None] * 1e-3)
    keys = cell_keys(pos, grid)
    slots = build_slot_grid(keys, grid)
    assert int(slots.num_dropped) == 3
    assert int(slots.slot_mask.sum()) == 4
    assert int(slots.in_grid.sum()) == 4


def brute_force_density(pos, h, mass, kernel):
    pos = np.asarray(pos, dtype=np.float32)
    n = pos.shape[0]
    diff = pos[None, :, :] - pos[:, None, :]
    r_sq = (diff * diff).sum(-1)
    r = np.sqrt(r_sq)
    w = np.array(kernel.evaluate(jnp.asarray(r_sq), jnp.asarray(r)))
    w[(r_sq <= MIN_DISTANCE_SQ)] = 0.0  # self/degenerate excluded from pair sum
    self_w = float(kernel.evaluate(jnp.zeros(()), jnp.zeros(())))
    return mass * (w.sum(1) + self_w)


def test_dense_density_matches_brute_force():
    h = 0.3
    grid = DenseGridConfig(cell_size=h, origin=(-0.1, -0.2), nx=7, ny=5, occupancy=24)
    pos, keys = make_sorted(400, grid, seed=2)
    slots = build_slot_grid(keys, grid)
    kernel = WendlandQuinticC2(h)
    mass = 0.37

    padded = pad_to_slots(pos, slots, grid)
    mask = slots.slot_mask.reshape(grid.ny, grid.nx, grid.occupancy)

    def w_fn(ri_to_rj, r_sq, r):
        return kernel.evaluate(r_sq, r)

    dens_padded = pair_reduce(w_fn, padded, mask, padded, mask, grid)
    dens = np.asarray(slots_to_sorted(dens_padded, slots, grid)) * mass
    dens = dens + mass * float(kernel.evaluate(jnp.zeros(()), jnp.zeros(())))

    expected = brute_force_density(pos, h, mass, kernel)
    np.testing.assert_allclose(dens, expected, rtol=2e-5, atol=2e-4)


def test_dense_pair_reduce_with_values_matches_brute_force():
    """Vector reduction with candidate values: sum_j (v_i - v_j) . grad W_ij."""
    h = 0.25
    grid = DenseGridConfig(cell_size=h, origin=(0.0, 0.0), nx=6, ny=6, occupancy=24)
    pos, keys = make_sorted(300, grid, seed=3)
    slots = build_slot_grid(keys, grid)
    kernel = WendlandQuinticC2(h)

    rng = np.random.default_rng(4)
    vel = jnp.asarray(rng.standard_normal((300, 2)).astype(np.float32))

    padded_pos = pad_to_slots(pos, slots, grid)
    padded_vel = pad_to_slots(vel, slots, grid)
    mask = slots.slot_mask.reshape(grid.ny, grid.nx, grid.occupancy)

    def div_fn(ri_to_rj, r_sq, r, v_i, v_j):
        grad = kernel.gradient(ri_to_rj, r_sq, r)
        return jnp.sum((v_i - v_j) * grad, axis=-1)

    out_padded = pair_reduce(
        div_fn, padded_pos, mask, padded_pos, mask, grid,
        source_values=(padded_vel,), query_values=(padded_vel,),
    )
    out = np.asarray(slots_to_sorted(out_padded, slots, grid))

    # brute force
    p = np.asarray(pos)
    v = np.asarray(vel)
    diff = p[None, :, :] - p[:, None, :]
    r_sq = (diff * diff).sum(-1)
    r = np.sqrt(r_sq)
    grad = np.asarray(kernel.gradient(jnp.asarray(diff), jnp.asarray(r_sq), jnp.asarray(r)))
    live = (r_sq > MIN_DISTANCE_SQ) & (r_sq <= h * h)
    dv = v[:, None, :] - v[None, :, :]
    expected = np.where(live, (dv * grad).sum(-1), 0.0).sum(1)
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_pair_view_loop_matches_concat_path():
    """pair_view_loop=True (nine per-view accumulated reduces) must agree with
    the default concatenated-candidate-axis path on every leaf kind (scalar,
    vector, query/source values, scalar args) to f32 reduction-order tolerance,
    in both f32 and the bf16 cell-relative mode."""
    import dataclasses

    h = 0.25
    g0 = DenseGridConfig(cell_size=h, origin=(0.0, 0.0), nx=9, ny=8, occupancy=6,
                         row_block=4)
    gv = dataclasses.replace(g0, pair_view_loop=True)
    kernel = WendlandQuinticC2(h)
    pos, keys = make_sorted(150, g0, seed=11)
    slots = build_slot_grid(keys, g0)
    rng = np.random.default_rng(12)
    vel = jnp.asarray(rng.standard_normal((150, 2)).astype(np.float32))

    padded_pos = pad_to_slots(pos, slots, g0)
    padded_vel = pad_to_slots(vel, slots, g0)
    mask = slots.slot_mask.reshape(g0.ny, g0.nx, g0.occupancy)
    qs = jnp.asarray(rng.standard_normal((g0.ny, g0.nx, g0.occupancy)).astype(np.float32))

    def terms(ri_to_rj, r_sq, r, s, q, v_j):
        grad = kernel.gradient(ri_to_rj, r_sq, r)
        return {
            "w": kernel.evaluate(r_sq, r) * s,
            "g": grad,
            "dot": jnp.sum(v_j * grad, axis=-1) * q,
        }

    kw = dict(source_values=(padded_vel,), query_values=(qs,), scalar_args=(1.7,))
    for ga, gb, rtol in [
        (g0, gv, 1e-3),
        (dataclasses.replace(g0, pair_dtype="bfloat16"),
         dataclasses.replace(gv, pair_dtype="bfloat16"), 5e-2),
    ]:
        a = pair_reduce(terms, padded_pos, mask, padded_pos, mask, ga, **kw)
        b = pair_reduce(terms, padded_pos, mask, padded_pos, mask, gb, **kw)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=rtol, atol=1e-3
            )


def test_banded_pad_matches_plain_gather():
    """pad_to_slots(row_block=...) must equal the plain gather at every LIVE slot
    and produce zeros in fully-empty bands (the skipped branches). Uses a grid
    above the 1M-slot banding threshold with particles clustered in a few rows so
    both skipped and non-skipped bands are exercised."""
    import jax.numpy as jnp
    import numpy as np
    from yasph2d_tpu.ops.dense_grid import (
        DenseGridConfig, build_slot_grid, cell_keys, pad_to_slots,
    )

    grid = DenseGridConfig(cell_size=0.1, origin=(0.0, 0.0), nx=420, ny=352,
                           occupancy=7, row_block=16)
    assert grid.num_cells * grid.occupancy >= 1_000_000  # banding active
    rng = np.random.default_rng(7)
    n = 5000
    # particles only in rows [32, 64) and [200, 216): most bands are empty
    ys = np.concatenate([
        rng.uniform(3.2, 6.4, size=n // 2), rng.uniform(20.0, 21.6, size=n - n // 2)
    ])
    pos = jnp.asarray(
        np.stack([rng.uniform(0, 42.0, size=n), ys], axis=1).astype(np.float32)
    )
    keys = np.asarray(cell_keys(pos, grid))
    order = np.argsort(keys)
    sorted_pos = pos[jnp.asarray(order)]
    slots = build_slot_grid(jnp.asarray(keys[order]), grid)

    vals = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    plain = np.asarray(pad_to_slots(vals, slots, grid))
    banded = np.asarray(pad_to_slots(vals, slots, grid, row_block=grid.row_block))

    mask = np.asarray(slots.slot_mask).reshape(grid.ny, grid.nx, grid.occupancy)
    np.testing.assert_array_equal(banded[mask], plain[mask])
    # fully-empty bands are exact zeros in the banded output
    band_live = mask.reshape(-1, 16, grid.nx, grid.occupancy).any(axis=(1, 2, 3))
    empty_bands = banded.reshape(-1, 16, grid.nx, grid.occupancy, 3)[~band_live]
    assert not band_live.all() and band_live.any()
    np.testing.assert_array_equal(empty_bands, np.zeros_like(empty_bands))


# ---------------------------------------------------------------- rebucket

def _random_padded_layout(rng, grid, n):
    """Random particles -> sorted -> padded layout (the rebucket precondition)."""
    from yasph2d_tpu.ops.dense_grid import (
        build_slot_grid, cell_keys, pad_to_slots, sort_by_dense_keys,
    )

    x0, y0 = grid.origin
    pos = np.stack(
        [
            rng.uniform(x0, x0 + grid.nx * grid.cell_size, n),
            rng.uniform(y0, y0 + grid.ny * grid.cell_size, n),
        ],
        axis=1,
    ).astype(np.float32)
    vals = rng.normal(size=(n, 3)).astype(np.float32)
    (spos, svals), keys = sort_by_dense_keys(
        (jnp.asarray(pos), jnp.asarray(vals)), jnp.asarray(pos), grid
    )
    slots = build_slot_grid(keys, grid)
    pos_pad = pad_to_slots(spos, slots, grid)
    vals_pad = pad_to_slots(svals, slots, grid)
    mask = slots.slot_mask.reshape(grid.ny, grid.nx, grid.occupancy)
    return pos_pad, mask, vals_pad, int(slots.num_dropped)


@pytest.mark.parametrize("row_block", [None, 4])
def test_rebucket_matches_sorted_rebuild(row_block):
    """After sub-cell random displacement, rebucket must produce exactly the
    slot content (as per-cell row multisets) that the sort-based rebuild gives."""
    from yasph2d_tpu.ops.dense_grid import (
        DenseGridConfig, cell_keys, rebucket,
    )

    rng = np.random.default_rng(7)
    grid = DenseGridConfig(cell_size=0.25, origin=(0.0, 0.0), nx=12, ny=10,
                           occupancy=10, row_block=None)
    pos_pad, mask, vals_pad, dropped0 = _random_padded_layout(rng, grid, 300)
    assert dropped0 == 0

    # displace by < 0.9 cell (the CFL contract)
    disp = rng.uniform(-0.22, 0.22, size=pos_pad.shape).astype(np.float32)
    new_pos = jnp.asarray(np.asarray(pos_pad) + disp)

    out_pos, new_mask, out_vals, n_drop = jax.jit(
        lambda a, b, c: rebucket(a, b, c, grid, row_block=row_block)
    )(new_pos, mask, vals_pad)
    assert int(n_drop) == 0
    assert int(new_mask.sum()) == int(mask.sum())

    # every live output slot must sit in the cell containing its position
    mp = np.asarray(new_mask)
    op = np.asarray(out_pos)
    keys_out = np.asarray(cell_keys(out_pos, grid)).reshape(grid.ny, grid.nx,
                                                            grid.occupancy)
    iy, ix = np.indices((grid.ny, grid.nx))
    want = (iy * grid.nx + ix)[:, :, None]
    assert (keys_out[mp] == np.broadcast_to(want, mp.shape)[mp]).all()

    # global multiset of (pos | vals) rows is preserved
    rows_in = np.concatenate(
        [np.asarray(new_pos), np.asarray(vals_pad)], axis=-1
    )[np.asarray(mask)]
    rows_out = np.concatenate([op, np.asarray(out_vals)], axis=-1)[mp]
    rows_in = rows_in[np.lexsort(rows_in.T)]
    rows_out = rows_out[np.lexsort(rows_out.T)]
    np.testing.assert_array_equal(rows_in, rows_out)


def test_rebucket_overflow_counts_drops():
    """Occupancy-overflow at the target cell drops the excess deterministically."""
    from yasph2d_tpu.ops.dense_grid import DenseGridConfig, rebucket

    grid = DenseGridConfig(cell_size=1.0, origin=(0.0, 0.0), nx=4, ny=3,
                           occupancy=2, row_block=None)
    # three particles in three adjacent cells all moving into cell (1,1)
    pos = np.zeros((3, 4, 2, 2), np.float32)
    mask = np.zeros((3, 4, 2), bool)
    pos[1, 0, 0] = (0.5, 1.5); mask[1, 0, 0] = True
    pos[1, 2, 0] = (2.5, 1.5); mask[1, 2, 0] = True
    pos[0, 1, 0] = (1.5, 0.5); mask[0, 1, 0] = True
    target = np.array([1.5, 1.5], np.float32)
    new_pos = np.broadcast_to(target, pos.shape).astype(np.float32)
    vals = np.zeros((3, 4, 2, 1), np.float32)

    out_pos, new_mask, _, n_drop = rebucket(
        jnp.asarray(new_pos), jnp.asarray(mask), jnp.asarray(vals), grid
    )
    assert int(n_drop) == 1
    assert int(new_mask.sum()) == 2
    assert bool(new_mask[1, 1, 0]) and bool(new_mask[1, 1, 1])


def test_rebucket_clamps_super_cfl_moves():
    """A particle moving >1 cell (CFL violation) is clamped into the 3x3 window,
    not lost: particle count is conserved."""
    from yasph2d_tpu.ops.dense_grid import DenseGridConfig, rebucket

    grid = DenseGridConfig(cell_size=1.0, origin=(0.0, 0.0), nx=5, ny=1,
                           occupancy=2, row_block=None)
    pos = np.zeros((1, 5, 2, 2), np.float32)
    mask = np.zeros((1, 5, 2), bool)
    pos[0, 0, 0] = (0.5, 0.5); mask[0, 0, 0] = True
    new_pos = pos.copy()
    new_pos[0, 0, 0] = (4.5, 0.5)  # four cells in one step
    vals = np.zeros((1, 5, 2, 1), np.float32)

    _, new_mask, _, n_drop = rebucket(
        jnp.asarray(new_pos), jnp.asarray(mask), jnp.asarray(vals), grid
    )
    assert int(n_drop) == 0
    assert int(new_mask.sum()) == 1
    assert bool(new_mask[0, 1].any())  # clamped to the adjacent cell
