"""Slot-major Pallas pair passes vs the XLA pair_reduce path (interpret mode).

The slot-major kernel accumulates per (view, source-slot) in f32 with the query
slot outermost; the XLA path reduces one packed candidate axis — summation
order differs, so agreement is to float32 tolerance, not bitwise. The full
solver test pins iteration-count equality (same while_loop exits), the strong
form of behavioral equivalence used across the dense-solver test suite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yasph2d_tpu.models.dfsph_dense import DFSPHPaddedSolver
from yasph2d_tpu.models.viscosity import XSPHViscosityModel
from yasph2d_tpu.ops.dense_grid import (
    DenseGridConfig,
    build_slot_grid,
    cell_keys,
    pad_to_slots,
    pair_reduce,
)
from yasph2d_tpu.ops.pallas_slotmajor import (
    build_geom,
    pass_flags,
    sm_pair_reduce,
    sm_rebucket,
)
from yasph2d_tpu.ops.smoothing_kernels import WendlandQuinticC2
from yasph2d_tpu.timemanager import FixedTimeStep

from test_wcsph import small_dam_break


def setup(n=140, seed=0, ny=12, nx=8, occupancy=4):
    # sized for interpret-mode cost (the suite's wall clock, round-4 item 8):
    # conformance vs the XLA pair_reduce is input-shape-agnostic, and slot
    # overflow in pad_to_slots (possible at this density) is harmless here —
    # both paths consume the SAME post-padding state.
    h = 0.3
    grid = DenseGridConfig(
        cell_size=h, origin=(0.0, 0.0), nx=nx, ny=ny, occupancy=occupancy,
        row_block=6,
    )
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(
        (np.asarray(grid.origin) + rng.random((n, 2)) * [nx * h, ny * h])
        .astype(np.float32)
    )
    keys = cell_keys(pos, grid)
    order = jnp.argsort(keys)
    pos = pos[order]
    slots = build_slot_grid(keys[order], grid)
    pp = pad_to_slots(pos, slots, grid)
    mask = slots.slot_mask.reshape(ny, nx, occupancy)
    vel = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    vp = pad_to_slots(vel, slots, grid)
    return grid, pp, mask, vp, WendlandQuinticC2(h)


def test_sm_matches_xla_ctx_terms():
    """The 5-output ctx pass: W, m*gradW vector, |m*gradW|^2, count."""
    grid, pp, mask, vp, kernel = setup()
    m = 2.5

    def fn(ri, r_sq, r):
        mgrad = kernel.gradient(ri, r_sq, r) * m
        return {
            "w": kernel.evaluate(r_sq, r),
            "vec": mgrad,
            "sq": jnp.sum(mgrad * mgrad, axis=-1),
            "count": jnp.ones_like(r_sq),
        }

    ref = pair_reduce(fn, pp, mask, pp, mask, grid)

    def sm_fn(dx, dy, r_sq, r, scalars, q_planes, s_planes):
        w = kernel.evaluate(r_sq, r)
        mgc = kernel.gradient_coefficient(r_sq, r) * m
        gx, gy = mgc * dx, mgc * dy
        return (w, gx, gy, gx * gx + gy * gy, jnp.ones_like(r_sq))

    br = 4
    sm = build_geom(pp, mask, br)
    w, gx, gy, sq, cnt = sm_pair_reduce(
        sm_fn, 5, sm, sm, pass_flags(sm, sm), grid, br, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ref["w"]), w, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref["vec"]), np.stack([gx, gy], -1), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(ref["sq"]), sq, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ref["count"]), cnt, rtol=0, atol=0)


def test_sm_values_scalars_and_uneven_bands():
    """q/s value planes (vector + scalar), traced scalars, ny % br != 0."""
    grid, pp, mask, vp, kernel = setup(seed=3)
    kpad = jnp.sum(vp, axis=-1)

    def fn(ri, r_sq, r, s, v_i, v_j, k_j):
        grad = kernel.gradient(ri, r_sq, r)
        return jnp.sum((v_i - v_j) * grad, -1) * s + k_j

    ref = pair_reduce(
        fn, pp, mask, pp, mask, grid,
        source_values=(vp, kpad), query_values=(vp,), scalar_args=(0.7,),
    )

    def sm_fn(dx, dy, r_sq, r, scalars, q, s):
        gc = kernel.gradient_coefficient(r_sq, r)
        div = ((q[0] - s[0]) * dx + (q[1] - s[1]) * dy) * gc
        return (div * scalars[0] + s[2],)

    br = 7  # 12 / 7 -> uneven final band
    sm = build_geom(pp, mask, br)
    (out,) = sm_pair_reduce(
        sm_fn, 1, sm, sm, pass_flags(sm, sm), grid, br,
        q_vals=(vp,), s_vals=(vp, kpad), scalars=(jnp.float32(0.7),),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), out, rtol=1e-4, atol=1e-4)


def test_sm_band_skip_flags_zero_empty_bands():
    """Bands whose source window is empty are skipped and must emit zeros;
    occupied bands bordering empty ones still see their one-row halo."""
    grid, pp, mask, vp, kernel = setup()
    # empty out the top half of the domain: rows >= 6 hold no particles
    keep = jnp.arange(grid.ny)[:, None, None] < 6
    mask = mask & keep
    pp = jnp.where(mask[..., None], pp, 0.0)

    def fn(ri, r_sq, r):
        return jnp.ones_like(r_sq)

    ref = pair_reduce(fn, pp, mask, pp, mask, grid)

    br = 4
    sm = build_geom(pp, mask, br)
    flags = pass_flags(sm, sm)
    assert np.asarray(flags)[-1, 0] == 0  # top band truly skipped
    (cnt,) = sm_pair_reduce(
        lambda dx, dy, r_sq, r, sc, q, s: (jnp.ones_like(r_sq),),
        1, sm, sm, flags, grid, br, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), cnt, rtol=0, atol=0)
    assert np.all(cnt[6:] == 0.0)


def test_sm_matches_xla_wcsph_forces():
    """The WCSPH pressure + viscosity force pass in plane form (wcsph_dense's
    forces_sm) vs the XLA dyn_forces pass."""
    from yasph2d_tpu.models.viscosity import XSPHViscosityModel
    from yasph2d_tpu.ops.smoothing_kernels import Spiky

    grid, pp, mask, vp, kernel = setup(seed=9)
    h = grid.cell_size
    spiky = Spiky(h)
    visc = XSPHViscosityModel(smoothing_length=h)
    rng = np.random.default_rng(2)
    m, dt = 2.5, jnp.float32(1e-3)
    dens = jnp.asarray(
        rng.uniform(900.0, 1100.0, mask.shape).astype(np.float32)
    )
    pres = jnp.asarray(
        rng.uniform(0.0, 50.0, mask.shape).astype(np.float32)
    )

    def dyn_forces(ri, r_sq, r, dt_s, p_i, rho_i, v_i, p_j, rho_j, v_j):
        coef = -m * (p_i + p_j) / (2.0 * rho_i * rho_j)
        f = coef[..., None] * spiky.gradient(ri, r_sq, r)
        return f + visc.compute_viscous_acceleration(
            dt_s, r_sq, r, m, rho_j, v_j - v_i
        )

    ref = pair_reduce(
        dyn_forces, pp, mask, pp, mask, grid,
        source_values=(pres, dens, vp), query_values=(pres, dens, vp),
        scalar_args=(dt,),
    )

    def forces_sm(dx, dy, r_sq, r, scalars, q, s):
        p_i, rho_i, vx_i, vy_i = q
        p_j, rho_j, vx_j, vy_j = s
        coef = -m * (p_i + p_j) / (2.0 * rho_i * rho_j)
        gc = coef * spiky.gradient_coefficient(r_sq, r)
        c = visc.viscous_coefficient(scalars[0], r_sq, r, m, rho_j)
        return (gc * dx + c * (vx_j - vx_i), gc * dy + c * (vy_j - vy_i))

    br = 4
    sm = build_geom(pp, mask, br)
    ax, ay = sm_pair_reduce(
        forces_sm, 2, sm, sm, pass_flags(sm, sm), grid, br,
        q_vals=(pres, dens, vp), s_vals=(pres, dens, vp), scalars=(dt,),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.stack([ax, ay], -1), rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("br", [4, 7])  # 12 % 7 != 0: uneven final band
def test_sm_rebucket_matches_xla_exactly(br):
    """sm_rebucket vs dense_grid.rebucket: positions, values, mask, and drop
    count must be BIT-EXACT (both paths pass payload through unmodified and
    compact in the same deterministic (view, slot) order)."""
    from yasph2d_tpu.ops.dense_grid import rebucket

    grid, pp, mask, vp, kernel = setup(seed=11)
    rng = np.random.default_rng(7)
    # advect by < one cell (the CFL contract) so every move stays in the 3x3
    # window; also empty the top rows so band skipping engages
    keep = jnp.arange(grid.ny)[:, None, None] < 7
    mask = mask & keep
    delta = jnp.asarray(
        rng.uniform(-0.9, 0.9, pp.shape).astype(np.float32) * grid.cell_size
    )
    pos = jnp.where(mask[..., None], pp + delta, 0.0)
    values = jnp.concatenate(
        [vp, jnp.sum(vp, -1, keepdims=True),
         jnp.ones_like(vp[..., :1])], axis=-1
    )  # D = 4, like the DFSPH payload

    ref_pos, ref_mask, ref_vals, ref_drop = rebucket(
        pos, mask, values, grid, row_block=grid.ny
    )
    out_pos, out_mask, out_vals, out_drop = sm_rebucket(
        pos, mask, values, grid, br=br, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref_mask), np.asarray(out_mask))
    np.testing.assert_array_equal(np.asarray(ref_pos), np.asarray(out_pos))
    np.testing.assert_array_equal(np.asarray(ref_vals), np.asarray(out_vals))
    assert int(ref_drop) == int(out_drop)


def test_sm_rebucket_overflow_drops():
    """Target-cell occupancy overflow must drop and count exactly like the XLA
    re-bucket (funnel every particle of a 3x3 block into its center cell)."""
    from yasph2d_tpu.ops.dense_grid import rebucket

    grid, pp, mask, vp, kernel = setup(seed=5, occupancy=4)
    h = grid.cell_size
    # send every live particle in cell rows/cols 4..6 to the center of cell (5,5)
    in_block = (
        (jnp.arange(grid.ny)[:, None, None] >= 4)
        & (jnp.arange(grid.ny)[:, None, None] <= 6)
        & (jnp.arange(grid.nx)[None, :, None] >= 4)
        & (jnp.arange(grid.nx)[None, :, None] <= 6)
        & mask
    )
    center = jnp.asarray([5.5 * h, 5.5 * h], dtype=jnp.float32)
    pos = jnp.where(in_block[..., None], center, pp)
    pos = jnp.where(mask[..., None], pos, 0.0)

    ref = rebucket(pos, mask, vp, grid, row_block=grid.ny)
    out = sm_rebucket(pos, mask, vp, grid, br=4, interpret=True)
    assert int(ref[3]) == int(out[3]) and int(out[3]) > 0
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(out[2]))


@pytest.mark.slow
def test_padded_solver_slotmajor_matches_xla():
    """Full DFSPHPaddedSolver equivalence: use_pallas_slotmajor vs the XLA
    path over 10 adaptive steps — identical iteration counts, matching state.

    TPU-only: in interpret mode the jitted solver inlines the fully-unrolled
    9 x Ps x P kernel graph per pass and the COMPILE alone exceeds an hour
    (measured; pass-level interpret tests above stay tractable because they
    run one unjitted pass). On the real device the kernels Mosaic-compile in
    minutes and the whole test runs in seconds. Cross-path iteration-count
    equality on CPU-less environments is also re-pinned every bench run:
    bench.py reports identical density/divergence iterations for the
    slot-major and XLA paths at 100k and 1M (PERF.md round 3)."""
    import dataclasses

    if jax.default_backend() != "tpu":
        pytest.skip("interpret-mode compile of the full jitted solver is "
                    ">1 h; run on a TPU backend (see docstring)")

    world = small_dam_break(particle_density=1600.0)
    h = world.properties.smoothing_length
    grid = world.dense_grid(occupancy=12)
    common = dict(
        viscosity_model=XSPHViscosityModel(smoothing_length=h),
        properties=world.properties, step_config=FixedTimeStep(1.0 / 3000.0),
    )
    ref_solver = DFSPHPaddedSolver(grid=grid, **common)
    sm_solver = DFSPHPaddedSolver(
        grid=dataclasses.replace(
            grid, use_pallas_slotmajor=True, pallas_sm_row_block=8
        ),
        **common,
    )
    boundary = world.boundary_dense(grid)

    rc = jax.jit(ref_solver.init_carry)(world.initial_state(), boundary)
    sc = jax.jit(sm_solver.init_carry)(world.initial_state(), boundary)

    rc, rdiag = jax.jit(ref_solver.simulate, static_argnums=2)(rc, boundary, 10)
    sc, sdiag = jax.jit(sm_solver.simulate, static_argnums=2)(sc, boundary, 10)

    assert int(rdiag.neighbor_drops) == 0 and int(sdiag.neighbor_drops) == 0
    assert int(rdiag.density_iterations) == int(sdiag.density_iterations)
    assert int(rdiag.divergence_iterations) == int(sdiag.divergence_iterations)

    rs = ref_solver.export_state(rc)
    ss = sm_solver.export_state(sc)
    np.testing.assert_array_equal(np.asarray(rs.alive), np.asarray(ss.alive))
    alive = np.asarray(rs.alive)
    np.testing.assert_allclose(
        np.asarray(rs.positions)[alive], np.asarray(ss.positions)[alive],
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(rs.densities)[alive], np.asarray(ss.densities)[alive],
        rtol=1e-4, atol=1e-2,
    )
