"""Plane-form (PF) slot-major kernels vs the band-blocked sm_* generation.

pf_pair_reduce / pf_rebucket run the identical (qp, view, sp) accumulation as
sm_pair_reduce / sm_rebucket — outputs must be BIT-EQUAL given equal inputs
(interpret mode on the forced-CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yasph2d_tpu.ops.dense_grid import DenseGridConfig
from yasph2d_tpu.ops.pallas_slotmajor import (
    build_geom,
    from_planes,
    pass_flags,
    pf_build_geom,
    pf_dims,
    pf_pair_reduce,
    pf_rebucket,
    sm_pair_reduce,
    sm_rebucket,
    to_planes,
)

BR = 4


def _random_grid(seed, ny=11, nx=17, p=3, fill=0.5):
    rng = np.random.default_rng(seed)
    # pallas_pf_unroll=False: these grids are tiny, so the "auto" default
    # would unroll — pin the BOUNDED slot loops (the production 1M structure)
    # so the bit-equality anchors keep covering it; the unrolled variant gets
    # its own equality test (test_pf_unroll_bitwise_identical)
    grid = DenseGridConfig(
        origin=(0.0, 0.0), cell_size=0.1, ny=ny, nx=nx, occupancy=p,
        pallas_pf_unroll=False,
    )
    mask = rng.random((ny, nx, p)) < fill
    # live slots: a position inside (or near) the slot's own cell
    cy, cx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    base = np.stack([cx, cy], axis=-1)[:, :, None, :] * 0.1
    pos = base + rng.random((ny, nx, p, 2)) * 0.1
    pos = np.where(mask[..., None], pos, 0.0).astype(np.float32)
    return grid, jnp.asarray(pos), jnp.asarray(mask)


def _terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
    w = 1.0 / (r_sq + 0.01)
    return (w, w * dx, (q_planes[0] - s_planes[0]) * dy * scalars[0])


def test_pf_pair_reduce_bit_equal_to_sm():
    grid, pos, mask = _random_grid(0)
    rng = np.random.default_rng(1)
    val = jnp.asarray(rng.random((grid.ny, grid.nx, grid.occupancy), np.float32))

    sm = build_geom(pos, mask, BR)
    sm_out = sm_pair_reduce(
        _terms, 3, sm, sm, pass_flags(sm, sm), grid, BR,
        q_vals=(val,), s_vals=(val,), scalars=(1.7,),
    )

    pos_pf = to_planes(pos, grid, BR)
    mask_pf = to_planes(mask, grid, BR).astype(bool)
    val_pf = to_planes(val, grid, BR)
    pf = pf_build_geom(pos_pf, mask_pf, BR)
    np.testing.assert_array_equal(np.asarray(pf.band_any), np.asarray(sm.band_any))
    pf_out = pf_pair_reduce(
        _terms, 3, pf, pf, pass_flags(pf, pf), grid, BR,
        q_vals=(val_pf,), s_vals=(val_pf,), scalars=(1.7,),
    )
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(from_planes(pf_out[k], grid)), np.asarray(sm_out[k])
        )


def test_pf_pair_reduce_vector_vals_and_distinct_spaces():
    grid, pos, mask = _random_grid(2, fill=0.7)
    _, spos, smask = _random_grid(3, fill=0.2)
    rng = np.random.default_rng(4)
    vec = jnp.asarray(rng.random((grid.ny, grid.nx, grid.occupancy, 2), np.float32))

    def terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
        return ((q_planes[0] - s_planes[0]) * dx + (q_planes[1] - s_planes[1]) * dy,)

    smq = build_geom(pos, mask, BR)
    sms = build_geom(spos, smask, BR)
    (sm_out,) = sm_pair_reduce(
        terms, 1, smq, sms, pass_flags(smq, sms), grid, BR,
        q_vals=(vec,), s_vals=(vec,),
    )

    pfq = pf_build_geom(to_planes(pos, grid, BR), to_planes(mask, grid, BR).astype(bool), BR)
    pfs = pf_build_geom(to_planes(spos, grid, BR), to_planes(smask, grid, BR).astype(bool), BR)
    vec_pf = to_planes(vec, grid, BR)
    pf_out = pf_pair_reduce(
        terms, 1, pfq, pfs, pass_flags(pfq, pfs), grid, BR,
        q_vals=(vec_pf,), s_vals=(vec_pf,),
    )
    np.testing.assert_array_equal(
        np.asarray(from_planes(pf_out[0], grid)), np.asarray(sm_out)
    )


def test_pf_chunked_sparse_source_bitwise():
    """The boundary-pass shape — DISTINCT query/source geometries where the
    source occupies only a few columns — with a 128-lane chunk override (what
    `DenseGridConfig.pallas_pf_stat_chunk_lanes` routes in the plane solvers).
    Source-dead chunks are skipped via the SOURCE geom's bounds; outputs must
    stay bitwise identical to the full-width pass. Wide grid (nxp=384) so the
    decomposition is real; thin (ny=4, p=2) so interpret mode stays cheap."""
    grid, pos, mask = _random_grid(21, ny=4, nx=300, p=2, fill=0.4)
    _, spos, smask = _random_grid(22, ny=4, nx=300, p=2, fill=1.0)
    # confine the source to two column stripes (like a tank's side walls)
    cols = (np.arange(grid.nx)[None, :, None] < 6) | (
        np.arange(grid.nx)[None, :, None] >= grid.nx - 6
    )
    smask = smask & jnp.asarray(cols)
    spos = jnp.where(smask[..., None], spos, 0.0)

    def terms(dx, dy, r_sq, r, scalars, q_planes, s_planes):
        return (1.0 / (r_sq + 0.01), dx + dy,)

    pfq = pf_build_geom(to_planes(pos, grid, BR), to_planes(mask, grid, BR).astype(bool), BR)
    pfs = pf_build_geom(to_planes(spos, grid, BR), to_planes(smask, grid, BR).astype(bool), BR)
    flags = pass_flags(pfq, pfs)
    full = pf_pair_reduce(terms, 2, pfq, pfs, flags, grid, BR)
    chunked = pf_pair_reduce(terms, 2, pfq, pfs, flags, grid, BR, chunk_lanes=128)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(full))
    # sanity: the pass actually produced nonzero output near the stripes
    assert float(jnp.abs(full[0]).sum()) > 0.0


def test_plane_fused_loop_glue_matches_unfused():
    """fuse_loop_elementwise folds the pressure loops' elementwise glue
    (boundary-divergence add, error/stiffness maps, velocity updates) into
    the pair kernels as post-maps. Live-slot trajectories, iteration counts,
    and diagnostics must be BIT-IDENTICAL to the unfused formulation — the
    post-map computes the same f32 ops in the same order; only dead-slot
    velocity planes (masked everywhere) may differ."""
    import dataclasses as dc

    from yasph2d_tpu.models.dfsph_plane import DFSPHPlaneSolver
    from yasph2d_tpu.models.viscosity import XSPHViscosityModel
    from yasph2d_tpu.timemanager import FixedTimeStep
    from yasph2d_tpu.world import FluidParticleWorld

    world = FluidParticleWorld(1.0, 60.0, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 2)
    grid = dc.replace(
        world.dense_grid(occupancy=3),
        use_pallas_slotmajor=True, pallas_sm_row_block=4,
    )

    def run(fused):
        solver = DFSPHPlaneSolver(
            viscosity_model=XSPHViscosityModel(
                smoothing_length=world.properties.smoothing_length
            ),
            properties=world.properties, grid=grid,
            step_config=FixedTimeStep(1.0 / 3000.0),
            fuse_loop_elementwise=fused,
            fuse_ctx_elementwise=fused,
        )
        boundary = solver.boundary_planes(world.boundary_dense(grid))
        c = jax.jit(solver.init_carry)(world.initial_state(), boundary)
        # step chunk=1 so diagnostics are per-step: the warmstart branch
        # (prev_iterations > 1) runs on step k+1 only if step k reported > 1
        # iterations, so coverage needs a NON-final step above 1 — an
        # aggregated count over the 6 steps cannot guarantee that
        step = jax.jit(solver.simulate, static_argnums=2)
        per_step = []
        for _ in range(6):
            c, d = step(c, boundary, 1)
            per_step.append(d)
        return solver.export_state(c), per_step

    s_f, ds_f = run(True)
    s_u, ds_u = run(False)
    alive_f, alive_u = np.asarray(s_f.alive), np.asarray(s_u.alive)
    np.testing.assert_array_equal(alive_f, alive_u)
    assert alive_f.sum() == world.num_dynamic_particles
    # warmstart coverage: some non-final step must exceed 1 iteration so a
    # subsequent step actually took the fused warmstart branch
    assert any(
        int(d.density_iterations) > 1 or int(d.divergence_iterations) > 1
        for d in ds_f[:-1]
    )

    class _Sum:
        def __init__(self, ds):
            self.density_iterations = sum(int(d.density_iterations) for d in ds)
            self.divergence_iterations = sum(
                int(d.divergence_iterations) for d in ds
            )
            self.neighbor_drops = max(int(d.neighbor_drops) for d in ds)

    d_f, d_u = _Sum(ds_f), _Sum(ds_u)
    for field in ("density_iterations", "divergence_iterations",
                  "neighbor_drops"):
        assert int(getattr(d_f, field)) == int(getattr(d_u, field)), field
    np.testing.assert_array_equal(
        np.asarray(s_f.positions)[alive_f], np.asarray(s_u.positions)[alive_u]
    )
    np.testing.assert_array_equal(
        np.asarray(s_f.velocities)[alive_f], np.asarray(s_u.velocities)[alive_u]
    )
    np.testing.assert_array_equal(
        np.asarray(s_f.densities)[alive_f], np.asarray(s_u.densities)[alive_u]
    )


def test_pf_rebucket_bit_equal_to_sm():
    grid, pos, mask = _random_grid(5, fill=0.4)
    rng = np.random.default_rng(6)
    # advect: random sub-cell displacements (some cross cell borders)
    disp = (rng.random((grid.ny, grid.nx, grid.occupancy, 2)) - 0.5) * 0.12
    adv = jnp.where(mask[..., None], pos + disp.astype(np.float32), 0.0)
    vals = jnp.asarray(
        rng.random((grid.ny, grid.nx, grid.occupancy, 3), np.float32)
    )

    sm_pos, sm_mask, sm_vals, sm_drops = sm_rebucket(adv, mask, vals, grid, br=BR)

    vals_pf = jnp.stack(
        [to_planes(vals[..., k], grid, BR) for k in range(3)], axis=0
    )
    pf_pos, pf_mask, pf_vals, pf_drops = pf_rebucket(
        to_planes(adv, grid, BR),
        to_planes(mask, grid, BR).astype(bool),
        vals_pf,
        grid, br=BR,
    )
    np.testing.assert_array_equal(
        np.asarray(from_planes(pf_pos, grid)), np.asarray(sm_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(from_planes(pf_mask.astype(jnp.float32), grid) > 0.5),
        np.asarray(sm_mask),
    )
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(from_planes(pf_vals[k], grid)), np.asarray(sm_vals[..., k])
        )
    assert int(pf_drops) == int(sm_drops)


@pytest.mark.parametrize("chunk", [128, 256, None])
def test_pf_chunk_widths_bitwise_identical(chunk):
    """Adaptive-bound chunk decompositions (128-lane, 256-lane with a RAGGED
    final chunk — nxp=384 — and one full-width band) must produce bitwise
    identical pair-pass and re-bucket outputs: every chunking runs the same
    (qp, view, sp) accumulation per output element."""
    grid, pos, mask = _random_grid(11, ny=9, nx=300, p=3, fill=0.3)
    rng = np.random.default_rng(12)
    val = jnp.asarray(rng.random((grid.ny, grid.nx, grid.occupancy), np.float32))
    pos_pf = to_planes(pos, grid, BR)
    mask_pf = to_planes(mask, grid, BR).astype(bool)
    val_pf = to_planes(val, grid, BR)
    assert pf_dims(grid, BR)[2] == 384  # 3x128: 256 leaves a ragged 128 tail

    def pair(chunk_lanes):
        pf = pf_build_geom(pos_pf, mask_pf, BR)
        return pf_pair_reduce(
            _terms, 3, pf, pf, pass_flags(pf, pf), grid, BR,
            q_vals=(val_pf,), s_vals=(val_pf,), scalars=(1.7,),
            chunk_lanes=chunk_lanes,
        )

    def rebucket(chunk_lanes):
        disp = (np.random.default_rng(13).random(
            (grid.ny, grid.nx, grid.occupancy, 2)) - 0.5) * 0.12
        adv = jnp.where(mask[..., None], pos + disp.astype(np.float32), 0.0)
        return pf_rebucket(
            to_planes(adv, grid, BR), mask_pf, val_pf[None], grid, br=BR,
            chunk_lanes=chunk_lanes,
        )

    ref_pair, ref_reb = pair(None), rebucket(None)
    out_pair, out_reb = pair(chunk), rebucket(chunk)
    np.testing.assert_array_equal(np.asarray(out_pair), np.asarray(ref_pair))
    for a, b in zip(out_reb[:3], ref_reb[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(out_reb[3]) == int(ref_reb[3])


def test_pf_dims_and_roundtrip():
    grid, pos, mask = _random_grid(7)
    nbr, nyp, nxp, nxs = pf_dims(grid, BR)
    assert nyp % BR == 0 and nyp >= grid.ny
    assert nxp % 128 == 0 and nxp >= grid.nx
    assert nxs == nxp + 128
    p = to_planes(pos, grid, BR)
    assert p.shape == (2, grid.occupancy, nyp, nxp)
    np.testing.assert_array_equal(np.asarray(from_planes(p, grid)), np.asarray(pos))


def test_wcsph_plane_carry_roundtrip():
    """WCSPHPlaneSolver's init_carry -> export_state layout plumbing (no kernel
    calls) reproduces the padded solver's export exactly; the plane solver's
    jitted STEP is TPU-gated in tests/test_wcsph_plane.py."""
    import dataclasses

    from yasph2d_tpu.models.viscosity import XSPHViscosityModel
    from yasph2d_tpu.models.wcsph_dense import WCSPHPaddedSolver
    from yasph2d_tpu.models.wcsph_plane import WCSPHPlaneSolver
    from yasph2d_tpu.timemanager import FixedTimeStep
    from yasph2d_tpu.world import FluidParticleWorld

    world = FluidParticleWorld(2.0, 400.0, 100.0)
    world.add_fluid_rect((0.1, 0.7, 0.5, 1.0), 0.05)
    world.add_boundary_thick_line((0.0, 0.0), (2.0, 0.0), 2)
    grid = dataclasses.replace(
        world.dense_grid(occupancy=12), use_pallas_slotmajor=True
    )
    common = dict(
        viscosity_model=XSPHViscosityModel(
            smoothing_length=world.properties.smoothing_length
        ),
        properties=world.properties, grid=grid,
        step_config=FixedTimeStep(1.0 / 3000.0),
    )
    padded = WCSPHPaddedSolver(**common)
    plane = WCSPHPlaneSolver(**common)
    bdense = world.boundary_dense(grid)
    bpl = plane.boundary_planes(bdense)
    assert bpl.geom.q_geom.shape[1] == bdense.pos_pad.shape[2]

    pc = padded.init_carry(world.initial_state())
    fc = plane.init_carry(world.initial_state())
    ps = padded.export_state(pc)
    fs = plane.export_state(fc)
    np.testing.assert_array_equal(np.asarray(ps.alive), np.asarray(fs.alive))
    alive = np.asarray(ps.alive)
    np.testing.assert_array_equal(
        np.asarray(ps.positions)[alive], np.asarray(fs.positions)[alive]
    )
    np.testing.assert_array_equal(
        np.asarray(ps.velocities)[alive], np.asarray(fs.velocities)[alive]
    )
    np.testing.assert_array_equal(
        np.asarray(ps.densities)[alive], np.asarray(fs.densities)[alive]
    )


def test_pf_unroll_bitwise_identical():
    """Unrolled slot loops (small-grid auto route, the round-3 kernel
    structure) vs the occupancy-bounded fori_loops: identical (qp, view, sp)
    accumulation, so no-post outputs must be BITWISE equal — every candidate
    a bound excludes was masked to an exact +0.0."""
    grid, pos, mask = _random_grid(31, fill=0.6)
    rng = np.random.default_rng(32)
    val = jnp.asarray(rng.random((grid.ny, grid.nx, grid.occupancy), np.float32))
    pos_pf = to_planes(pos, grid, BR)
    mask_pf = to_planes(mask, grid, BR).astype(bool)
    val_pf = to_planes(val, grid, BR)
    pf = pf_build_geom(pos_pf, mask_pf, BR)
    flags = pass_flags(pf, pf)
    kw = dict(q_vals=(val_pf,), s_vals=(val_pf,), scalars=(1.7,))
    bounded = pf_pair_reduce(_terms, 3, pf, pf, flags, grid, BR,
                             unroll=False, **kw)
    unrolled = pf_pair_reduce(_terms, 3, pf, pf, flags, grid, BR,
                              unroll=True, **kw)
    np.testing.assert_array_equal(np.asarray(unrolled), np.asarray(bounded))
    assert float(jnp.abs(bounded).sum()) > 0.0
