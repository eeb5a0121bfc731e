"""Property tests for smoothing kernels.

Port of the reference's `generate_kernel_tests!` macro
(reference: src/sph/smoothing_kernel/kernel.rs:40-164), parametrized over the four
kernels that enable it (Viscosity's tests are disabled in the reference too,
viscosity.rs:50-52). Checks, per smoothing length {0.5, 1.0, 123.0}:

- non-negativity inside the support
- exact zero outside the support
- positivity over a 200x200 sample domain
- integral over the support == 1 within 1% (rectangle rule)
- analytic gradient matches a central-difference numeric gradient within 5% in
  magnitude and direction
"""

import numpy as np
import pytest
import jax.numpy as jnp

from yasph2d_tpu.ops.smoothing_kernels import (
    CubicSpline,
    Poly6,
    Spiky,
    Viscosity,
    WendlandQuinticC2,
)

TEST_SMOOTHING_LENGTHS = [0.5, 1.0, 123.0]  # kernel.rs:47
KERNELS = [Poly6, Spiky, CubicSpline, WendlandQuinticC2]
SAMPLES_PER_AXIS = 200


def domain_points(h):
    """The reference's sample domain: [-h, h]^2 on a 200^2 lattice (kernel.rs:55-66)."""
    axis = np.arange(SAMPLES_PER_AXIS) / (SAMPLES_PER_AXIS - 1) * 2.0 * h - h
    gx, gy = np.meshgrid(axis, axis, indexing="xy")
    return np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)


@pytest.mark.parametrize("kernel_cls", KERNELS)
@pytest.mark.parametrize("h", TEST_SMOOTHING_LENGTHS)
class TestKernelProperties:
    def test_positive_within_smoothing_length(self, kernel_cls, h):
        kernel = kernel_cls(h)
        r = np.asarray([h * i / 100.0 for i in range(100)], dtype=np.float32)
        w = np.asarray(kernel.evaluate(jnp.asarray(r * r), jnp.asarray(r)))
        assert (w >= 0.0).all()

    def test_zero_outside_smoothing_length(self, kernel_cls, h):
        kernel = kernel_cls(h)
        r = np.asarray([h * (1.0000001 + i / 10.0) for i in range(100)], dtype=np.float32)
        w = np.asarray(kernel.evaluate(jnp.asarray(r * r), jnp.asarray(r)))
        assert (w == 0.0).all()

    def test_evaluate_always_positive(self, kernel_cls, h):
        kernel = kernel_cls(h)
        p = domain_points(h)
        r_sq = (p * p).sum(-1)
        w = np.asarray(kernel.evaluate(jnp.asarray(r_sq), jnp.asarray(np.sqrt(r_sq))))
        assert (w >= 0.0).all()

    def test_integrates_to_one(self, kernel_cls, h):
        kernel = kernel_cls(h)
        p = domain_points(h)
        r_sq = (p * p).sum(-1)
        w = np.asarray(
            kernel.evaluate(jnp.asarray(r_sq), jnp.asarray(np.sqrt(r_sq))),
            dtype=np.float64,
        )
        integral = w.sum() * (2.0 * h / SAMPLES_PER_AXIS) ** 2  # rectangle rule
        assert abs(1.0 - integral) < 0.01

    def test_gradient_matches_numeric(self, kernel_cls, h):
        kernel = kernel_cls(h)
        p = domain_points(h).astype(np.float64)
        r_sq = (p * p).sum(-1).astype(np.float32)
        r = np.sqrt(r_sq)
        analytic = np.asarray(
            kernel.gradient(jnp.asarray(p, dtype=jnp.float32), jnp.asarray(r_sq), jnp.asarray(r)),
            dtype=np.float64,
        )

        step = h * 1e-4

        def w_at(q):
            q_sq = (q * q).sum(-1).astype(np.float32)
            return np.asarray(
                kernel.evaluate(jnp.asarray(q_sq), jnp.asarray(np.sqrt(q_sq))),
                dtype=np.float64,
            )

        ex = np.asarray([step, 0.0])
        ey = np.asarray([0.0, step])
        numeric = np.stack(
            [
                (w_at(p - ex) - w_at(p + ex)) * 0.5 / step,
                (w_at(p - ey) - w_at(p + ey)) * 0.5 / step,
            ],
            axis=-1,
        )

        eps = 1e-5  # RELATIVE_ERROR_EPS, kernel.rs:142
        a_mag = np.linalg.norm(analytic, axis=-1)
        n_mag = np.linalg.norm(numeric, axis=-1)
        rel = np.abs(1.0 - (n_mag + eps) / (a_mag + eps))
        assert rel.max() < 0.05, f"gradient magnitude mismatch: {rel.max()}"

        dot = (numeric * analytic).sum(-1) + eps
        direction = np.abs(dot / (a_mag * a_mag + eps) - 1.0)
        assert direction.max() < 0.05, f"gradient direction mismatch: {direction.max()}"


def test_viscosity_laplacian_positive_inside():
    for h in TEST_SMOOTHING_LENGTHS:
        kernel = Viscosity(h)
        r = np.linspace(0.0, h * 0.999, 64, dtype=np.float32)
        lap = np.asarray(kernel.laplacian(jnp.asarray(r * r), jnp.asarray(r)))
        assert (lap >= 0.0).all()
        # laplacian used by PhysicalViscosityModel is (h - r)-shaped: max at r=0
        assert lap[0] == lap.max()
