"""Golden numerical tests ported from the reference's inline kernel tests.

Reference: sph_kernels.rs:88-114 (normalization), :116-163 (gradient vs finite
differences), :214-227 (volume<->radius roundtrip).
"""

import jax.numpy as jnp
import numpy as np

from adaptive_sph_tpu.ops import kernels


def test_cubic_kernel_2d_integration():
    h = 5.0
    support_radius = 2.0 * h
    grid_size = 200
    square_len = 2.0 * support_radius / grid_size
    square_area = square_len * square_len

    xs = (np.arange(grid_size) + 0.5) * square_len - support_radius
    gx, gy = np.meshgrid(xs, xs)
    r = np.sqrt(gx**2 + gy**2)
    integral = float(jnp.sum(kernels.kernel_w(jnp.asarray(r), h, dim=2) * square_area))

    assert 1.0 / 1.00001 <= integral <= 1.00001


def test_cubic_kernel_3d_integration():
    h = 2.0
    support_radius = 2.0 * h
    grid_size = 96
    cell = 2.0 * support_radius / grid_size
    xs = (np.arange(grid_size) + 0.5) * cell - support_radius
    gx, gy, gz = np.meshgrid(xs, xs, xs)
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    integral = float(jnp.sum(kernels.kernel_w(jnp.asarray(r), h, dim=3) * cell**3))
    assert abs(integral - 1.0) < 1e-3


def test_cubic_kernel_2d_derivative_vs_finite_differences():
    h = 5.0
    support_radius = 2.0 * h
    n = 100
    diff = support_radius * 1e-2
    half = diff * 0.5
    probe_offset = 2.0 * support_radius / n

    xs = (np.arange(n + 1) + 0.5) * probe_offset - support_radius
    gx, gy = np.meshgrid(xs, xs)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)

    analytical = np.asarray(kernels.kernel_grad(jnp.asarray(pts), h, dim=2))

    def w(p):
        return np.asarray(kernels.kernel_w(jnp.linalg.norm(p, axis=-1), h, dim=2))

    approx_x = (w(pts + [half, 0.0]) - w(pts + [-half, 0.0])) / diff
    approx_y = (w(pts + [0.0, half]) - w(pts + [0.0, -half])) / diff
    approx = np.stack([approx_x, approx_y], axis=-1)

    assert np.max(np.abs(analytical - approx)) < 0.001


def test_radius_and_sphere_volume_roundtrip():
    for dim in (2, 3):
        for x in (0.1, 0.5, 1.0, 100.0):
            x2 = float(
                kernels.radius_to_sphere_volume(kernels.sphere_volume_to_radius(x, dim), dim)
            )
            assert abs(x - x2) < 1e-4 * max(1.0, x)


def test_dw_dH_matches_finite_differences():
    # dW/dH used by the IISPH2 Omega correction (simulation.rs:2266-2276)
    rng = np.random.default_rng(0)
    for _ in range(50):
        H = float(rng.uniform(0.5, 3.0))
        d = float(rng.uniform(0.0, H * 0.99))
        eps = 1e-4 * H
        w_p = kernels.kernel_norm_factor(0.5 * (H + eps), 2) * kernels.cubic_kernel_unnormalized(
            d / (H + eps)
        )
        w_n = kernels.kernel_norm_factor(0.5 * (H - eps), 2) * kernels.cubic_kernel_unnormalized(
            d / (H - eps)
        )
        fd = (float(w_p) - float(w_n)) / (2 * eps)
        an = float(kernels.kernel_dw_dH(d, H, dim=2))
        assert abs(an - fd) < 5e-2 * max(1.0, abs(fd))


def test_optimal_neighbor_number():
    assert abs(kernels.optimal_neighbor_number(2) - (1.9 * 2.0) ** 2) < 1e-6
