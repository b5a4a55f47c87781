"""Golden tests for the semi-analytic boundary integral lambda / dlambda.

Reference: plane_numerics.rs:180-300 — Maxima golden values at 1e-8 tolerance,
finite-difference consistency, and numeric integration of the kernel behind a plane.
"""

import numpy as np

from adaptive_sph_tpu.ops import boundary_lambda as bl
from adaptive_sph_tpu.ops import kernels

LAMBDA2_GOLDEN = [
    (1.0e-5, 0.4999863581477375),
    (0.1, 0.3660454031974235),
    (0.2, 0.2458568798927798),
    (0.3, 0.1492433688434099),
    (0.475, 0.04601588929110174),
    (0.5, 0.03744216427059437),
    (0.6, 0.01442031051340694),
    (0.7, 0.00413432923941152),
    (0.8, 6.949615905699156e-4),
    (0.9, 3.190640160164168e-5),
    (1.0, 0.0),
]

DLAMBDA2_GOLDEN = [
    (1.0e-5, -1.364185225745495),
    (0.1, -1.291255734976317),
    (0.2, -1.09590958428671),
    (0.3, -0.8294373145386852),
    (0.475, -0.3694455226951835),
    (0.49999999, -0.3172459084022253),
    (0.5, -0.3172458884798477),
    (0.6, -0.1553847490374719),
    (0.7, -0.06022919733948317),
    (0.8, -0.01536108745740005),
    (0.9, -0.001424092559566546),
    (0.9999999999, -1.37123132821062e-10),
]


def test_lambda2_specific_values():
    for x, y in LAMBDA2_GOLDEN:
        assert abs(float(bl.lambda2(x)) - y) < 1e-8, (x, float(bl.lambda2(x)), y)


def test_dlambda2_specific_values():
    for x, y in DLAMBDA2_GOLDEN:
        got = float(bl.dlambda2(x))
        assert abs(got - y) < 1e-7, (x, got, y)


def test_lambda2_negative_mirror():
    for x, y in LAMBDA2_GOLDEN:
        assert abs(float(bl.lambda2(-x)) - (1.0 - y)) < 1e-8


def test_dlambda2_finite_diffs():
    # reference checks 600k points; a 30k subsample at the same tolerance scale
    steps = 15000
    eps = 1e-7
    xs = np.arange(-steps, steps + 1, dtype=np.float64) / steps
    # exclude the branch seams where the closed form is locally undefined
    seam = (np.abs(np.abs(xs) - 0.5) < 1e-4) | (np.abs(xs) < 1e-4) | (np.abs(np.abs(xs) - 1.0) < 1e-4)
    xs = xs[~seam]
    numeric = (bl.lambda2(xs + eps) - bl.lambda2(xs - eps)) / (2 * eps)
    analytic = bl.dlambda2(xs)
    assert np.max(np.abs(numeric - analytic)) < 1e-5


def test_lambda2_vs_numeric_integration():
    # Integrate the 2D cubic kernel behind a plane at distance d (plane_numerics.rs:263-300)
    h = 1.0
    support_radius = 2.0 * h
    grid = 350
    square_len = 2.0 * support_radius / grid
    square_area = square_len**2

    xs = (np.arange(grid) + 0.5) * square_len - support_radius
    gx, gy = np.meshgrid(xs, xs)
    r = np.sqrt(gx**2 + gy**2)
    w = np.asarray(kernels.kernel_w(r, h, dim=2), dtype=np.float64)
    top = gy + 0.5 * square_len
    bottom = gy - 0.5 * square_len

    for step in range(-12, 13):
        d = (step / 10.0) * h
        frac = np.clip((top - d) / (top - bottom), 0.0, 1.0)
        integral = float(np.sum(w * frac * square_area))
        analytic = float(bl.lambda2(d / support_radius))
        assert abs(integral - analytic) < 1e-4, (d, integral, analytic)


def test_lut_matches_closed_form():
    lam_t, dlam_t = bl.lut_tables()
    xs = np.linspace(-0.999, 0.999, 4001)
    lut_lam = np.asarray(bl.lut_lookup(lam_t, xs))
    lut_dlam = np.asarray(bl.lut_lookup(dlam_t, xs))
    assert np.max(np.abs(lut_lam - bl.lambda2(xs))) < 2e-5
    assert np.max(np.abs(lut_dlam - bl.dlambda2(xs))) < 2e-4


def test_poly_path_matches_lut():
    """The gather-free runtime path must match the reference-parity LUT to f32 ulps."""
    import jax.numpy as jnp

    from adaptive_sph_tpu.ops import boundary_lambda as bl

    xs = jnp.asarray(np.linspace(-1.0, 0.9999999, 200001).astype(np.float32))
    lam_t, dlam_t = bl.lut_tables()
    l_lut = np.asarray(bl.lut_lookup(lam_t, xs))
    d_lut = np.asarray(bl.lut_lookup(dlam_t, xs))
    l_p, d_p = (np.asarray(a) for a in bl.lambda_dlambda_poly(xs))
    assert np.max(np.abs(l_p - l_lut)) < 1e-6
    assert np.max(np.abs(d_p - d_lut)) < 1e-6
