"""SDF probe tests: plane half-spaces and the polygon box (sdf_plane.rs, sdf2d.rs)."""

import jax.numpy as jnp
import numpy as np

from adaptive_sph_tpu.ops import sdf


def test_plane_box_probe():
    planes = sdf.boundary_box_planes((-1.0, -1.0), (1.0, 1.0))
    x = jnp.asarray([[0.0, 0.0], [0.9, 0.0], [-1.5, 0.0]], dtype=jnp.float32)
    d = sdf.probe_all(planes, x)
    assert d.shape == (3, 4)
    # center: distance 1 to every wall
    np.testing.assert_allclose(np.asarray(d[0]), [1.0, 1.0, 1.0, 1.0], atol=1e-6)
    # near right wall: min distance 0.1 (plane -x + 1)
    assert abs(float(jnp.min(d[1])) - 0.1) < 1e-6
    # outside left wall: negative distance for the x>=-1 plane
    assert float(d[2, 0]) < 0.0


def test_polygon_box_probe_matches_planes_inside():
    box_min, box_max = (-1.0, -1.0), (1.0, 1.0)
    poly = sdf.boundary_box_polygon(box_min, box_max)
    planes = sdf.boundary_box_planes(box_min, box_max)

    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.95, 0.95, size=(256, 2)).astype(np.float32)
    d_poly = np.asarray(poly.probe(jnp.asarray(pts)))
    d_planes = np.asarray(jnp.min(sdf.probe_all(planes, jnp.asarray(pts)), axis=-1))
    # inside the box, the polygon distance equals the nearest-wall distance
    np.testing.assert_allclose(d_poly, d_planes, atol=1e-5)


def test_polygon_probe_outside_corner():
    poly = sdf.boundary_box_polygon((-1.0, -1.0), (1.0, 1.0))
    # outside past the corner: distance is negative (inside the solid) euclidean to corner
    d = float(poly.probe(jnp.asarray([[1.3, 1.4]], dtype=jnp.float32))[0])
    assert abs(d - (-np.hypot(0.3, 0.4))) < 1e-5


def test_polygon_gradient_points_inward():
    poly = sdf.boundary_box_polygon((-1.0, -1.0), (1.0, 1.0))
    x = jnp.asarray([[0.9, 0.0]], dtype=jnp.float32)
    g = np.asarray(poly.gradient(x, eps=1e-4))[0]
    g = g / np.linalg.norm(g)
    # nearest wall is x=+1; inward (air) direction is -x
    np.testing.assert_allclose(g, [-1.0, 0.0], atol=1e-3)
