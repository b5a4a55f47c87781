"""Signed-distance-field geometry, vectorized over particle batches.

Reference parity: /root/reference/src/simulation/sdf/
  - SdfPlane: half-space dot(dir, x) + delta        (sdf_plane.rs:31-38)
  - boundary box = 4 planes                         (sdf_plane.rs:13-20)
  - Sdf2D: polygon with pseudo-normal sign test      (sdf2d.rs:36-210)
  - central finite-difference gradient               (sdf.rs:50-62)

Geometry is static per scene; each shape exposes a vectorized `probe(x)` over an
(N, 2) batch of query points. Planes use their exact gradient (the finite difference
of a linear function, without the f32 cancellation noise); polygons use the same
central finite differences as the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SdfPlane:
    """Half space: probe(x) = dot(dir, x) + delta (negative inside the boundary solid)."""

    direction: tuple  # (D,)
    delta: float

    def probe(self, x):
        d = jnp.asarray(np.asarray(self.direction, dtype=np.float32))
        return x @ d + jnp.float32(self.delta)

    def gradient(self, x, eps: float):
        d = np.asarray(self.direction, dtype=np.float32)
        return jnp.broadcast_to(jnp.asarray(d), x.shape)


def boundary_box_planes(box_min, box_max) -> list[SdfPlane]:
    """4 half-spaces enclosing [min, max]; the 'AnalyticOverestimate' decomposition.

    sdf_plane.rs:13-20 — overlapping corners are counted once per plane, which
    overestimates the boundary volume there (simulation.rs:3186-3199).
    """
    (minx, miny), (maxx, maxy) = box_min, box_max
    return [
        SdfPlane((1.0, 0.0), -minx),
        SdfPlane((-1.0, 0.0), maxx),
        SdfPlane((0.0, 1.0), -miny),
        SdfPlane((0.0, -1.0), maxy),
    ]


@dataclasses.dataclass(frozen=True)
class SdfPolygon2D:
    """Closed polygon; air on the left of each directed edge (sdf2d.rs:4-15).

    points: tuple of (x, y) vertices; edges are (i, i+1 mod n).
    """

    points: tuple

    def _geometry(self):
        pts = np.asarray(self.points, dtype=np.float32)  # (P, 2)
        nxt = np.roll(pts, -1, axis=0)
        line_dir = nxt - pts
        line_len = np.linalg.norm(line_dir, axis=-1)
        assert np.all(line_len > 1e-5)
        line_dir = line_dir / line_len[:, None]
        # rotate_left_90_degrees (sdf2d.rs:32-34)
        left = np.stack([-line_dir[:, 1], line_dir[:, 0]], axis=-1)
        prev_left = np.roll(left, 1, axis=0)
        pseudo_normal = prev_left + left  # (sdf2d.rs:48-61)
        assert np.all(np.sum(pseudo_normal**2, axis=-1) > 1e-5)
        return pts, line_dir, line_len, left, pseudo_normal

    def probe(self, x):
        """Exact signed distance to the polygon; negative inside the solid (right side).

        Vectorization of sdf2d.rs:71-141: for each edge we evaluate a line candidate
        (valid when the projection falls strictly inside the segment) and a corner
        candidate; the overall winner is the first strict minimum of squared distance
        in edge order, line candidate before corner candidate — reproduced here by an
        interleaved argmin (jnp.argmin returns the first occurrence).
        """
        pts, line_dir, line_len, left, pseudo_normal = self._geometry()
        pts_j = jnp.asarray(pts)
        ld = jnp.asarray(line_dir)
        ll2 = jnp.asarray(line_len**2)
        ln = jnp.asarray(left)
        pn = jnp.asarray(pseudo_normal)

        # x: (N, 2) -> point_dir: (N, P, 2)
        x = jnp.atleast_2d(x)
        pd = x[:, None, :] - pts_j[None, :, :]
        proj = jnp.einsum("npd,pd->np", pd, ld)
        line_valid = (proj > 0.0) & (proj * proj < ll2[None, :])
        line_dist = jnp.einsum("npd,pd->np", pd, ln)  # signed, positive = air side
        line_key = jnp.where(line_valid, line_dist * line_dist, jnp.inf)

        corner_key = jnp.sum(pd * pd, axis=-1)
        corner_sign = jnp.where(jnp.einsum("npd,pd->np", pd, pn) >= 0.0, 1.0, -1.0)
        corner_dist = corner_sign * jnp.sqrt(corner_key)

        # interleave [line_0, corner_0, line_1, corner_1, ...] to match iteration order
        keys = jnp.stack([line_key, corner_key], axis=-1).reshape(x.shape[0], -1)
        vals = jnp.stack([line_dist, corner_dist], axis=-1).reshape(x.shape[0], -1)
        winner = jnp.argmin(keys, axis=-1)
        return jnp.take_along_axis(vals, winner[:, None], axis=-1)[:, 0]

    def gradient(self, x, eps: float):
        """Central finite differences (sdf.rs:50-62); NOT normalized."""
        inv_2eps = 1.0 / (2.0 * eps)
        ex = jnp.asarray([eps, 0.0], dtype=x.dtype)
        ey = jnp.asarray([0.0, eps], dtype=x.dtype)
        gx = (self.probe(x + ex) - self.probe(x - ex)) * inv_2eps
        gy = (self.probe(x + ey) - self.probe(x - ey)) * inv_2eps
        return jnp.stack([gx, gy], axis=-1)

    def draw_lines(self):
        """(start, end) vertex pairs for rendering (sdf2d.rs:167-180)."""
        pts = np.asarray(self.points, dtype=np.float32)
        nxt = np.roll(pts, -1, axis=0)
        return list(zip(pts.tolist(), nxt.tolist()))


def boundary_box_polygon(box_min, box_max) -> SdfPolygon2D:
    """Single-polygon box; the 'AnalyticUnderestimate' decomposition (sdf2d.rs:153-164)."""
    (minx, miny), (maxx, maxy) = box_min, box_max
    return SdfPolygon2D(points=((minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)))


def probe_all(sdfs: Sequence, x):
    """Stack probes of every shape: (N, S)."""
    return jnp.stack([s.probe(x) for s in sdfs], axis=-1)


def gradient_all(sdfs: Sequence, x, eps: float):
    """Stack (un-normalized) gradients of every shape: (N, S, 2)."""
    return jnp.stack([s.gradient(x, eps) for s in sdfs], axis=-2)
