"""Particle-field rendering to PNG: the render2d pipeline.

Reference parity: cairo_renderer.rs:19-219 — white canvas, world scale
min(W,H)/(2*zoom_out) centered at the origin with y up, boundary lines (width 5/1000),
filled circles at physical radius r(m/rho0) with a black border of 0.1*r, gradient
legend with labeled stops, and a title with `#p` particle-count substitution.

Circle/line rasterization runs in native C++ (utils/raster.py); legend gradient and
text are composed with PIL.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ..models import boundary as bnd
from ..ops import kernels
from . import raster
from .colors import ColorMap

SCENE_WIDTH = 2.0  # cairo_renderer.rs:45


def _font(size: int):
    try:
        return ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size
        )
    except Exception:
        return ImageFont.load_default()


def boundary_segments(boundary_handler) -> np.ndarray:
    """World-space line segments for the boundary (cairo_renderer.rs:56-92)."""
    from ..ops.sdf import SdfPlane, SdfPolygon2D

    segs = []
    if isinstance(boundary_handler, bnd.WinchenbachBoundary):
        for s in boundary_handler.sdfs:
            if isinstance(s, SdfPlane):
                # two points at distance 5 along the plane (sdf_plane.rs:22-28)
                d = np.asarray(s.direction, np.float64)
                line_dir = np.asarray([-d[1], d[0]])
                # plane point: probe(x)=0 -> x = -delta*dir
                center = d * s.delta
                a = center + line_dir * 2.5
                b = center - line_dir * 2.5
                segs.append([a[0], a[1], b[0], b[1]])
            elif isinstance(s, SdfPolygon2D):
                for (a, b) in s.draw_lines():
                    segs.append([a[0], a[1], b[0], b[1]])
    return np.asarray(segs, np.float32).reshape(-1, 4)


def render2d(
    positions: np.ndarray,
    masses: np.ndarray,
    rest_density: float,
    colors: np.ndarray,
    boundary_handler,
    img_width: int = 2000,
    img_height: int = 2000,
    legend: Optional[dict] = None,  # {color_map, text_right, only_min_max}
    title: Optional[str] = None,
    zoom_out: float = 1.04,
) -> np.ndarray:
    """Returns an (H, W, 3) uint8 image."""
    img = raster.new_canvas(img_width, img_height)
    scale = min(img_width, img_height) / (SCENE_WIDTH * zoom_out)

    segs = boundary_segments(boundary_handler)
    if len(segs):
        raster.draw_lines(img, segs, scale, width_world=5.0 / 1000.0)

    # NOTE: the plane-point of sdf_plane.rs is dir*delta; our boundary planes point
    # inward with probe = dot(dir,x)+delta = 0 at x = -delta*dir. boundary_segments
    # already accounts for this sign through the reference's own convention
    # (get_two_points_with_distance uses dir*delta verbatim, which for the reference's
    # boundary boxes lands on the opposite wall of the symmetric box — identical set).

    radii = np.asarray(
        kernels.sphere_volume_to_radius(np.asarray(masses, np.float64) / rest_density, 2),
        np.float32,
    )
    raster.draw_circles(img, positions, radii, colors.astype(np.float32), scale)

    out = Image.fromarray(raster.to_uint8(img))
    draw = ImageDraw.Draw(out)

    if legend is not None:
        cm: ColorMap = legend["color_map"]
        lx, ly = img_width * 0.83, img_height * 0.5
        lw, lh = img_width * 0.07, img_height * 0.3
        vmin, vmax = float(cm.xs[0]), float(cm.xs[-1])
        # the reference paints the gradient in cairo's flipped frame: the box occupies
        # screen rows [H - (ly + lh), H - ly] with the value increasing upward
        # (cairo_renderer.rs:117-140); labels use yc = H - (ly + interp*lh)
        top = img_height - (ly + lh)
        grad_rows = np.linspace(vmax, vmin, int(lh))  # top row = vmax
        grad = cm.get(grad_rows)  # (lh, 3)
        grad_img = np.repeat(grad[:, None, :], int(lw), axis=1)
        out.paste(Image.fromarray((np.clip(grad_img, 0, 1) * 255).astype(np.uint8)), (int(lx), int(top)))
        draw.rectangle([lx, top, lx + lw, top + lh], outline=(0, 0, 0), width=3)

        font = _font(int(img_height * 0.04))
        stops = [vmin, vmax] if legend.get("only_min_max") else [float(x) for x in cm.xs]
        ind = img_width * 0.01
        for v in stops:
            interp = (v - vmin) / (vmax - vmin) if vmax > vmin else 0.0
            # cairo flips y for the legend: ycenter = H - (ly + interp*lh)
            yc = img_height - (ly + interp * lh)
            label = f"{round(v * 1000.0) / 1000.0:g}"
            tw = draw.textlength(label, font=font)
            if legend.get("text_right"):
                draw.line([lx + lw, yc, lx + lw + ind, yc], fill=(0, 0, 0), width=3)
                draw.text((lx + lw + ind + img_width * 0.008, yc), label, fill=(0, 0, 0),
                          font=font, anchor="lm")
            else:
                draw.line([lx - ind, yc, lx, yc], fill=(0, 0, 0), width=3)
                draw.text((lx - ind - img_width * 0.008 - tw, yc), label, fill=(0, 0, 0),
                          font=font, anchor="lm")

    if title is not None:
        t = title.replace("#p", str(len(positions)))
        font = _font(int(img_width * 0.048))
        x, y = img_width * 0.02, img_height * 0.01
        draw.text((x, y), t, fill=(0, 0, 0), font=font,
                  stroke_width=int(img_height * 0.006), stroke_fill=(255, 255, 255))

    return np.asarray(out)


def save_png(img: np.ndarray, path: str):
    Image.fromarray(img).save(path)
