"""ctypes wrapper for the native C++ rasterizer (native/rasterizer.cpp).

Builds the shared library on first use (g++ is in the image); falls back to a
vectorized numpy rasterizer when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librasterizer.so")
_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "rasterizer.cpp")
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.fill_canvas.argtypes = [f32p, ctypes.c_int, ctypes.c_int] + [ctypes.c_float] * 3
        lib.draw_circles.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
            ctypes.c_long, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        lib.draw_lines.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_long,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def new_canvas(width: int, height: int, color=(1.0, 1.0, 1.0)) -> np.ndarray:
    img = np.empty((height, width, 3), np.float32)
    img[:] = color
    return img


def draw_circles(img, pos, radius, rgb, scale, border_frac=0.1, border=(0.0, 0.0, 0.0)):
    """Filled circles + border stroke, painter's order (cairo_renderer.rs:94-106)."""
    pos = np.ascontiguousarray(pos, np.float32)
    radius = np.ascontiguousarray(radius, np.float32)
    rgb = np.ascontiguousarray(rgb, np.float32)
    lib = _load()
    H, W, _ = img.shape
    if lib is not None:
        lib.draw_circles(
            img, W, H, pos, radius, rgb, len(pos), float(scale), float(border_frac), *border
        )
        return img
    # numpy fallback (slow path, loops per circle)
    for i in range(len(pos)):
        cx, cy = 0.5 * W + pos[i, 0] * scale, 0.5 * H - pos[i, 1] * scale
        rr = radius[i] * scale
        bw = rr * border_frac
        rout, rin = rr + 0.5 * bw, rr - 0.5 * bw
        x0, x1 = max(0, int(cx - rout - 1)), min(W - 1, int(np.ceil(cx + rout + 1)))
        y0, y1 = max(0, int(cy - rout - 1)), min(H - 1, int(np.ceil(cy + rout + 1)))
        if x1 < x0 or y1 < y0:
            continue
        ys, xs = np.mgrid[y0 : y1 + 1, x0 : x1 + 1]
        d = np.hypot(xs + 0.5 - cx, ys + 0.5 - cy)
        cov_fill = np.clip(0.5 - (d - rr), 0, 1)[..., None]
        cov_ring = (np.clip(0.5 - (d - rout), 0, 1) * np.clip(0.5 - (rin - d), 0, 1))[..., None]
        tile = img[y0 : y1 + 1, x0 : x1 + 1]
        tile += (rgb[i] - tile) * cov_fill
        tile += (np.asarray(border, np.float32) - tile) * cov_ring
    return img


def draw_lines(img, segs, scale, width_world, color=(0.0, 0.0, 0.0)):
    """Boundary segments (cairo_renderer.rs:66-90); width in world units (5/1000)."""
    segs = np.ascontiguousarray(segs, np.float32).reshape(-1, 4)
    lib = _load()
    H, W, _ = img.shape
    if lib is not None:
        lib.draw_lines(img, W, H, segs, len(segs), float(scale), float(width_world), *color)
        return img
    hw = 0.5 * width_world * scale
    for x0w, y0w, x1w, y1w in segs:
        ax, ay = 0.5 * W + x0w * scale, 0.5 * H - y0w * scale
        bx, by = 0.5 * W + x1w * scale, 0.5 * H - y1w * scale
        x0, x1 = int(max(0, min(ax, bx) - hw - 1)), int(min(W - 1, max(ax, bx) + hw + 1))
        y0, y1 = int(max(0, min(ay, by) - hw - 1)), int(min(H - 1, max(ay, by) + hw + 1))
        if x1 < x0 or y1 < y0:
            continue
        ys, xs = np.mgrid[y0 : y1 + 1, x0 : x1 + 1]
        ux, uy = bx - ax, by - ay
        len2 = max(ux * ux + uy * uy, 1e-12)
        t = np.clip(((xs + 0.5 - ax) * ux + (ys + 0.5 - ay) * uy) / len2, 0, 1)
        d = np.hypot(xs + 0.5 - ax - t * ux, ys + 0.5 - ay - t * uy)
        cov = np.clip(0.5 - (d - hw), 0, 1)[..., None]
        tile = img[y0 : y1 + 1, x0 : x1 + 1]
        tile += (np.asarray(color, np.float32) - tile) * cov
    return img


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
