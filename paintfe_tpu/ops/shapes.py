"""SDF shape rendering.

Behavioral contract: src/ops/shapes.rs — 17 shape SDFs (:357-847),
coverage = smoothstep(0.5, -0.5, d) when anti-aliased else hard d<0
(:849-858), outline = outer - inner coverage of inset SDF, "Both" mode
blends primary outline over secondary fill (:1260-1289), rasterize into the
rotated AABB + 2px pad with inverse-rotated local coords and pixel centers
at +0.5 (:1169-1305).

All math is vectorized numpy f32 over the pixel grid (host path; shape
rasterization is interactive-tool scale, not the batch hot path).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import numpy as np

f32 = np.float32
TAU = f32(2.0 * np.pi)


class ShapeKind(enum.Enum):
    ELLIPSE = "ellipse"
    RECTANGLE = "rectangle"
    ROUNDED_RECT = "rounded_rect"
    TRAPEZOID = "trapezoid"
    PARALLELOGRAM = "parallelogram"
    TRIANGLE = "triangle"
    RIGHT_TRIANGLE = "right_triangle"
    PENTAGON = "pentagon"
    HEXAGON = "hexagon"
    OCTAGON = "octagon"
    CROSS = "cross"
    CHECK = "check"
    HEART = "heart"
    DIAMOND = "diamond"
    STAR5 = "star5"
    STAR6 = "star6"
    ARROW = "arrow"


class ShapeFillMode(enum.Enum):
    FILLED = "filled"
    OUTLINE = "outline"
    BOTH = "both"


@dataclasses.dataclass
class PlacedShape:
    cx: float
    cy: float
    hw: float
    hh: float
    rotation: float = 0.0
    kind: ShapeKind = ShapeKind.RECTANGLE
    fill_mode: ShapeFillMode = ShapeFillMode.BOTH
    outline_width: float = 3.0
    primary_color: Tuple[int, int, int, int] = (255, 80, 80, 255)
    secondary_color: Tuple[int, int, int, int] = (80, 80, 255, 255)
    anti_alias: bool = True
    corner_radius: float = 0.0


# ---------------------------------------------------------------------------
# SDFs (px, py are arrays; hx, hy scalars)
# ---------------------------------------------------------------------------


def _sdf_box(px, py, hx, hy):
    dx = np.abs(px) - f32(hx)
    dy = np.abs(py) - f32(hy)
    outside = np.sqrt(np.maximum(dx, 0) ** 2 + np.maximum(dy, 0) ** 2, dtype=f32)
    inside = np.minimum(np.maximum(dx, dy), 0)
    return outside + inside


def _sdf_rounded_box(px, py, hx, hy, r):
    r = min(r, hx, hy)
    return _sdf_box(px, py, hx - r, hy - r) - f32(r)


def _sdf_ellipse(px, py, rx, ry):
    nx = px / f32(rx)
    ny = py / f32(ry)
    ln = np.sqrt(nx * nx + ny * ny, dtype=f32)
    safe_ln = np.maximum(ln, 1e-8)
    scale = np.sqrt(f32(rx * rx) * ny * ny + f32(ry * ry) * nx * nx, dtype=f32) / (
        f32(rx * ry) * safe_ln
    )
    d = (ln - f32(1.0)) / np.maximum(scale, 1e-12)
    return np.where(ln < 1e-8, f32(-min(rx, ry)), d)


def _sdf_segment(px, py, ax, ay, bx, by):
    dx = f32(bx - ax)
    dy = f32(by - ay)
    t = np.clip(((px - f32(ax)) * dx + (py - f32(ay)) * dy) / f32(dx * dx + dy * dy), 0.0, 1.0)
    cx = f32(ax) + t * dx
    cy = f32(ay) + t * dy
    return np.sqrt((px - cx) ** 2 + (py - cy) ** 2, dtype=f32)


def _sdf_triangle_box(px, py, hx, hy):
    ax, ay = 0.0, -hy
    bx, by = hx, hy
    cx, cy = -hx, hy
    d = np.minimum(
        _sdf_segment(px, py, ax, ay, bx, by),
        np.minimum(_sdf_segment(px, py, bx, by, cx, cy), _sdf_segment(px, py, cx, cy, ax, ay)),
    )
    c1 = f32(bx - ax) * (py - f32(ay)) - f32(by - ay) * (px - f32(ax))
    c2 = f32(cx - bx) * (py - f32(by)) - f32(cy - by) * (px - f32(bx))
    c3 = f32(ax - cx) * (py - f32(cy)) - f32(ay - cy) * (px - f32(cx))
    inside = ((c1 >= 0) & (c2 >= 0) & (c3 >= 0)) | ((c1 <= 0) & (c2 <= 0) & (c3 <= 0))
    return np.where(inside, -d, d)


def _sdf_convex_polygon(verts, px, py):
    n = len(verts)
    d = (px - f32(verts[0][0])) ** 2 + (py - f32(verts[0][1])) ** 2
    s = np.ones_like(px)
    j = n - 1
    for i in range(n):
        ex = f32(verts[j][0] - verts[i][0])
        ey = f32(verts[j][1] - verts[i][1])
        wx = px - f32(verts[i][0])
        wy = py - f32(verts[i][1])
        t = np.clip((wx * ex + wy * ey) / f32(ex * ex + ey * ey), 0.0, 1.0)
        bx = wx - ex * t
        by = wy - ey * t
        d = np.minimum(d, bx * bx + by * by)
        c1 = py >= f32(verts[i][1])
        c2 = py < f32(verts[j][1])
        c3 = ex * wy > ey * wx
        flip = (c1 & c2 & c3) | (~c1 & ~c2 & ~c3)
        s = np.where(flip, -s, s)
        j = i
    return s * np.sqrt(d, dtype=f32)


def _sdf_polygon(px, py, r, n):
    angle = TAU / f32(n)
    half = angle * f32(0.5)
    theta = np.arctan2(py, px).astype(f32) + f32(np.pi / 2)
    theta = np.mod(np.mod(theta, angle) + angle, angle) - half
    ln = np.sqrt(px * px + py * py, dtype=f32)
    qx = ln * np.cos(theta, dtype=f32)
    return qx - f32(r) * f32(np.cos(half))


def _sdf_polygon_stretched(px, py, hx, hy, n):
    r = max(min(hx, hy), 0.001)
    sx = f32(r / max(hx, 0.001))
    sy = f32(r / max(hy, 0.001))
    return _sdf_polygon(px * sx, py * sy, r, n) / f32(max(sx, sy))


def _sdf_star(px, py, ro, ri, n):
    angle = f32(np.pi) / f32(n)
    theta = np.arctan2(py, px).astype(f32) + f32(np.pi / 2)
    two_a = f32(2.0) * angle
    theta = np.mod(np.mod(theta, two_a) + two_a, two_a)
    ln = np.sqrt(px * px + py * py, dtype=f32)
    cos_a, sin_a = f32(np.cos(angle)), f32(np.sin(angle))
    ax, ay = f32(ro), f32(0.0)
    bx, by = f32(ri) * cos_a, f32(ri) * sin_a
    qx = ln * np.cos(theta - angle, dtype=f32)
    qy = ln * np.sin(theta - angle, dtype=f32)
    ex, ey = bx - ax, by - ay
    fx = qx - ax
    fy = qy - ay
    t = np.clip((fx * ex + fy * ey) / f32(ex * ex + ey * ey), 0.0, 1.0)
    cx = ax + ex * t - qx
    cy = ay + ey * t - qy
    dist = np.sqrt(cx * cx + cy * cy, dtype=f32)
    cross = ex * fy - ey * fx
    return np.where(cross < 0, -dist, dist)


def _sdf_diamond(px, py, hx, hy):
    d = np.abs(px) / f32(hx) + np.abs(py) / f32(hy) - f32(1.0)
    scale = f32(1.0) / f32(np.sqrt(1.0 / (hx * hx) + 1.0 / (hy * hy)))
    return d * scale


def _sdf_cross(px, py, hx, hy):
    return np.minimum(
        _sdf_box(px, py, hx * 0.34, hy), _sdf_box(px, py, hx, hy * 0.34)
    )


def _sdf_check(px, py, hx, hy):
    thickness = f32(min(hx, hy) * 0.2)
    d1 = _sdf_segment(px, py, -hx * 0.7, 0.0, -hx * 0.1, hy * 0.6) - thickness
    d2 = _sdf_segment(px, py, -hx * 0.1, hy * 0.6, hx * 0.8, -hy * 0.7) - thickness
    return np.minimum(d1, d2)


def _sdf_polygon_path(verts, px, py):
    """Scanline inside test + min segment distance (concave-safe)."""
    min_dist = np.full_like(px, np.finfo(np.float32).max)
    inside = np.zeros(px.shape, bool)
    prev = verts[-1]
    for curr in verts:
        min_dist = np.minimum(min_dist, _sdf_segment(px, py, prev[0], prev[1], curr[0], curr[1]))
        crosses = (curr[1] > py) != (prev[1] > py)
        edge_dy = f32(prev[1] - curr[1])
        if abs(edge_dy) > np.finfo(np.float32).eps:
            edge_x = f32(prev[0] - curr[0]) * (py - f32(curr[1])) / edge_dy + f32(curr[0])
            inside ^= crosses & (px < edge_x)
        prev = curr
    return np.where(inside, -min_dist, min_dist)


def _heart_verts(hx, hy):
    ts = np.arange(96, dtype=f32) * TAU / f32(96.0)
    s = np.sin(ts, dtype=f32)
    c = np.cos(ts, dtype=f32)
    xr = f32(16.0) * s * s * s
    yr = (
        f32(13.0) * c
        - f32(5.0) * np.cos(2.0 * ts, dtype=f32)
        - f32(2.0) * np.cos(3.0 * ts, dtype=f32)
        - np.cos(4.0 * ts, dtype=f32)
    )
    sx = f32(hx * 0.98) / np.abs(xr).max() if np.abs(xr).max() > 0 else f32(1.0)
    sy = f32(hy * 0.98) / np.abs(yr).max() if np.abs(yr).max() > 0 else f32(1.0)
    return [(float(x * sx), float(-y * sy)) for x, y in zip(xr, yr)]


def _sdf_heart(px, py, hx, hy):
    verts = _heart_verts(hx, hy)
    return _sdf_polygon_path(verts, px, py + f32(hy * 0.18))


def _sdf_trapezoid(px, py, hx, hy):
    top_hw = hx * 0.55
    return _sdf_convex_polygon(
        [(-top_hw, -hy), (top_hw, -hy), (hx, hy), (-hx, hy)], px, py
    )


def _sdf_parallelogram(px, py, hx, hy):
    skew = hx * 0.3
    return _sdf_convex_polygon(
        [(-hx, -hy), (hx, -hy), (hx + skew, hy), (-hx + skew, hy)], px, py
    )


def _sdf_right_triangle(px, py, hx, hy):
    return _sdf_convex_polygon([(-hx, hy), (hx, hy), (-hx, -hy)], px, py)


def _sdf_arrow(px, py, hx, hy):
    shaft_w = f32(hx * 0.55)
    shaft_h = f32(hy * 0.35)
    head_x = f32(hx * 0.05)
    shaft = _sdf_box(
        px - f32((-hx + shaft_w) * 0.5), py, shaft_w * 0.5 + f32(hx) * 0.25, shaft_h
    )
    tx = px - head_x
    tw = f32(hx) - head_x
    max_y = f32(hy) * (f32(1.0) - tx / tw)
    dy = np.abs(py) - max_y
    nl = f32(np.sqrt(hy * hy + float(tw) * float(tw)))
    dpx = px - f32(hx)
    dpy = np.abs(py)
    to_edge = np.maximum(dpx * (f32(-hy) / nl) + dpy * (tw / nl), 0.0)
    to_tip = np.sqrt(dpx * dpx + dpy * dpy, dtype=f32)
    outside_v = np.minimum(to_edge, to_tip)
    past_tip = np.sqrt((px - f32(hx)) ** 2 + py * py, dtype=f32)
    inside_v = -np.maximum(np.minimum(max_y - np.abs(py), (tw - tx) * f32(hy) / nl), 0.0)
    head = np.where(dy > 0.0, outside_v, np.where(tx > tw, past_tip, inside_v))
    return np.where(px < head_x, shaft, head)


def shape_sdf(kind: ShapeKind, px, py, hx, hy, corner_radius=0.0):
    k = ShapeKind(kind)
    if k == ShapeKind.RECTANGLE:
        return _sdf_box(px, py, hx, hy)
    if k == ShapeKind.ELLIPSE:
        return _sdf_ellipse(px, py, hx, hy)
    if k == ShapeKind.ROUNDED_RECT:
        return _sdf_rounded_box(px, py, hx, hy, corner_radius)
    if k == ShapeKind.TRIANGLE:
        return _sdf_triangle_box(px, py, hx, hy)
    if k == ShapeKind.RIGHT_TRIANGLE:
        return _sdf_right_triangle(px, py, hx, hy)
    if k == ShapeKind.TRAPEZOID:
        return _sdf_trapezoid(px, py, hx, hy)
    if k == ShapeKind.PARALLELOGRAM:
        return _sdf_parallelogram(px, py, hx, hy)
    if k == ShapeKind.DIAMOND:
        return _sdf_diamond(px, py, hx, hy)
    if k == ShapeKind.PENTAGON:
        return _sdf_polygon_stretched(px, py, hx, hy, 5)
    if k == ShapeKind.HEXAGON:
        return _sdf_polygon_stretched(px, py, hx, hy, 6)
    if k == ShapeKind.OCTAGON:
        return _sdf_polygon_stretched(px, py, hx, hy, 8)
    if k == ShapeKind.CROSS:
        return _sdf_cross(px, py, hx, hy)
    if k == ShapeKind.CHECK:
        return _sdf_check(px, py, hx, hy)
    if k == ShapeKind.STAR5:
        r = min(hx, hy)
        return _sdf_star(px, py, r, r * 0.4, 5)
    if k == ShapeKind.STAR6:
        r = min(hx, hy)
        return _sdf_star(px, py, r, r * 0.5, 6)
    if k == ShapeKind.ARROW:
        return _sdf_arrow(px, py, hx, hy)
    if k == ShapeKind.HEART:
        return _sdf_heart(px, py, hx, hy)
    raise ValueError(f"unknown shape kind {kind}")


def _smoothstep(e0, e1, x):
    t = np.clip((x - f32(e0)) / f32(e1 - e0), 0.0, 1.0)
    return t * t * (f32(3.0) - f32(2.0) * t)


def coverage_from_sdf(d, anti_alias: bool):
    if anti_alias:
        return _smoothstep(0.5, -0.5, d)
    return np.where(d < 0.0, f32(1.0), f32(0.0))


def _shape_local_corners(kind: ShapeKind, hw, hh):
    if kind == ShapeKind.PARALLELOGRAM:
        skew = hw * 0.3
        return [(-hw, -hh), (hw, -hh), (hw + skew, hh), (-hw + skew, hh)]
    return [(-hw, -hh), (hw, -hh), (hw, hh), (-hw, hh)]


def rasterize_shape(placed: PlacedShape, canvas_w: int, canvas_h: int):
    """Returns (buf [bh, bw, 4] u8, off_x, off_y)."""
    cos_r = f32(np.cos(f32(placed.rotation)))
    sin_r = f32(np.sin(f32(placed.rotation)))
    corners = _shape_local_corners(ShapeKind(placed.kind), placed.hw, placed.hh)
    xs = [c[0] * cos_r - c[1] * sin_r + placed.cx for c in corners]
    ys = [c[0] * sin_r + c[1] * cos_r + placed.cy for c in corners]
    pad = 2.0
    x0 = max(int(np.floor(min(xs) - pad)), 0)
    y0 = max(int(np.floor(min(ys) - pad)), 0)
    x1 = min(int(np.ceil(max(xs) + pad)), canvas_w)
    y1 = min(int(np.ceil(max(ys) + pad)), canvas_h)
    bw = max(x1 - x0, 0)
    bh = max(y1 - y0, 0)
    if bw == 0 or bh == 0:
        return np.zeros((0, 0, 4), np.uint8), 0, 0

    pxc = (np.arange(x0, x1, dtype=f32) + f32(0.5))[None, :] * np.ones((bh, 1), f32)
    pyc = (np.arange(y0, y1, dtype=f32) + f32(0.5))[:, None] * np.ones((1, bw), f32)
    dx = pxc - f32(placed.cx)
    dy = pyc - f32(placed.cy)
    # inverse rotation = transpose
    lx = dx * cos_r - dy * (-sin_r)
    ly = dx * (-sin_r) + dy * cos_r

    d = shape_sdf(placed.kind, lx, ly, placed.hw, placed.hh, placed.corner_radius)
    aa = placed.anti_alias
    primary = np.asarray(placed.primary_color, f32)
    secondary = np.asarray(placed.secondary_color, f32)
    ow = max(placed.outline_width, 0.0)
    mode = ShapeFillMode(placed.fill_mode)

    if mode == ShapeFillMode.FILLED:
        cov = coverage_from_sdf(d, aa)
        color = np.broadcast_to(primary, (bh, bw, 4))
    elif mode == ShapeFillMode.OUTLINE:
        cov = np.clip(coverage_from_sdf(d, aa) - coverage_from_sdf(d + f32(ow), aa), 0.0, 1.0)
        color = np.broadcast_to(primary, (bh, bw, 4))
    else:  # BOTH: outline (primary) over fill (secondary)
        fill_cov = coverage_from_sdf(d, aa)
        outline_cov = np.clip(fill_cov - coverage_from_sdf(d + f32(ow), aa), 0.0, 1.0)
        oa = outline_cov
        fa = fill_cov * (f32(1.0) - oa)
        total = oa + fa
        safe = np.maximum(total, 1e-12)
        mixed = (primary[None, None, :] * oa[..., None] + secondary[None, None, :] * fa[..., None]) / safe[..., None]
        has_outline = outline_cov > 0.001
        color = np.where(
            has_outline[..., None],
            mixed.astype(f32).astype(np.uint8).astype(f32),  # truncating as u8
            np.broadcast_to(secondary, (bh, bw, 4)),
        )
        cov = np.where(has_outline, np.where(total > 0.0, total, 0.0), fill_cov)

    buf = np.zeros((bh, bw, 4), np.uint8)
    visible = cov > 0.001
    a = np.minimum(np.floor(color[..., 3] * cov + f32(0.5)), 255.0)
    out = np.concatenate(
        [color[..., 0:3].astype(np.uint8), a[..., None].astype(np.uint8)], axis=-1
    )
    buf = np.where(visible[..., None], out, buf)
    return buf, x0, y0


def rasterize_to_canvas(placed: PlacedShape, w: int, h: int) -> np.ndarray:
    """Composite the rasterized buffer onto a transparent canvas (writes only
    alpha>0 pixels, like the reference test helper)."""
    buf, off_x, off_y = rasterize_shape(placed, w, h)
    canvas = np.zeros((h, w, 4), np.uint8)
    bh, bw = buf.shape[:2]
    if bh and bw:
        region = canvas[off_y : off_y + bh, off_x : off_x + bw]
        write = buf[..., 3] > 0
        region[...] = np.where(write[..., None], buf, region)
    return canvas
