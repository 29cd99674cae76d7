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
    custom_shape_data: Optional["CustomShapeData"] = None


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


# ---------------------------------------------------------------------------
# Custom SVG-path shapes (shapes.rs:27-122 parse/flatten, :1065-1160 coverage)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CustomShapeData:
    """A user shape imported from an SVG <path>: the path flattened to
    polylines (tolerance 0.5, like the reference's kurbo::flatten call) plus
    its bounding box.  Rasterization is point-in-polygon (even-odd) with a
    4-point supersample, not an SDF (shapes.rs:1088-1120)."""

    name: str
    category: str
    svg_path_data: str
    polylines: list
    bounds: Tuple[float, float, float, float]


class SvgPathError(ValueError):
    pass


def extract_svg_path_data(svg: str) -> str:
    """Pull every <path d="..."> out of an SVG document (shapes.rs:27-58)."""
    if "<image" in svg or "data:image" in svg:
        raise SvgPathError("Embedded raster images are not supported.")
    paths = []
    rest = svg
    while True:
        idx = rest.find("<path")
        if idx < 0:
            break
        rest = rest[idx + 5:]
        end = rest.find(">")
        if end < 0:
            break
        tag = rest[:end]
        for pat in ('d="', "d='"):
            d_idx = tag.find(pat)
            if d_idx >= 0:
                quote = pat[2]
                start = d_idx + len(pat)
                data_end = tag[start:].find(quote)
                if data_end >= 0:
                    d = tag[start:start + data_end].strip()
                    if d:
                        paths.append(d)
        rest = rest[end + 1:]
    if not paths:
        raise SvgPathError('SVG must contain at least one <path d="...">.')
    return " ".join(paths)


def _svg_tokens(d: str):
    """Yield SVG path commands and floats.

    Lexing is command-aware because the SVG grammar makes the arc flags
    (operands 4 and 5 of A/a) single '0'/'1' CHARACTERS that need no
    separator from the following number — minified paths write
    'a1 1 0 011 0' meaning flags 0,1 then x=1 y=0.  A greedy number regex
    would lex '011' as 11.0 and shift every later operand."""
    import re

    num = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")
    i = 0
    n = len(d)
    cmd = None
    operand = 0
    while i < n:
        ch = d[i]
        if ch in " \t\r\n,":
            i += 1
            continue
        if ch in "MmLlHhVvCcSsQqTtAaZz":
            cmd = ch
            operand = 0
            i += 1
            yield ch
            continue
        if cmd in ("A", "a") and operand % 7 in (3, 4) and ch in "01":
            yield float(ch)
            operand += 1
            i += 1
            continue
        m = num.match(d, i)
        if m is None:
            i += 1  # skip unrecognized characters (previous behavior)
            continue
        yield float(m.group(0))
        operand += 1
        i = m.end()


def _flatten_cubic(p0, p1, p2, p3, tol, out, depth=0):
    # adaptive subdivision: flat when control points are within tol of the chord
    d1 = abs((p1[0] - p3[0]) * (p3[1] - p0[1]) - (p1[1] - p3[1]) * (p3[0] - p0[0]))
    d2 = abs((p2[0] - p3[0]) * (p3[1] - p0[1]) - (p2[1] - p3[1]) * (p3[0] - p0[0]))
    chord2 = (p3[0] - p0[0]) ** 2 + (p3[1] - p0[1]) ** 2
    if depth >= 16 or (d1 + d2) ** 2 <= 4.0 * tol * tol * max(chord2, 1e-12):
        out.append(p3)
        return
    mid = lambda a, b: ((a[0] + b[0]) * 0.5, (a[1] + b[1]) * 0.5)
    p01, p12, p23 = mid(p0, p1), mid(p1, p2), mid(p2, p3)
    p012, p123 = mid(p01, p12), mid(p12, p23)
    c = mid(p012, p123)
    _flatten_cubic(p0, p01, p012, c, tol, out, depth + 1)
    _flatten_cubic(c, p123, p23, p3, tol, out, depth + 1)


def _quad_to_cubic(p0, q, p1):
    return (
        (p0[0] + 2.0 / 3.0 * (q[0] - p0[0]), p0[1] + 2.0 / 3.0 * (q[1] - p0[1])),
        (p1[0] + 2.0 / 3.0 * (q[0] - p1[0]), p1[1] + 2.0 / 3.0 * (q[1] - p1[1])),
    )


def _arc_to_points(p0, rx, ry, xrot, large, sweep, p1, tol, out):
    """Elliptical arc (SVG F.6.5 center parameterization) flattened to lines."""
    import math

    if rx == 0 or ry == 0 or p0 == p1:
        out.append(p1)
        return
    rx, ry = abs(rx), abs(ry)
    phi = math.radians(xrot)
    cphi, sphi = math.cos(phi), math.sin(phi)
    dx2, dy2 = (p0[0] - p1[0]) / 2.0, (p0[1] - p1[1]) / 2.0
    x1p = cphi * dx2 + sphi * dy2
    y1p = -sphi * dx2 + cphi * dy2
    lam = (x1p / rx) ** 2 + (y1p / ry) ** 2
    if lam > 1.0:
        s = math.sqrt(lam)
        rx, ry = rx * s, ry * s
    num = rx * rx * ry * ry - rx * rx * y1p * y1p - ry * ry * x1p * x1p
    den = rx * rx * y1p * y1p + ry * ry * x1p * x1p
    co = math.sqrt(max(num / den, 0.0)) * (1.0 if large != sweep else -1.0)
    cxp, cyp = co * rx * y1p / ry, -co * ry * x1p / rx
    cx = cphi * cxp - sphi * cyp + (p0[0] + p1[0]) / 2.0
    cy = sphi * cxp + cphi * cyp + (p0[1] + p1[1]) / 2.0

    def angle(ux, uy, vx, vy):
        dot = ux * vx + uy * vy
        n = math.sqrt((ux * ux + uy * uy) * (vx * vx + vy * vy))
        a = math.acos(max(-1.0, min(1.0, dot / max(n, 1e-12))))
        return -a if ux * vy - uy * vx < 0 else a

    th1 = angle(1.0, 0.0, (x1p - cxp) / rx, (y1p - cyp) / ry)
    dth = angle((x1p - cxp) / rx, (y1p - cyp) / ry, (-x1p - cxp) / rx, (-y1p - cyp) / ry)
    if not sweep and dth > 0:
        dth -= 2.0 * math.pi
    elif sweep and dth < 0:
        dth += 2.0 * math.pi
    n_seg = max(int(math.ceil(abs(dth) / (math.pi / 16.0))), 1)
    for k in range(1, n_seg + 1):
        th = th1 + dth * k / n_seg
        ex = cx + rx * math.cos(th) * cphi - ry * math.sin(th) * sphi
        ey = cy + rx * math.cos(th) * sphi + ry * math.sin(th) * cphi
        out.append((ex, ey))


def _cubic_bbox_update(bbox, p0, p1, p2, p3):
    """Grow bbox by a cubic's EXACT extent (endpoints + derivative roots),
    matching kurbo's bounding_box computed before flattening."""
    for axis in (0, 1):
        v0, v1, v2, v3 = p0[axis], p1[axis], p2[axis], p3[axis]
        bbox[axis] = min(bbox[axis], v0, v3)
        bbox[axis + 2] = max(bbox[axis + 2], v0, v3)
        # B'(t) = At^2 + Bt + C
        A = 3.0 * (-v0 + 3.0 * v1 - 3.0 * v2 + v3)
        B = 6.0 * (v0 - 2.0 * v1 + v2)
        C = 3.0 * (v1 - v0)
        roots = []
        if abs(A) < 1e-12:
            if abs(B) > 1e-12:
                roots.append(-C / B)
        else:
            disc = B * B - 4.0 * A * C
            if disc >= 0.0:
                sq = disc ** 0.5
                roots.extend(((-B + sq) / (2.0 * A), (-B - sq) / (2.0 * A)))
        for t in roots:
            if 0.0 < t < 1.0:
                mt = 1.0 - t
                v = (mt * mt * mt * v0 + 3.0 * mt * mt * t * v1
                     + 3.0 * mt * t * t * v2 + t * t * t * v3)
                bbox[axis] = min(bbox[axis], v)
                bbox[axis + 2] = max(bbox[axis + 2], v)


def parse_svg_path(d: str, tol: float = 0.5, bbox_out=None):
    """SVG path data -> list of polylines (each a list of (x, y)).

    Supports M/L/H/V/C/S/Q/T/A/Z in absolute and relative form; curves are
    flattened at `tol` like the reference's kurbo::flatten(0.5) call
    (shapes.rs:81).  `bbox_out` (a 4-list [minx, miny, maxx, maxy]) is
    grown with the EXACT curve extents (cubic/quadratic derivative
    extrema) like kurbo's pre-flatten bounding_box — the flattened
    polyline alone undershoots curve bulges by up to `tol`.  Arcs
    contribute their flattened points (they are emitted as samples, not
    cubics, here)."""
    toks = list(_svg_tokens(d))
    polylines = []
    current: list = []
    pos = (0.0, 0.0)
    start = None
    prev_cubic_ctrl = None
    prev_quad_ctrl = None
    i = 0
    cmd = None

    def take(n):
        nonlocal i
        vals = toks[i:i + n]
        if len(vals) != n or any(isinstance(v, str) for v in vals):
            raise SvgPathError(f"malformed path near token {i}")
        i += n
        return vals

    def finish_open():
        nonlocal current
        if len(current) > 1:
            polylines.append(current)
        current = []

    while i < len(toks):
        t = toks[i]
        if isinstance(t, str):
            cmd = t
            i += 1
            if cmd in "Zz":
                if start is not None and current:
                    current.append(start)
                if len(current) > 1:
                    polylines.append(current)
                pos = start if start is not None else pos
                # SVG spec: a drawing command straight after Z starts a
                # new subpath AT THE CLOSEPOINT (which also stays the
                # initial point for a further Z) — kurbo does this; an
                # empty `current` here dropped the first post-Z segment
                current = [pos]
                prev_cubic_ctrl = prev_quad_ctrl = None
                continue
        elif cmd is None:
            raise SvgPathError("path must start with a command")
        rel = cmd.islower()
        c = cmd.upper()
        ox, oy = (pos if rel else (0.0, 0.0))
        if c == "M":
            x, y = take(2)
            finish_open()
            pos = (x + ox, y + oy)
            start = pos
            current = [pos]
            cmd = "l" if rel else "L"  # subsequent pairs are implicit lineto
            prev_cubic_ctrl = prev_quad_ctrl = None
        elif c == "L":
            x, y = take(2)
            pos = (x + ox, y + oy)
            current.append(pos)
            prev_cubic_ctrl = prev_quad_ctrl = None
        elif c == "H":
            (x,) = take(1)
            pos = (x + ox, pos[1])
            current.append(pos)
            prev_cubic_ctrl = prev_quad_ctrl = None
        elif c == "V":
            (y,) = take(1)
            pos = (pos[0], y + oy)
            current.append(pos)
            prev_cubic_ctrl = prev_quad_ctrl = None
        elif c in ("C", "S"):
            if c == "C":
                x1, y1, x2, y2, x, y = take(6)
                p1 = (x1 + ox, y1 + oy)
            else:
                x2, y2, x, y = take(4)
                p1 = (
                    (2 * pos[0] - prev_cubic_ctrl[0], 2 * pos[1] - prev_cubic_ctrl[1])
                    if prev_cubic_ctrl else pos
                )
            p2 = (x2 + ox, y2 + oy)
            p3 = (x + ox, y + oy)
            if bbox_out is not None:
                _cubic_bbox_update(bbox_out, pos, p1, p2, p3)
            _flatten_cubic(pos, p1, p2, p3, tol, current)
            pos = p3
            prev_cubic_ctrl, prev_quad_ctrl = p2, None
        elif c in ("Q", "T"):
            if c == "Q":
                qx, qy, x, y = take(4)
                q = (qx + ox, qy + oy)
            else:
                x, y = take(2)
                q = (
                    (2 * pos[0] - prev_quad_ctrl[0], 2 * pos[1] - prev_quad_ctrl[1])
                    if prev_quad_ctrl else pos
                )
            p3 = (x + ox, y + oy)
            c1, c2 = _quad_to_cubic(pos, q, p3)
            if bbox_out is not None:
                _cubic_bbox_update(bbox_out, pos, c1, c2, p3)
            _flatten_cubic(pos, c1, c2, p3, tol, current)
            pos = p3
            prev_quad_ctrl, prev_cubic_ctrl = q, None
        elif c == "A":
            rx_, ry_, xrot, large, sweep, x, y = take(7)
            p3 = (x + ox, y + oy)
            _arc_to_points(pos, rx_, ry_, xrot, bool(large), bool(sweep), p3, tol, current)
            pos = p3
            prev_cubic_ctrl = prev_quad_ctrl = None
        else:
            raise SvgPathError(f"unsupported path command '{cmd}'")
    finish_open()
    return polylines


def parse_custom_shape(name: str, category: str, svg_path_data: str) -> CustomShapeData:
    """Parse + flatten an SVG path into a drawable custom shape
    (shapes.rs:60-120)."""
    curve_bbox = [float("inf"), float("inf"), float("-inf"), float("-inf")]
    try:
        polylines = parse_svg_path(svg_path_data, bbox_out=curve_bbox)
    except SvgPathError:
        raise
    except Exception as e:  # noqa: BLE001 - surface as the reference's error kind
        raise SvgPathError(f"Invalid SVG path: {e}")
    polylines = [p for p in polylines if len(p) > 1]
    if not polylines:
        raise SvgPathError("SVG path did not produce drawable geometry.")
    # bounds = flattened vertices grown by the EXACT curve extrema, like
    # kurbo's pre-flatten bounding_box (the reference computes the scale
    # mapping from it; flattened-only bounds undershoot curve bulges)
    xs = [x for poly in polylines for x, _ in poly]
    ys = [y for poly in polylines for _, y in poly]
    x0, x1 = min(xs + [curve_bbox[0]]), max(xs + [curve_bbox[2]])
    y0, y1 = min(ys + [curve_bbox[1]]), max(ys + [curve_bbox[3]])
    if not (np.isfinite(x1 - x0) and np.isfinite(y1 - y0)) or x1 - x0 <= 0 or y1 - y0 <= 0:
        raise SvgPathError("SVG path has empty bounds.")
    return CustomShapeData(name, category, svg_path_data, polylines, (x0, y0, x1, y1))


def _segments(polylines):
    """Stack every polyline's consecutive point pairs into [S,4] f32."""
    segs = []
    for poly in polylines:
        p = np.asarray(poly, f32)
        segs.append(np.concatenate([p[:-1], p[1:]], axis=1))
    return np.concatenate(segs, axis=0)


def _custom_inside(px, py, segs):
    """Vectorized even-odd crossing test (shapes.rs:1122-1139).
    px/py: [..., 1] broadcast against segs [S, 4]."""
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    denom = y2 - y1
    valid = np.abs(denom) > 1e-6
    straddles = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = (x2 - x1) * (py - y1) / np.where(valid, denom, 1.0) + x1
    crossings = (valid & straddles & (px < xi)).sum(axis=-1)
    return (crossings % 2).astype(bool)


def _custom_edge_dist(px, py, segs):
    """Min distance to any segment (shapes.rs:1141-1160)."""
    ax, ay, bx, by = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = bx - ax, by - ay
    len2 = np.maximum(dx * dx + dy * dy, 1e-6)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / len2, 0.0, 1.0)
    cx, cy = ax + dx * t, ay + dy * t
    return np.sqrt((px - cx) ** 2 + (py - cy) ** 2).min(axis=-1)


def custom_shape_coverage(data: CustomShapeData, lx, ly, hx, hy,
                          outline_width, fill_mode):
    """4-point supersampled binary coverage in shape-local coords
    (shapes.rs:1065-1120).  lx/ly are [H, W] local coordinates."""
    segs = _segments(data.polylines)
    min_x, min_y, max_x, max_y = data.bounds
    bw = max(max_x - min_x, 1.0)
    bh = max(max_y - min_y, 1.0)
    sx = f32(bw / max(hx * 2.0, 1.0))
    sy = f32(bh / max(hy * 2.0, 1.0))
    mode = ShapeFillMode(fill_mode)
    total = np.zeros(lx.shape, f32)
    for ox, oy in ((-0.25, -0.25), (0.25, -0.25), (-0.25, 0.25), (0.25, 0.25)):
        px = ((lx + f32(ox) + f32(hx)) * sx + f32(min_x))[..., None]
        py = ((ly + f32(oy) + f32(hy)) * sy + f32(min_y))[..., None]
        fill = _custom_inside(px, py, segs).astype(f32)
        if mode == ShapeFillMode.FILLED:
            total += fill
            continue
        edge = _custom_edge_dist(px, py, segs) / max(sx, sy)
        outline = (edge <= max(outline_width, 1.0)).astype(f32)
        total += outline if mode == ShapeFillMode.OUTLINE else np.maximum(fill, outline)
    return total * f32(0.25)


def render_custom_shape_icon(shape: CustomShapeData, size: int, dark: bool) -> np.ndarray:
    """Picker icon: 16x supersampled filled coverage (shapes.rs:122-156)."""
    segs = _segments(shape.polylines)
    min_x, min_y, max_x, max_y = shape.bounds
    bw = max(max_x - min_x, 1.0)
    bh = max(max_y - min_y, 1.0)
    sx, sy = f32(bw / 1.64), f32(bh / 1.64)  # hx=hy=0.82
    fg = 235 if dark else 30
    cov = np.zeros((size, size), f32)
    base_x = (np.arange(size, dtype=f32))[None, :]
    base_y = (np.arange(size, dtype=f32))[:, None]
    for sy_i in range(4):
        for sx_i in range(4):
            lx = (base_x + (sx_i + 0.5) * 0.25) / size * 2.0 - 1.0
            ly = (base_y + (sy_i + 0.5) * 0.25) / size * 2.0 - 1.0
            px = ((lx + f32(0.82)) * sx + f32(min_x))[..., None]
            py = ((ly + f32(0.82)) * sy + f32(min_y))[..., None]
            cov += _custom_inside(px, py, segs).astype(f32)
    cov = np.clip(cov / 16.0, 0.0, 1.0)
    out = np.zeros((size, size, 4), np.uint8)
    hit = cov > 0.0
    out[..., 0:3] = np.where(hit[..., None], fg, 0)
    out[..., 3] = np.where(hit, np.minimum(np.floor(255.0 * cov + 0.5), 255.0), 0).astype(np.uint8)
    return out


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

    aa = placed.anti_alias
    primary = np.asarray(placed.primary_color, f32)
    secondary = np.asarray(placed.secondary_color, f32)
    ow = max(placed.outline_width, 0.0)
    mode = ShapeFillMode(placed.fill_mode)

    if placed.custom_shape_data is not None:
        # custom shapes always draw in the primary color (shapes.rs:1241-1249)
        cov = custom_shape_coverage(
            placed.custom_shape_data, lx, ly, placed.hw, placed.hh, ow, mode
        )
        color = np.broadcast_to(primary, (bh, bw, 4))
        buf = np.zeros((bh, bw, 4), np.uint8)
        visible = cov > 0.001
        a = np.minimum(np.floor(color[..., 3] * cov + f32(0.5)), 255.0)
        out = np.concatenate(
            [color[..., 0:3].astype(np.uint8), a[..., None].astype(np.uint8)], axis=-1
        )
        return np.where(visible[..., None], out, buf), x0, y0

    d = shape_sdf(placed.kind, lx, ly, placed.hw, placed.hh, placed.corner_radius)

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
