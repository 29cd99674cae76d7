"""Clone-stamp and healing (content-aware) brushes.

Behavioral contract: src/ui/panels/tools/behavior/raster/clone_heal.rs —
clone samples the active layer at a fixed offset with the brush falloff and
max-alpha accumulation into the preview layer (:6-99); heal replaces each
pixel with the average of 24 ring samples at two radii (0.75/1.0 of the
sample radius) with a per-pixel hash-seeded angle offset to break grid
artifacts (:142-255); both stroke via dense 1-px line stepping (:101-132,
:262-292).

Each stamp is vectorized numpy over the brush bounding box; strokes loop
the dense steps on the host (interactive-tool scale, same as tools/brush.py).
"""

from __future__ import annotations

import numpy as np

from paintfe_tpu.tools.brush import Brush

f32 = np.float32
TAU = f32(2.0 * np.pi)


def _round_half_away(v) -> np.ndarray:
    """Rust f32::round — half away from zero ((-0.5).round() == -1, where
    floor(v + 0.5) would give 0)."""
    return np.where(v >= 0.0, np.floor(v + f32(0.5)),
                    np.ceil(v - f32(0.5))).astype(np.int64)


def _bbox(cx, cy, radius, w, h):
    min_x = int(max(cx - radius, 0.0))
    max_x = min(int(cx + radius), w - 1)
    min_y = int(max(cy - radius, 0.0))
    max_y = min(int(cy + radius), h - 1)
    return min_x, max_x, min_y, max_y


def clone_stamp_circle(brush: Brush, preview: np.ndarray, source: np.ndarray,
                       pos, offset, selection=None):
    """One clone stamp into `preview` (straight alpha), sampling `source`
    at `pos + offset` (clone_heal.rs:6-99).  Mutates `preview` in place."""
    h, w = source.shape[:2]
    cx, cy = float(pos[0]), float(pos[1])
    radius = brush.properties.size / 2.0
    min_x, max_x, min_y, max_y = _bbox(cx, cy, radius, w, h)
    if max_x < min_x or max_y < min_y:
        return

    ys = np.arange(min_y, max_y + 1)
    xs = np.arange(min_x, max_x + 1)
    gx, gy = np.meshgrid(xs, ys)
    dist = np.sqrt((gx.astype(f32) - f32(cx)) ** 2 + (gy.astype(f32) - f32(cy)) ** 2)
    geom = brush.compute_brush_alpha(dist, f32(radius))
    ok = (dist <= radius) & (geom >= 0.01)
    if selection is not None:
        ok &= selection[min_y:max_y + 1, min_x:max_x + 1] != 0

    # source coords: round half AWAY from zero (Rust f32::round) — plain
    # floor(x+0.5) rounds -0.5 to 0 where Rust gives -1, an off-by-one on
    # negative source coordinates
    sx = _round_half_away(gx.astype(f32) + f32(offset[0]))
    sy = _round_half_away(gy.astype(f32) + f32(offset[1]))
    ok &= (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    if not ok.any():
        return
    sxc = np.clip(sx, 0, w - 1)
    syc = np.clip(sy, 0, h - 1)
    src = source[syc, sxc].astype(f32)

    brush_alpha = geom * (src[..., 3] / f32(255.0))
    window = preview[min_y:max_y + 1, min_x:max_x + 1]
    old_alpha = window[..., 3].astype(f32) / f32(255.0)
    write = ok & (brush_alpha >= old_alpha)

    out = window.copy()
    out[..., 0:3] = np.where(write[..., None], src[..., 0:3].astype(np.uint8),
                             window[..., 0:3])
    out[..., 3] = np.where(write, (brush_alpha * f32(255.0)).astype(np.uint8),
                           window[..., 3])
    preview[min_y:max_y + 1, min_x:max_x + 1] = out


def heal_circle(brush: Brush, preview: np.ndarray, source: np.ndarray, pos,
                sample_radius: float, selection=None, num_samples: int = 24):
    """One healing stamp: each brushed pixel becomes the mean of ring samples
    around it (clone_heal.rs:142-255).  Mutates `preview` in place."""
    h, w = source.shape[:2]
    cx, cy = float(pos[0]), float(pos[1])
    radius = brush.properties.size / 2.0
    min_x, max_x, min_y, max_y = _bbox(cx, cy, radius, w, h)
    if max_x < min_x or max_y < min_y:
        return

    ys = np.arange(min_y, max_y + 1)
    xs = np.arange(min_x, max_x + 1)
    gx, gy = np.meshgrid(xs, ys)
    dist = np.sqrt((gx.astype(f32) - f32(cx)) ** 2 + (gy.astype(f32) - f32(cy)) ** 2)

    # hardness-aware falloff (clone_heal.rs:193-203)
    t = np.clip(dist / f32(max(radius, 1e-6)), 0.0, 1.0)
    hard_t = f32(np.clip(brush.properties.hardness * 0.9 + 0.1, 0.0, 1.0))
    s = (t - hard_t) / (f32(1.0) - hard_t + f32(1e-6))
    geom = np.where(t < hard_t, f32(1.0),
                    f32(1.0) - s * s * (f32(3.0) - f32(2.0) * s)).astype(f32)
    ok = (dist <= radius) & (geom >= 0.01)
    if selection is not None:
        ok &= selection[min_y:max_y + 1, min_x:max_x + 1] != 0
    if not ok.any():
        return

    # per-pixel angle offset from the wrapping-hash seed (clone_heal.rs:206-208)
    seed = (gx.astype(np.uint32) * np.uint32(1619)
            + gy.astype(np.uint32) * np.uint32(3929))
    angle_off = seed.astype(f32) / f32(np.float64(0xFFFFFFFF)) * TAU

    sum_rgb = np.zeros(gx.shape + (3,), f32)
    count = np.zeros(gx.shape, f32)
    for i in range(num_samples):
        angle = angle_off + f32(i / num_samples) * TAU
        for rr in (sample_radius * 0.75, sample_radius):
            sx = _round_half_away(gx.astype(f32) + np.cos(angle) * f32(rr))
            sy = _round_half_away(gy.astype(f32) + np.sin(angle) * f32(rr))
            valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
            sp = source[np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1), 0:3].astype(f32)
            sum_rgb += np.where(valid[..., None], sp, 0.0)
            count += valid.astype(f32)

    ok &= count >= 1.0
    window = preview[min_y:max_y + 1, min_x:max_x + 1]
    old_alpha = window[..., 3].astype(f32) / f32(255.0)
    write = ok & (geom >= old_alpha)

    mean = (sum_rgb / np.maximum(count, 1.0)[..., None]).astype(np.uint8)  # trunc cast
    out = window.copy()
    out[..., 0:3] = np.where(write[..., None], mean, window[..., 0:3])
    out[..., 3] = np.where(write, (geom * f32(255.0)).astype(np.uint8), window[..., 3])
    preview[min_y:max_y + 1, min_x:max_x + 1] = out


def _dense_steps(start, end):
    dx = end[0] - start[0]
    dy = end[1] - start[1]
    distance = float(np.sqrt(dx * dx + dy * dy))
    if distance < 0.1:
        return [start]
    steps = int(np.ceil(distance))
    return [
        (start[0] + dx * i / steps, start[1] + dy * i / steps)
        for i in range(steps + 1)
    ]


def _line_points(start, end, w, h):
    """The reference's stepping discipline (clone_heal.rs:101-132, 262-292):
    a tap (< 0.1 px) stamps UNCONDITIONALLY (bbox clipping handles
    off-canvas centers); line steps skip centers outside the canvas."""
    pts = _dense_steps(start, end)
    if len(pts) == 1:
        return pts
    return [p for p in pts
            if 0.0 <= p[0] and int(p[0]) < w and 0.0 <= p[1] and int(p[1]) < h]


def clone_stamp_line(brush: Brush, preview: np.ndarray, source: np.ndarray,
                     start, end, offset, selection=None):
    """Dense 1-px stepping along the stroke segment (clone_heal.rs:101-132)."""
    h, w = source.shape[:2]
    for p in _line_points(start, end, w, h):
        clone_stamp_circle(brush, preview, source, p, offset, selection)


def heal_line(brush: Brush, preview: np.ndarray, source: np.ndarray,
              start, end, sample_radius: float, selection=None):
    """Dense stepping for the healing stroke (clone_heal.rs:262-292)."""
    h, w = source.shape[:2]
    for p in _line_points(start, end, w, h):
        heal_circle(brush, preview, source, p, sample_radius, selection)
