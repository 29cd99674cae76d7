"""Brush / pencil / eraser / line stamping engine.

Behavioral contract: src/ui/panels/tools/behavior/raster/brush_render.rs —
alpha(dist) = material falloff (1 + (hardness-1)*smoothstep(t)) x geometric
coverage (smoothstep over [radius-0.5, radius+0.5] when AA, hard cutoff
otherwise), precomputed as a 256-entry LUT indexed by squared-distance ratio
(:27-82); max-alpha Normal stamping, preview-mask eraser semantics,
Dodge/Burn/Sponge HSL modes (:330-400); dense per-pixel line stepping
(:762-835).

Stamps are small windows; each stamp is vectorized numpy f32 over its
bounding box with the reference's exact casts (truncating LUT index,
round-half-away LUT values).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import numpy as np

f32 = np.float32


class BrushMode(enum.Enum):
    NORMAL = "normal"
    DODGE = "dodge"
    BURN = "burn"
    SPONGE = "sponge"


def _smoothstep01(t):
    return t * t * (f32(3.0) - f32(2.0) * t)


def _rgb_to_hsl(r, g, b):
    """Shared host-numpy HSL (core/colorspace.py is the single
    parity-critical implementation — its epsilon branches and R->G->B
    tie-break order must not fork)."""
    from paintfe_tpu.core.colorspace import rgb_to_hsl

    return rgb_to_hsl(r, g, b, xp=np)


def _hsl_to_rgb(h, s, l):
    from paintfe_tpu.core.colorspace import hsl_to_rgb

    return hsl_to_rgb(h, s, l, xp=np)


@dataclasses.dataclass
class BrushProperties:
    size: float = 10.0
    hardness: float = 1.0
    anti_aliased: bool = True
    flow: float = 1.0
    spacing: float = 0.25
    scatter: float = 0.0
    hue_jitter: float = 0.0
    brightness_jitter: float = 0.0
    brush_mode: BrushMode = BrushMode.NORMAL


class Brush:
    """Stateful brush (mirrors ToolsPanel's raster behavior surface)."""

    def __init__(self, size=10.0, hardness=1.0, anti_aliased=True, flow=1.0,
                 brush_mode=BrushMode.NORMAL):
        self.properties = BrushProperties(
            size=size, hardness=hardness, anti_aliased=anti_aliased, flow=flow,
            brush_mode=brush_mode,
        )
        self._lut = np.zeros(256, np.uint8)
        self._lut_params = None
        self.stamp_counter = 0  # u32, wraps; seeds scatter/jitter hashes
        self.rebuild_brush_lut()

    # -- LUT -------------------------------------------------------------

    def compute_brush_alpha(self, dist, radius):
        """Material falloff x geometric coverage (brush_render.rs:53-82)."""
        if radius <= 0.0:
            return np.zeros_like(np.asarray(dist, f32))
        dist = np.asarray(dist, f32)
        hardness = f32(np.clip(self.properties.hardness, 0.0, 1.0))
        t = np.clip(dist / f32(radius), 0.0, 1.0)
        falloff = _smoothstep01(t)
        material = f32(1.0) + (hardness - f32(1.0)) * falloff
        if self.properties.anti_aliased:
            edge0 = f32(radius) + f32(0.5)
            edge1 = f32(radius) - f32(0.5)
            x = np.clip((dist - edge0) / (edge1 - edge0), 0.0, 1.0)
            coverage = np.where(
                dist <= edge1, f32(1.0), np.where(dist >= edge0, f32(0.0), _smoothstep01(x))
            )
        else:
            coverage = np.where(dist <= radius, f32(1.0), f32(0.0))
        return material * coverage

    def rebuild_brush_lut(self):
        params = (self.properties.size, self.properties.hardness,
                  self.properties.anti_aliased)
        if params == self._lut_params:
            return
        self._lut_params = params
        radius = self.properties.size / 2.0
        if radius < 0.001:
            self._lut = np.zeros(256, np.uint8)
            return
        t_sq = np.arange(256, dtype=f32) / f32(255.0)
        dist = np.sqrt(t_sq, dtype=f32) * f32(radius)
        alpha = self.compute_brush_alpha(dist, radius)
        self._lut = np.minimum(np.floor(alpha * f32(255.0) + f32(0.5)), 255.0).astype(np.uint8)

    # -- stamping ----------------------------------------------------------

    def draw_circle(self, img: np.ndarray, pos, is_eraser=False,
                    use_secondary=False, primary=(0.0, 0.0, 0.0, 1.0),
                    secondary=(1.0, 1.0, 1.0, 1.0), mask: Optional[np.ndarray] = None):
        """One stamp at `pos`, mutating `img` (u8 [H, W, 4]) in place."""
        self.rebuild_brush_lut()
        # per-stamp counter increment (draw_circle_and_get_bounds :872)
        self.stamp_counter = (self.stamp_counter + 1) & 0xFFFFFFFF
        h, w = img.shape[:2]
        cx, cy = f32(pos[0]), f32(pos[1])
        if self.properties.scatter > 0.01:
            # scatter each stamp by up to scatter*diameter, hash-seeded
            # (brush_render.rs:179-193); all-f32 offset math
            from paintfe_tpu.tools.brush_tips import hash_unit

            diam = f32(self.properties.size)
            sc = f32(self.properties.scatter)
            h1 = hash_unit(float(cx), float(cy), self.stamp_counter)
            h2 = hash_unit(float(cy), float(cx),
                           (self.stamp_counter + 99991) & 0xFFFFFFFF)
            cx = f32(cx + (h1 * f32(2.0) - f32(1.0)) * sc * diam)
            cy = f32(cy + (h2 * f32(2.0) - f32(1.0)) * sc * diam)
        radius = f32(self.properties.size / 2.0)
        radius_sq = radius * radius
        if radius_sq < 0.001:
            return
        aa = self.properties.anti_aliased
        draw_radius = radius + f32(0.5) if aa else radius
        draw_radius_sq = draw_radius * draw_radius
        use_direct_alpha = draw_radius > radius
        inv_radius_sq = f32(1.0) / radius_sq

        min_x = int(max(np.floor(cx - draw_radius), 0.0))
        max_x = min(int(np.ceil(cx + draw_radius)), w - 1)
        min_y = int(max(np.floor(cy - draw_radius), 0.0))
        max_y = min(int(np.ceil(cy + draw_radius)), h - 1)
        if min_x > max_x or min_y > max_y:
            return

        color = secondary if use_secondary else primary
        src_r, src_g, src_b, src_a = [f32(c) for c in color]
        src_r8 = np.uint8(src_r * 255.0)
        src_g8 = np.uint8(src_g * 255.0)
        src_b8 = np.uint8(src_b * 255.0)
        if (self.properties.hue_jitter > 0.01
                or self.properties.brightness_jitter > 0.01):
            # per-stamp HSL color jitter (brush_render.rs:226-256); hashes
            # use the NOMINAL position (not the scattered one) and the
            # jitter starts from the f32 color, not the quantized u8
            from paintfe_tpu.tools.brush_tips import jitter_color_unit

            src_r8, src_g8, src_b8 = (np.uint8(v) for v in jitter_color_unit(
                (src_r, src_g, src_b),
                self.properties.hue_jitter, self.properties.brightness_jitter,
                (float(pos[0]), float(pos[1])), self.stamp_counter))
        flow = f32(self.properties.flow)

        xs = np.arange(min_x, max_x + 1, dtype=f32) - cx
        ys = np.arange(min_y, max_y + 1, dtype=f32) - cy
        dist_sq = (xs[None, :] ** 2 + ys[:, None] ** 2).astype(f32)
        in_circle = dist_sq <= draw_radius_sq

        if use_direct_alpha:
            geom_u8 = np.minimum(
                np.floor(self.compute_brush_alpha(np.sqrt(dist_sq, dtype=f32), radius)
                         * f32(255.0) + f32(0.5)),
                255.0,
            ).astype(np.uint8)
        else:
            idx = np.minimum(dist_sq * inv_radius_sq * f32(255.0), f32(255.0)).astype(np.int32)
            geom_u8 = self._lut[idx]

        active = in_circle & (geom_u8 > 0)
        if mask is not None:
            active &= np.asarray(mask)[min_y : max_y + 1, min_x : max_x + 1] > 0
        if not active.any():
            return

        geom = geom_u8.astype(f32) / f32(255.0)
        window = img[min_y : max_y + 1, min_x : max_x + 1]

        if is_eraser:
            # Preview-eraser-mask semantics (brush_render.rs:345-357): write a
            # growing erase mask as (0,0,0,strength) where strength exceeds
            # the current mask alpha.
            strength = geom * src_a * flow
            old = window[..., 3].astype(f32) / f32(255.0)
            do = active & (strength >= 0.01) & (strength > old)
            sel = do
            window[..., 0] = np.where(sel, 0, window[..., 0])
            window[..., 1] = np.where(sel, 0, window[..., 1])
            window[..., 2] = np.where(sel, 0, window[..., 2])
            window[..., 3] = np.where(sel, (strength * f32(255.0)).astype(np.uint8), window[..., 3])
            return

        brush_alpha = geom * src_a * flow
        active &= brush_alpha >= 0.01
        mode = self.properties.brush_mode
        if mode == BrushMode.NORMAL:
            ba_u8 = (brush_alpha * f32(255.0)).astype(np.uint8)  # truncating
            do = active & (ba_u8 >= window[..., 3])
            window[..., 0] = np.where(do, src_r8, window[..., 0])
            window[..., 1] = np.where(do, src_g8, window[..., 1])
            window[..., 2] = np.where(do, src_b8, window[..., 2])
            window[..., 3] = np.where(do, ba_u8, window[..., 3])
        else:
            old_r = window[..., 0].astype(f32) / f32(255.0)
            old_g = window[..., 1].astype(f32) / f32(255.0)
            old_b = window[..., 2].astype(f32) / f32(255.0)
            hh, ss, ll = _rgb_to_hsl(old_r, old_g, old_b)
            strength = brush_alpha * f32(0.5)
            if mode == BrushMode.DODGE:
                ll = np.clip(ll + strength, 0.0, 1.0)
            elif mode == BrushMode.BURN:
                ll = np.clip(ll - strength, 0.0, 1.0)
            elif mode == BrushMode.SPONGE:
                ss = np.clip(ss - strength, 0.0, 1.0)
            nr, ng, nb = _hsl_to_rgb(hh, ss, ll)
            window[..., 0] = np.where(active, (nr * f32(255.0)).astype(np.uint8), window[..., 0])
            window[..., 1] = np.where(active, (ng * f32(255.0)).astype(np.uint8), window[..., 1])
            window[..., 2] = np.where(active, (nb * f32(255.0)).astype(np.uint8), window[..., 2])

    def draw_line(self, img, start, end, is_eraser=False, use_secondary=False,
                  primary=(0.0, 0.0, 0.0, 1.0), secondary=(1.0, 1.0, 1.0, 1.0),
                  mask=None):
        """Dense sub-pixel stepped stroke (brush_render.rs:762-835)."""
        h, w = img.shape[:2]
        x0, y0 = f32(start[0]), f32(start[1])
        x1, y1 = f32(end[0]), f32(end[1])
        dx = x1 - x0
        dy = y1 - y0
        distance = f32(np.sqrt(dx * dx + dy * dy))
        if distance < 0.1:
            if x0 >= 0.0 and int(x0) < w and y0 >= 0.0 and int(y0) < h:
                self.draw_circle(img, (x0, y0), is_eraser, use_secondary,
                                 primary, secondary, mask)
            return
        steps = int(np.ceil(distance / f32(1.0)))
        for i in range(steps + 1):
            t = f32(i) / f32(steps)
            x = x0 + dx * t
            y = y0 + dy * t
            if x >= 0.0 and int(x) < w and y >= 0.0 and int(y) < h:
                self.draw_circle(img, (x, y), is_eraser, use_secondary,
                                 primary, secondary, mask)
