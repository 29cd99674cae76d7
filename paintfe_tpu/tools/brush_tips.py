"""Image brush tips: custom grayscale stamp masks.

Behavioral contract: src/config/brushes.rs (`load_brush_tip` :1290-1388 —
PNG decoded to luma8, padded to a square canonical mask) and
src/ui/panels/tools/behavior/raster/brush_render.rs (`rebuild_tip_mask`
:402-530 — bilinear rescale to the brush size, hardness-as-contrast remap,
ratio-scaled box-blur AA passes on big downscales; `draw_image_tip_no_dirty`
:533-720 — scatter/rotation via `stamp_hash`, inverse-rotated bilinear mask
sampling, max-alpha stamping; jitter helpers :556-624, :846-856).
"""

from __future__ import annotations

import dataclasses
import io
from typing import Dict, List, Optional

import numpy as np

f32 = np.float32
U32 = np.uint32


@dataclasses.dataclass
class BrushTipData:
    name: str
    category: str
    mask: np.ndarray  # u8 [S, S], square canonical
    mask_size: int


class BrushTipLibrary:
    """Registry of loaded tip masks (the Assets subset the tool engine uses)."""

    def __init__(self):
        self.tips: Dict[str, BrushTipData] = {}
        self.categories: Dict[str, List[str]] = {}

    def load_brush_tip(self, name: str, category: str, png_data: bytes) -> BrushTipData:
        from PIL import Image

        gray = np.asarray(Image.open(io.BytesIO(png_data)).convert("L"), np.uint8)
        gh, gw = gray.shape
        canonical = max(gw, gh)
        mask = np.zeros((canonical, canonical), np.uint8)
        mask[:gh, :gw] = gray  # top-left pad to square (brushes.rs:1346-1358)
        tip = BrushTipData(name, category, mask, canonical)
        self.tips[name] = tip
        self.categories.setdefault(category, [])
        if name not in self.categories[category]:
            self.categories[category].append(name)
        return tip

    def remove_brush_tip(self, name: str) -> bool:
        tip = self.tips.pop(name, None)
        if tip is None:
            return False
        if name in self.categories.get(tip.category, []):
            self.categories[tip.category].remove(name)
        return True

    def get(self, name: str) -> Optional[BrushTipData]:
        return self.tips.get(name)


def _round_half_away(x):
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


def rebuild_tip_mask(tip: BrushTipData, size: float, hardness: float) -> np.ndarray:
    """Rescale the canonical mask to the brush size, apply hardness contrast
    and the downscale AA blur (brush_render.rs:402-530).  Returns u8 [D, D]."""
    src = tip.mask.astype(f32)
    src_size = tip.mask_size
    dst_size = max(int(np.ceil(size)), 1)

    scale = f32(src_size) / f32(dst_size)
    d = np.arange(dst_size, dtype=f32)
    sx = d[None, :] * scale
    sy = d[:, None] * scale
    sx0 = np.floor(sx).astype(np.int64)
    sy0 = np.floor(sy).astype(np.int64)
    sx1 = np.minimum(sx0 + 1, src_size - 1)
    sy1 = np.minimum(sy0 + 1, src_size - 1)
    fx = (sx - sx0).astype(f32)
    fy = (sy - sy0).astype(f32)
    v00 = src[sy0, sx0]
    v10 = src[sy0, sx1]
    v01 = src[sy1, sx0]
    v11 = src[sy1, sx1]
    top = v00 * (1.0 - fx) + v10 * fx
    bot = v01 * (1.0 - fx) + v11 * fx
    val = top * (1.0 - fy) + bot * fy
    mask = np.minimum(_round_half_away(val), 255.0).astype(np.uint8)

    # hardness as contrast (threshold remap)
    h = float(hardness)
    if h < 0.99:
        threshold = (1.0 - h) * 0.6
        rng = 1.0 - threshold
        norm = mask.astype(f32) / f32(255.0)
        adj = np.clip((norm - f32(threshold)) / f32(rng), 0.0, 1.0)
        mask = _round_half_away(adj * 255.0).astype(np.uint8)

    # AA box-blur passes on significant downscale (integer truncating mean)
    if dst_size < src_size and dst_size >= 3:
        ratio = src_size / dst_size
        passes = 2 if ratio > 4.0 else (1 if ratio > 1.5 else 0)
        for _ in range(passes):
            m = mask.astype(np.uint32)
            for axis in (1, 0):  # horizontal then vertical
                left = np.roll(m, 1, axis=axis)
                right = np.roll(m, -1, axis=axis)
                count = np.full(m.shape, 3, np.uint32)
                if axis == 1:
                    left[:, 0] = 0
                    right[:, -1] = 0
                    count[:, 0] = 2
                    count[:, -1] = 2
                else:
                    left[0, :] = 0
                    right[-1, :] = 0
                    count[0, :] = 2
                    count[-1, :] = 2
                m = (m + left + right) // count
            mask = m.astype(np.uint8)
    return mask


def stamp_hash(x: float, y: float, counter: int) -> int:
    """brush_render.rs:846-856 — wrapping position hash for jitter/scatter."""
    with np.errstate(invalid="ignore", over="ignore"):  # wrapping on purpose
        ix = U32(np.int64(np.trunc(np.float32(x) * np.float32(100.0))) & 0xFFFFFFFF)
        iy = U32(np.int64(np.trunc(np.float32(y) * np.float32(100.0))) & 0xFFFFFFFF)
        h = (ix * U32(374761393) + iy * U32(668265263)
             + U32(counter & 0xFFFFFFFF) * U32(1013904223))
        h ^= h >> U32(13)
        h *= U32(1274126177)
        h ^= h >> U32(16)
    return int(h)


def draw_image_tip(target: np.ndarray, pos, mask: np.ndarray, color,
                   *, is_eraser: bool = False, flow: float = 1.0,
                   rotation_deg: float = 0.0, scatter: float = 0.0,
                   stamp_counter: int = 0, brush_size: Optional[float] = None,
                   selection: Optional[np.ndarray] = None) -> None:
    """One image-tip stamp into `target` (u8 [H, W, 4], mutated in place),
    max-alpha accumulation (brush_render.rs:533-720).

    `mask` is the rebuilt [D, D] u8 tip; `color` is (r, g, b, a) u8."""
    h, w = target.shape[:2]
    mask_size = mask.shape[0]
    if mask_size == 0:
        return
    cx, cy = float(pos[0]), float(pos[1])
    if scatter > 0.01:
        diam = float(brush_size if brush_size is not None else mask_size)
        h1 = stamp_hash(cx, cy, stamp_counter) / 0xFFFFFFFF
        h2 = stamp_hash(cy, cx, (stamp_counter + 99991) & 0xFFFFFFFF) / 0xFFFFFFFF
        cx += (h1 * 2.0 - 1.0) * scatter * diam
        cy += (h2 * 2.0 - 1.0) * scatter * diam
    half = mask_size / 2.0

    rotated = abs(rotation_deg) > 0.01
    if rotated:
        rad = -np.radians(np.float32(rotation_deg))
        cos_a, sin_a = f32(np.cos(rad)), f32(np.sin(rad))
        eff_half = half * np.sqrt(2.0)
    else:
        cos_a, sin_a = f32(1.0), f32(0.0)
        eff_half = half

    min_x = int(max(cx - eff_half, 0.0))
    min_y = int(max(cy - eff_half, 0.0))
    max_x = min(int(cx + eff_half), w - 1)
    max_y = min(int(cy + eff_half), h - 1)
    if min_x > max_x or min_y > max_y:
        return

    gx, gy = np.meshgrid(np.arange(min_x, max_x + 1), np.arange(min_y, max_y + 1))
    rel_x = gx.astype(f32) - f32(cx)
    rel_y = gy.astype(f32) - f32(cy)
    m = mask.astype(f32)

    if rotated:
        rot_x = rel_x * cos_a - rel_y * sin_a + f32(half)
        rot_y = rel_x * sin_a + rel_y * cos_a + f32(half)
        inside = ((rot_x >= -0.5) & (rot_y >= -0.5)
                  & (rot_x < mask_size - 0.5) & (rot_y < mask_size - 0.5))
        sx = np.maximum(rot_x, 0.0)
        sy = np.maximum(rot_y, 0.0)
        sx0 = np.floor(sx).astype(np.int64)
        sy0 = np.floor(sy).astype(np.int64)
        sx0 = np.clip(sx0, 0, mask_size - 1)
        sy0 = np.clip(sy0, 0, mask_size - 1)
        sx1 = np.minimum(sx0 + 1, mask_size - 1)
        sy1 = np.minimum(sy0 + 1, mask_size - 1)
        fx = (sx - sx0).astype(f32)
        fy = (sy - sy0).astype(f32)
        top = m[sy0, sx0] * (1.0 - fx) + m[sy0, sx1] * fx
        bot = m[sy1, sx0] * (1.0 - fx) + m[sy1, sx1] * fx
        val = top * (1.0 - fy) + bot * fy
        geom_u8 = np.where(inside, np.minimum(_round_half_away(val), 255.0), 0.0)
    else:
        mask_x = _round_half_away(rel_x + f32(half)).astype(np.int64)
        mask_y = _round_half_away(rel_y + f32(half)).astype(np.int64)
        inside = ((mask_x >= 0) & (mask_y >= 0)
                  & (mask_x < mask_size) & (mask_y < mask_size))
        geom_u8 = np.where(
            inside,
            m[np.clip(mask_y, 0, mask_size - 1), np.clip(mask_x, 0, mask_size - 1)],
            0.0,
        )

    ok = geom_u8 > 0
    if selection is not None:
        ok &= selection[min_y:max_y + 1, min_x:max_x + 1] != 0
    if not ok.any():
        return
    geom = geom_u8 / f32(255.0)
    src_a = f32(color[3]) / f32(255.0)
    strength = geom * src_a * f32(np.clip(flow, 0.0, 1.0))

    window = target[min_y:max_y + 1, min_x:max_x + 1]
    out = window.copy()
    if is_eraser:
        old = window[..., 3].astype(f32) / f32(255.0)
        write = ok & (strength >= 0.01) & (strength > old)
        out[..., 0:3] = np.where(write[..., None], 0, window[..., 0:3])
        out[..., 3] = np.where(write, (strength * f32(255.0)).astype(np.uint8),
                               window[..., 3])
    else:
        a_u8 = (strength * f32(255.0)).astype(np.uint8)  # truncating cast
        write = ok & (a_u8 >= window[..., 3])
        out[..., 0] = np.where(write, np.uint8(color[0]), window[..., 0])
        out[..., 1] = np.where(write, np.uint8(color[1]), window[..., 1])
        out[..., 2] = np.where(write, np.uint8(color[2]), window[..., 2])
        out[..., 3] = np.where(write, a_u8, window[..., 3])
    target[min_y:max_y + 1, min_x:max_x + 1] = out


def jitter_color(color, hue_jitter: float, brightness_jitter: float,
                 pos, stamp_counter: int):
    """Per-stamp HSL jitter (brush_render.rs:602-636).  color: u8 (r,g,b)."""
    from paintfe_tpu.core.colorspace import rgb_to_hsl, hsl_to_rgb

    if hue_jitter <= 0.01 and brightness_jitter <= 0.01:
        return tuple(int(c) for c in color[:3])
    r, g, b = (f32(c) / f32(255.0) for c in color[:3])
    h, s, l = rgb_to_hsl(r, g, b)
    h, s, l = float(h), float(s), float(l)
    if hue_jitter > 0.01:
        hh = stamp_hash(pos[0] + 0.1, pos[1] + 0.2, (stamp_counter + 777) & 0xFFFFFFFF) / 0xFFFFFFFF
        h = np.float32(h + (hh * 2.0 - 1.0) * hue_jitter * 0.5)
        h = float(h - np.trunc(h))  # Rust fract()
        if h < 0.0:
            h += 1.0
    if brightness_jitter > 0.01:
        bh = stamp_hash(pos[0] + 0.3, pos[1] + 0.4, (stamp_counter + 555) & 0xFFFFFFFF) / 0xFFFFFFFF
        l = float(np.clip(l + (bh * 2.0 - 1.0) * brightness_jitter * 0.5, 0.0, 1.0))
    nr, ng, nb = hsl_to_rgb(np.float32(h), np.float32(s), np.float32(l))
    return (int(f32(nr) * 255.0), int(f32(ng) * 255.0), int(f32(nb) * 255.0))
