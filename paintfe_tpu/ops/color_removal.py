"""Color-to-alpha and the smart contiguous eraser.

Behavioral contract: src/ops/color_removal.rs — ColorToAlphaSettings
(defaults :20-28), color_to_alpha_core (:32-140: max-channel distance ->
contribution ramp over [tolerance, tolerance+softness], luminance
protection, RGB recovery via inverse un-premultiply, spill suppression),
compute/apply color removal two-phase flow (:161+).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Optional

import numpy as np

f32 = np.float32


@dataclasses.dataclass
class ColorToAlphaSettings:
    target: tuple = (255, 0, 0)
    tolerance: float = 18.0
    softness: float = 35.0
    strength: float = 1.0
    spill_suppression: float = 0.35
    alpha_floor: float = 0.0
    alpha_ceiling: float = 1.0
    protect_luminance: float = 0.15


def _luma(r, g, b):
    return r * f32(0.2126) + g * f32(0.7152) + b * f32(0.0722)


def color_to_alpha(img: np.ndarray, settings: Optional[ColorToAlphaSettings] = None,
                   mask: Optional[np.ndarray] = None) -> np.ndarray:
    s = settings or ColorToAlphaSettings()
    img = np.asarray(img, np.uint8)
    out = img.copy()

    target = np.asarray(s.target, f32)
    tolerance = f32(np.clip(s.tolerance / 255.0, 0.0, 1.0))
    softness = f32(max(s.softness / 255.0, 0.001))
    strength = f32(np.clip(s.strength, 0.0, 1.0))
    spill = f32(np.clip(s.spill_suppression, 0.0, 1.0))
    alpha_floor = f32(np.clip(s.alpha_floor, 0.0, 1.0))
    alpha_ceiling = f32(np.clip(s.alpha_ceiling, alpha_floor, 1.0))
    protect = f32(np.clip(s.protect_luminance, 0.0, 1.0))
    target_luma = _luma(target[0], target[1], target[2])

    r = img[..., 0].astype(f32)
    g = img[..., 1].astype(f32)
    b = img[..., 2].astype(f32)
    orig_a = img[..., 3].astype(f32)

    max_d = np.maximum(
        np.abs(r - target[0]) / f32(255.0),
        np.maximum(np.abs(g - target[1]) / f32(255.0), np.abs(b - target[2]) / f32(255.0)),
    )
    contribution = f32(1.0) - np.clip((max_d - tolerance) / softness, 0.0, 1.0)
    if protect > 0.0:
        luma_delta = np.clip(np.abs(_luma(r, g, b) - target_luma) / f32(255.0), 0.0, 1.0)
        contribution = contribution * (f32(1.0) - np.clip(luma_delta * protect, 0.0, 1.0))

    removal = np.clip(contribution * strength, 0.0, 1.0)
    active = (img[..., 3] > 0) & (removal > 0.0)
    if mask is not None:
        active &= np.asarray(mask) > 0

    new_a_f = np.clip((orig_a / f32(255.0)) * (f32(1.0) - removal), alpha_floor, alpha_ceiling)
    safe_orig = np.where(orig_a > 0, orig_a / f32(255.0), 1.0)
    kept = np.clip(new_a_f / safe_orig, 0.0, 1.0)
    new_a = np.clip(np.floor(new_a_f * f32(255.0) + f32(0.5)), 0, 255).astype(np.uint8)

    zeroed = (new_a == 0) | (kept < 0.001)
    safe_kept = np.where(zeroed, 1.0, kept)

    def recover(orig, tch):
        return np.clip((orig - tch * removal) / safe_kept, 0.0, 255.0)

    nr, ng, nb = recover(r, target[0]), recover(g, target[1]), recover(b, target[2])
    if spill > 0.0:
        amount = np.clip(spill * contribution * (f32(1.0) - kept), 0.0, 1.0)
        if target[0] > 0:
            nr = nr * (f32(1.0) - amount)
        if target[1] > 0:
            ng = ng * (f32(1.0) - amount)
        if target[2] > 0:
            nb = nb * (f32(1.0) - amount)

    def rnd(v):
        return np.floor(v + f32(0.5)).astype(np.uint8)

    out[..., 0] = np.where(active, np.where(zeroed, 0, rnd(nr)), out[..., 0])
    out[..., 1] = np.where(active, np.where(zeroed, 0, rnd(ng)), out[..., 1])
    out[..., 2] = np.where(active, np.where(zeroed, 0, rnd(nb)), out[..., 2])
    out[..., 3] = np.where(active, new_a, out[..., 3])
    return out


def flood_select(pixels: np.ndarray, start_x: int, start_y: int,
                 tolerance: float, connectivity8: bool = False) -> np.ndarray:
    """BFS flood fill from a seed using max-channel distance <= tolerance;
    returns a binary u8 mask (the smart-eraser / magic-wand primitive)."""
    h, w = pixels.shape[:2]
    mask = np.zeros((h, w), np.uint8)
    if not (0 <= start_x < w and 0 <= start_y < h):
        return mask
    seed = pixels[start_y, start_x, :3].astype(np.int16)
    tol = int(tolerance)
    visited = np.zeros((h, w), bool)
    q = deque([(start_x, start_y)])
    visited[start_y, start_x] = True
    nbs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity8:
        nbs += [(-1, -1), (1, -1), (-1, 1), (1, 1)]
    while q:
        x, y = q.popleft()
        d = np.abs(pixels[y, x, :3].astype(np.int16) - seed).max()
        if d > tol:
            continue
        mask[y, x] = 255
        for dx, dy in nbs:
            nx, ny = x + dx, y + dy
            if 0 <= nx < w and 0 <= ny < h and not visited[ny, nx]:
                visited[ny, nx] = True
                q.append((nx, ny))
    return mask


def smart_contiguous_erase(pixels: np.ndarray, start_x: int, start_y: int,
                           tolerance: float, smoothness: int = 2) -> np.ndarray:
    """Flood fill -> dilate by `smoothness` -> color-to-alpha against the
    seed color within the dilated region (color_removal.rs:161+)."""
    from paintfe_tpu.core.selection import expand

    region = flood_select(pixels, start_x, start_y, tolerance)
    if smoothness > 0:
        region = expand(region, smoothness)
    seed = tuple(int(c) for c in pixels[start_y, start_x, :3])
    settings = ColorToAlphaSettings(target=seed, tolerance=tolerance,
                                    softness=max(tolerance, 1.0))
    return color_to_alpha(pixels, settings, mask=region)
