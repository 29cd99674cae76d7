"""Stylize effects: vignette, halftone.  (Glow/sharpen live in ops.filters
next to their Gaussian dependency.)

Behavioral contract: src/ops/effects/stylize.rs — vignette (:170-191),
halftone luminance-vs-cell-distance threshold (:196-276).
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from paintfe_tpu.core.colorspace import luma_bt709
from paintfe_tpu.utils.quant import exact_div, round_u8

f32 = np.float32


from paintfe_tpu.ops.common import coord_grids, masked as _masked  # shared


class HalftoneShape(enum.IntEnum):
    CIRCLE = 0
    SQUARE = 1
    DIAMOND = 2
    LINE = 3


@functools.lru_cache(maxsize=64)
def _vignette_fn(amount: float, softness: float, h: int, w: int):
    wf, hf = f32(w), f32(h)
    cx = f32(wf / f32(2.0))
    cy = f32(hf / f32(2.0))
    max_dist = f32(np.sqrt(f32(cx * cx + cy * cy)))
    soft = f32(max(softness, 0.01))
    amt = f32(amount)

    @jax.jit
    def run(img):
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
        ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
        dist = exact_div(jnp.sqrt(xs * xs + ys * ys), max_dist)
        t = jnp.minimum(exact_div(dist, soft), 1.0)
        vf = jnp.clip(1.0 - amt * t * t, 0.0, 1.0)[..., None]
        src = img.astype(jnp.float32)
        out = jnp.concatenate([src[..., 0:3] * vf, src[..., 3:4]], axis=-1)
        return round_u8(out)

    return run


def vignette(img, amount: float, softness: float, mask=None):
    """vf = 1 - amount*min(dist/soft, 1)^2 multiplies RGB (stylize.rs:170-191)."""
    h, w = img.shape[:2]
    out = _vignette_fn(float(amount), float(softness), h, w)(img)
    return _masked(img, out, mask)


@functools.lru_cache(maxsize=64)
def _halftone_fn(dot_size: float, angle_deg: float, shape, h: int, w: int):
    ds = f32(max(dot_size, 2.0))
    angle = f32(f32(angle_deg) * (f32(np.pi) / f32(180.0)))
    cos_a = f32(np.cos(angle))
    sin_a = f32(np.sin(angle))

    @jax.jit
    def run(img):
        src = img.astype(jnp.float32)
        lum = exact_div(luma_bt709(src[..., 0], src[..., 1], src[..., 2]), 255.0)
        xs, ys = coord_grids(h, w)
        fx = xs * cos_a + ys * sin_a
        fy = -xs * sin_a + ys * cos_a
        rx = exact_div(fx, ds)
        ry = exact_div(fy, ds)
        cell_x = jnp.abs(rx - jnp.trunc(rx))  # Rust fract().abs()
        cell_y = jnp.abs(ry - jnp.trunc(ry))
        cx = cell_x - 0.5
        cy = cell_y - 0.5
        if shape == HalftoneShape.CIRCLE:
            thresh = jnp.sqrt(cx * cx + cy * cy) * 2.0
        elif shape == HalftoneShape.SQUARE:
            thresh = jnp.maximum(jnp.abs(cx), jnp.abs(cy)) * 2.0
        elif shape == HalftoneShape.DIAMOND:
            thresh = jnp.abs(cx) + jnp.abs(cy)
        else:
            thresh = jnp.abs(cy) * 2.0
        val = jnp.where(thresh < lum, 255.0, 0.0)
        out = jnp.stack([val, val, val, src[..., 3]], axis=-1)
        return round_u8(out)

    return run


def halftone(img, dot_size: float, angle_deg: float, shape=HalftoneShape.CIRCLE,
             mask=None):
    """Rotated-cell luminance thresholding (stylize.rs:242-276)."""
    h, w = img.shape[:2]
    out = _halftone_fn(float(dot_size), float(angle_deg), HalftoneShape(shape), h, w)(img)
    return _masked(img, out, mask)
