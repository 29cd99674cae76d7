"""Contours effect: iso-lines of a turbulence field.

Behavioral contract: src/ops/effects/contours.rs:56-160.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from paintfe_tpu.utils.hashing import turbulence_2d
from paintfe_tpu.utils.quant import exact_div, round_u8

f32 = np.float32


from paintfe_tpu.ops.common import coord_grids, masked as _masked  # shared


@functools.lru_cache(maxsize=16)
def _contours_fn(scale, frequency, line_width, line_color, seed, octaves, blend, h, w):
    inv_scale = f32(1.0) / f32(max(scale, 0.5))
    oct_n = int(np.clip(octaves, 1, 8))
    half_lw = f32(max(line_width * 0.5, 0.3))
    col = np.asarray(line_color, f32)
    la = f32(col[3] / f32(255.0))
    freq = f32(max(frequency, 0.5))
    edge = f32(half_lw * inv_scale * f32(0.5))
    bl = f32(blend)

    @jax.jit
    def run(img):
        xs, ys = coord_grids(h, w)
        noise = turbulence_2d(xs * inv_scale, ys * inv_scale, seed, oct_n, 0.5)
        level = noise * freq
        # Rust f32::round is half-away-from-zero.
        nearest = jnp.sign(level) * jnp.floor(jnp.abs(level) + 0.5)
        dist = exact_div(jnp.abs(level - nearest), freq)
        line_alpha = jnp.where(
            dist < edge,
            1.0,
            jnp.where(dist < edge * 2.0, 1.0 - exact_div(dist - edge, edge), 0.0),
        )
        alpha = (line_alpha * la * bl)[..., None]
        src = img.astype(jnp.float32)
        rgb = src[..., 0:3] * (1.0 - alpha) + jnp.asarray(col[0:3]) * alpha
        out = jnp.concatenate([rgb, src[..., 3:4]], axis=-1)
        return round_u8(out)

    return run


def contours(img, scale, frequency, line_width, line_color, seed=42, octaves=2,
             blend=0.5, mask=None):
    h, w = img.shape[:2]
    out = _contours_fn(
        float(scale), float(frequency), float(line_width),
        tuple(int(c) for c in line_color), int(seed), int(octaves), float(blend), h, w
    )(img)
    return _masked(img, out, mask)
