"""Gradient generation — the accelerator-backend gradient pipeline.

Behavioral contract: src/gpu/shaders.rs GRADIENT (:1276) /
src/gpu/compute/previews.rs GradientGpuParams (:80-93): shapes Linear /
LinearReflected / Radial / Diamond, clamp or repeat, color or eraser mode.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from paintfe_tpu.utils.quant import exact_div, round_u8

f32 = np.float32


class GradientShape(enum.IntEnum):
    LINEAR = 0
    LINEAR_REFLECTED = 1
    RADIAL = 2
    DIAMOND = 3


@functools.lru_cache(maxsize=32)
def _gradient_t_fn(shape, start, end, repeat, h, w):
    sx, sy = f32(start[0]), f32(start[1])
    ex, ey = f32(end[0]), f32(end[1])
    dx, dy = ex - sx, ey - sy
    len_sq = f32(max(dx * dx + dy * dy, 1e-6))

    @jax.jit
    def run():
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5 - sx
        ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5 - sy
        if shape == GradientShape.LINEAR or shape == GradientShape.LINEAR_REFLECTED:
            t = exact_div(xs * dx + ys * dy, len_sq)
            if shape == GradientShape.LINEAR_REFLECTED:
                t = jnp.abs(t)
        elif shape == GradientShape.RADIAL:
            radius = f32(np.sqrt(len_sq))
            t = exact_div(jnp.sqrt(xs * xs + ys * ys), radius)
        else:  # DIAMOND
            radius = f32(np.sqrt(len_sq))
            # rotate into the gradient axis frame, use L1 norm
            inv = f32(1.0) / f32(np.sqrt(len_sq))
            ux, uy = dx * inv, dy * inv
            px = xs * ux + ys * uy
            py = -xs * uy + ys * ux
            t = exact_div(jnp.abs(px) + jnp.abs(py), radius)
        if repeat:
            t = t - jnp.floor(t)
        return jnp.clip(t, 0.0, 1.0)

    return run


def render_gradient(w: int, h: int, start, end, color_a, color_b,
                    shape=GradientShape.LINEAR, repeat=False,
                    base=None, eraser=False):
    """Render a two-color gradient (or eraser ramp over `base`)."""
    t = _gradient_t_fn(
        GradientShape(shape), (float(start[0]), float(start[1])),
        (float(end[0]), float(end[1])), bool(repeat), h, w
    )()[..., None]
    ca = jnp.asarray(np.asarray(color_a, f32))
    cb = jnp.asarray(np.asarray(color_b, f32))
    if eraser:
        if base is None:
            raise ValueError("eraser gradient needs a base image")
        src = jnp.asarray(base, jnp.uint8).astype(jnp.float32)
        alpha_scale = 1.0 - (1.0 - t)  # t: 0 at start (fully erased) .. 1 keep
        out_a = src[..., 3:4] * t[..., 0:1]
        out = jnp.concatenate([src[..., 0:3], out_a], axis=-1)
        return np.asarray(round_u8(out))
    out = ca[None, None, :] * (1.0 - t) + cb[None, None, :] * t
    return np.asarray(round_u8(out))
