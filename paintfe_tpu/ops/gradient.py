"""Gradient generation — the accelerator-backend gradient pipeline.

Behavioral contract: src/gpu/shaders.rs GRADIENT (:1276-1390) +
src/ui/panels/tools/state.rs (compute_t :1175-1229, rebuild_lut
:1063-1128): shapes Linear / LinearReflected / Radial / Diamond, clamp or
repeat, multi-stop LUT sampling (color = lut[u32(t*255)]), color or
eraser mode.  LinearReflected is a TRIANGLE wave peaked at the midpoint
(1 - |2t - 1|, rem_euclid(2) when repeating); a degenerate start==end
yields t = 0 everywhere (inv_len selects 0); the eraser bakes
luminance*stop_alpha into a mask and the commit multiplies layer alpha
by (1 - mask) with a truncating cast (canvas_state_impl.rs:415-421).
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from paintfe_tpu.utils.quant import exact_div

f32 = np.float32


class GradientShape(enum.IntEnum):
    LINEAR = 0
    LINEAR_REFLECTED = 1
    RADIAL = 2
    DIAMOND = 3


def gradient_lut(stops) -> np.ndarray:
    """256x4 u8 LUT from (position, rgba) stops (rebuild_lut parity:
    half-away rounding, first-matching segment, endpoint clamping)."""
    lut = np.zeros((256, 4), np.uint8)
    stops = list(stops)
    if not stops:
        return lut
    if len(stops) == 1:
        lut[:] = np.asarray(stops[0][1], np.uint8)
        return lut
    srt = sorted(stops, key=lambda s: s[0])
    for i in range(256):
        t = f32(i) / f32(255.0)
        if t <= srt[0][0]:
            lut[i] = np.asarray(srt[0][1], np.uint8)
        elif t >= srt[-1][0]:
            lut[i] = np.asarray(srt[-1][1], np.uint8)
        else:
            left, right = srt[0], srt[-1]
            for j in range(len(srt) - 1):
                if srt[j][0] <= t <= srt[j + 1][0]:
                    left, right = srt[j], srt[j + 1]
                    break
            span = f32(right[0]) - f32(left[0])
            lt = f32((t - f32(left[0])) / span) if span > 0.0 else f32(0.0)
            inv = f32(1.0) - lt
            lc = np.asarray(left[1], f32)
            rc = np.asarray(right[1], f32)
            lut[i] = np.floor(lc * inv + rc * lt + f32(0.5)).astype(np.uint8)
    return lut


@functools.lru_cache(maxsize=32)
def _gradient_t_fn(shape, start, end, repeat, h, w):
    sx, sy = f32(start[0]), f32(start[1])
    ex, ey = f32(end[0]), f32(end[1])
    dx, dy = ex - sx, ey - sy
    len_sq = f32(dx * dx + dy * dy)
    degenerate = len_sq < 1e-6  # shader: inv_len selects 0 -> t = 0

    @jax.jit
    def run():
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5 - sx
        ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5 - sy
        if degenerate:
            return jnp.zeros((h, w), jnp.float32)
        # the reference MULTIPLIES by host-computed f32 reciprocals
        # (perspective_gradient.rs:419-421: inv_len = 1.0/len,
        # inv_len_sq = 1.0/len_sq; :463/:481/:489-490 apply them per
        # term) — a true divide here is 1 ulp off for most inputs and
        # flips the u32(t*255) LUT index along iso-t contours
        inv_len_sq = f32(1.0) / len_sq
        inv_len = f32(1.0) / f32(np.sqrt(len_sq))
        if shape in (GradientShape.LINEAR, GradientShape.LINEAR_REFLECTED):
            raw = (xs * dx + ys * dy) * inv_len_sq
            if shape == GradientShape.LINEAR_REFLECTED:
                # triangle wave peaked at the midpoint (state.rs:1192-1201)
                if repeat:
                    t_mod = raw - jnp.floor(exact_div(raw, 2.0)) * 2.0
                    return jnp.where(t_mod > 1.0, 2.0 - t_mod, t_mod)
                return 1.0 - jnp.abs(2.0 * jnp.clip(raw, 0.0, 1.0) - 1.0)
        elif shape == GradientShape.RADIAL:
            raw = jnp.sqrt(xs * xs + ys * ys) * inv_len
        else:  # DIAMOND: (|proj| * inv_len) + (|perp| * inv_len)
            ux, uy = dx * inv_len, dy * inv_len
            proj = jnp.abs(xs * ux + ys * uy) * inv_len
            perp = jnp.abs(xs * (-uy) + ys * ux) * inv_len
            raw = proj + perp
        if repeat:
            return raw - jnp.floor(raw)
        return jnp.clip(raw, 0.0, 1.0)

    return run


def render_gradient(w: int, h: int, start, end, color_a=None, color_b=None,
                    shape=GradientShape.LINEAR, repeat=False,
                    base=None, eraser=False, stops=None):
    """Render a gradient (or eraser ramp over `base`).

    Either two colors (color_a at t=0, color_b at t=1) or explicit
    multi-stop `stops` = [(position, rgba), ...].  Colors come from the
    256-entry LUT at index u32(t*255) — the shader's quantized sampling,
    not a continuous lerp."""
    if stops is None:
        stops = [(0.0, color_a), (1.0, color_b)]
    lut = gradient_lut(stops)
    t = np.asarray(_gradient_t_fn(
        GradientShape(shape), (float(start[0]), float(start[1])),
        (float(end[0]), float(end[1])), bool(repeat), h, w
    )())
    idx = np.minimum((t * f32(255.0)).astype(np.int32), 255)  # u32 trunc
    color = lut[idx]  # [H, W, 4] u8
    if eraser:
        if base is None:
            raise ValueError("eraser gradient needs a base image")
        # mask = luminance * stop alpha, stored through rgba8unorm
        # (rounds); commit multiplies layer alpha by (1 - mask) with a
        # truncating cast, only where the mask alpha is nonzero
        cf = color.astype(f32) / f32(255.0)
        lum = (f32(0.299) * cf[..., 0] + f32(0.587) * cf[..., 1]
               + f32(0.114) * cf[..., 2])
        mask_u8 = np.floor(lum * cf[..., 3] * f32(255.0) + f32(0.5))
        src = np.asarray(base, np.uint8)
        cur_a = src[..., 3].astype(f32) / f32(255.0)
        new_a = (cur_a * (f32(1.0) - mask_u8.astype(f32) / f32(255.0))
                 * f32(255.0)).astype(np.uint8)  # truncating `as u8`
        out = src.copy()
        out[..., 3] = np.where(mask_u8 > 0, new_a, src[..., 3])
        return out
    return color
