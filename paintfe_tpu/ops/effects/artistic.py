"""Artistic effects: ink (Sobel), oil painting (modal intensity bin), color filter.

Behavioral contract: src/ops/effects/artistic.rs — ink_core (:31-101),
oil_painting_core (:123-218), color_filter_core (:218-310).
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from paintfe_tpu.utils.quant import exact_div, round_u8

f32 = np.float32


def _masked(img, out, mask):
    if mask is None:
        return out
    return jnp.where((mask > 0)[..., None], out, img)


def _pad_xy(img, r):
    """Edge-replicate pad both axes; taps become fusable static slices."""
    p = jnp.concatenate(
        [jnp.repeat(img[:1], r, 0), img, jnp.repeat(img[-1:], r, 0)], axis=0
    )
    return jnp.concatenate(
        [jnp.repeat(p[:, :1], r, 1), p, jnp.repeat(p[:, -1:], r, 1)], axis=1
    )


def _tap(padded, r, dx, dy, h, w):
    row = jax.lax.slice_in_dim(padded, r + dy, r + dy + h, axis=0)
    return jax.lax.slice_in_dim(row, r + dx, r + dx + w, axis=1)


@functools.lru_cache(maxsize=32)
def _ink_fn(edge_strength: float, thresh: float, h: int, w: int):
    es = f32(edge_strength)

    @jax.jit
    def run(img):
        src = img.astype(jnp.float32)
        lum = 0.2126 * src[..., 0] + 0.7152 * src[..., 1] + 0.0722 * src[..., 2]
        lpad = _pad_xy(lum[..., None], 1)[..., 0]

        def lm(dx, dy):
            row = jax.lax.slice_in_dim(lpad, 1 + dy, 1 + dy + h, axis=0)
            return jax.lax.slice_in_dim(row, 1 + dx, 1 + dx + w, axis=1)

        gx = (
            -lm(-1, -1) - 2.0 * lm(-1, 0) - lm(-1, 1)
            + lm(1, -1) + 2.0 * lm(1, 0) + lm(1, 1)
        )
        gy = (
            -lm(-1, -1) - 2.0 * lm(0, -1) - lm(1, -1)
            + lm(-1, 1) + 2.0 * lm(0, 1) + lm(1, 1)
        )
        edge = exact_div(jnp.sqrt(gx * gx + gy * gy) * es, 100.0)
        val = jnp.where(edge > thresh, 0, 255).astype(jnp.uint8)
        return jnp.stack([val, val, val, img[..., 3]], axis=-1)

    return run


def ink(img, edge_strength: float, threshold: float, mask=None):
    """Sobel on BT.709 luma -> thresholded black/white (artistic.rs:31-101).

    Caveat: gx/gy accumulate in the reference's expression order for f32
    parity.
    """
    h, w = img.shape[:2]
    out = _ink_fn(float(edge_strength), float(threshold), h, w)(img)
    return _masked(img, out, mask)


@functools.lru_cache(maxsize=32)
def _oil_fn(r: int, levels: int, h: int, w: int):
    n_levels = int(np.clip(levels, 2, 64))
    # The per-pixel binned histogram needs [n_levels, rows, W, 3] working
    # tensors — 2 GB for a 4K frame if done whole-image.  Process row strips
    # so the working set stays bounded (identical math, strip-local taps
    # read from the shared padded source).
    strip = min(128, h)
    n_strips = -(-h // strip)

    hp = n_strips * strip

    @jax.jit
    def run(img):
        src = img.astype(jnp.uint32)
        padded = _pad_xy(src, r)  # [h + 2r, w + 2r, 4]
        if hp > h:  # make all strips full so lax.map traces one body
            padded = jnp.concatenate(
                [padded, jnp.zeros((hp - h, w + 2 * r, 4), jnp.uint32)], axis=0
            )

        def strip_body(y0):
            block = jax.lax.dynamic_slice(
                padded, (y0, 0, 0), (strip + 2 * r, w + 2 * r, 4)
            )
            counts = jnp.zeros((n_levels, strip, w), jnp.uint32)
            sums = jnp.zeros((n_levels, strip, w, 3), jnp.uint32)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    p = _tap(block, r, dx, dy, strip, w)
                    inten = jnp.minimum(
                        (p[..., 0] + p[..., 1] + p[..., 2]) // 3 * n_levels // 256,
                        n_levels - 1,
                    ).astype(jnp.int32)
                    one_hot = (
                        jnp.arange(n_levels, dtype=jnp.int32)[:, None, None]
                        == inten[None]
                    )
                    counts = counts + one_hot.astype(jnp.uint32)
                    sums = sums + one_hot[..., None].astype(jnp.uint32) * p[None, ..., 0:3]
            # Modal bin: first index with the max count (reference keeps
            # first on ties via strict >).
            max_idx = jnp.argmax(counts, axis=0)
            max_count = jnp.take_along_axis(counts, max_idx[None], axis=0)[0]
            picked = jnp.take_along_axis(sums, max_idx[None, ..., None], axis=0)[0]
            return (picked // jnp.maximum(max_count, 1)[..., None]).astype(jnp.uint8)

        strips = jax.lax.map(strip_body, jnp.arange(n_strips) * strip)
        rgb = strips.reshape(hp, w, 3)[:h]
        return jnp.concatenate([rgb, img[..., 3:4]], axis=-1)

    return run


def oil_painting(img, radius: int, levels: int, mask=None):
    """Modal-intensity-bin mean color (artistic.rs:123-218)."""
    h, w = img.shape[:2]
    out = _oil_fn(int(np.clip(radius, 1, 10)), int(levels), h, w)(img)
    return _masked(img, out, mask)


class ColorFilterMode(enum.IntEnum):
    MULTIPLY = 0
    SCREEN = 1
    OVERLAY = 2
    SOFT_LIGHT = 3


@functools.lru_cache(maxsize=32)
def _color_filter_fn(fc, intensity: float, mode, h: int, w: int):
    inten = f32(intensity)
    fcs = tuple(f32(c) / f32(255.0) for c in fc[:3])

    @jax.jit
    def run(img):
        src = img.astype(jnp.float32)

        def blend(s, fv):
            if mode == ColorFilterMode.MULTIPLY:
                return s * fv
            if mode == ColorFilterMode.SCREEN:
                return 1.0 - (1.0 - s) * (1.0 - fv)
            if mode == ColorFilterMode.OVERLAY:
                return jnp.where(s < 0.5, 2.0 * s * fv, 1.0 - 2.0 * (1.0 - s) * (1.0 - fv))
            if fv < 0.5:
                return s - (1.0 - 2.0 * fv) * s * (1.0 - s)
            return s + (2.0 * fv - 1.0) * (jnp.sqrt(s) - s)

        chans = []
        for c in range(3):
            s = exact_div(src[..., c], 255.0)
            chans.append((s * (1.0 - inten) + blend(s, fcs[c]) * inten) * 255.0)
        out = jnp.stack(chans + [src[..., 3]], axis=-1)
        return round_u8(out)

    return run


def color_filter(img, filter_color, intensity: float, mode=ColorFilterMode.MULTIPLY,
                 mask=None):
    """Per-channel constant-color blend lerped by intensity (artistic.rs:218-310)."""
    h, w = img.shape[:2]
    out = _color_filter_fn(
        tuple(int(c) for c in filter_color), float(intensity),
        ColorFilterMode(mode), h, w
    )(img)
    return _masked(img, out, mask)
