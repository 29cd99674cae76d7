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


from paintfe_tpu.ops.common import masked as _masked  # shared (one def)


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

    # Per-LEVEL separable box sums instead of per-TAP one-hot histograms:
    # the intensity bin map is computed once on the padded source; each of
    # the n_levels bins then needs four (2r+1)-wide sliding sums (count +
    # r/g/b), all exact integer adds, with the modal bin tracked online
    # (strict > keeps the first max, the reference's tie order).  Identical
    # sums/counts/tie-break -> bit-equal to the tap formulation, ~200x less
    # work (605 ms -> ~tens of ms per 4K frame at r=3, levels=20).
    @jax.jit
    def run(img):
        src = img.astype(jnp.uint32)
        padded = _pad_xy(src, r)  # [h + 2r, w + 2r, 4]
        inten = jnp.minimum(
            (padded[..., 0] + padded[..., 1] + padded[..., 2]) // 3
            * n_levels // 256,
            n_levels - 1,
        ).astype(jnp.int32)

        def box(m):  # [h + 2r, w + 2r] u32 -> [h, w] window sum
            horiz = m[:, 0:w]
            for dx in range(1, 2 * r + 1):
                horiz = horiz + m[:, dx:dx + w]
            out = horiz[0:h]
            for dy in range(1, 2 * r + 1):
                out = out + horiz[dy:dy + h]
            return out

        best_cnt = jnp.zeros((h, w), jnp.uint32)
        best_r = jnp.zeros((h, w), jnp.uint32)
        best_g = jnp.zeros((h, w), jnp.uint32)
        best_b = jnp.zeros((h, w), jnp.uint32)
        for lvl in range(n_levels):
            ind = (inten == lvl).astype(jnp.uint32)
            cnt = box(ind)
            rs = box(ind * padded[..., 0])
            gs = box(ind * padded[..., 1])
            bs = box(ind * padded[..., 2])
            take = cnt > best_cnt
            best_cnt = jnp.where(take, cnt, best_cnt)
            best_r = jnp.where(take, rs, best_r)
            best_g = jnp.where(take, gs, best_g)
            best_b = jnp.where(take, bs, best_b)

        safe = jnp.maximum(best_cnt, 1)
        rgb = jnp.stack(
            [best_r // safe, best_g // safe, best_b // safe], axis=-1
        ).astype(jnp.uint8)
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
