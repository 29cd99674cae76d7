"""Glitch effects: pixel drag (row shifts), RGB displace.

Behavioral contract: src/ops/effects/glitch.rs — pixel_drag_core (:44-99),
rgb_displace_core (:142-196).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from paintfe_tpu.utils.hashing import hash_f32

f32 = np.float32


from paintfe_tpu.ops.common import masked as _masked  # shared (one def)


@functools.lru_cache(maxsize=32)
def _pixel_drag_fn(seed, amount, distance, direction, h, w):
    dir_rad = f32(f32(direction) * (f32(np.pi) / f32(180.0)))
    dx_dir = f32(np.cos(dir_rad))
    dy_dir = f32(np.sin(dir_rad))
    dist = f32(max(distance, 1))
    thresh = f32(f32(amount) / f32(100.0))

    @jax.jit
    def run(img):
        ys = jnp.arange(h, dtype=jnp.uint32)
        row_hash = hash_f32(ys, jnp.zeros_like(ys), seed)
        affected = row_hash <= thresh  # reference skips rows with hash > amount/100
        drag = (hash_f32(ys, jnp.ones_like(ys), seed) * dist).astype(jnp.int32)
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        dragf = drag.astype(jnp.float32)[:, None]
        sxf = xs - dragf * dx_dir
        syf = jnp.arange(h, dtype=jnp.float32)[:, None] - dragf * dy_dir
        sx = jnp.clip(
            (jnp.sign(sxf) * jnp.floor(jnp.abs(sxf) + 0.5)).astype(jnp.int32), 0, w - 1
        )
        sy = jnp.clip(
            (jnp.sign(syf) * jnp.floor(jnp.abs(syf) + 0.5)).astype(jnp.int32), 0, h - 1
        )
        sy = sy * jnp.ones((1, w), jnp.int32)
        dragged = img[sy, sx]
        return jnp.where(affected[:, None, None], dragged, img)

    return run


def pixel_drag(img, seed: int, amount: float, distance: int, direction: float,
               mask=None):
    """Rows with hash(y,0,seed) <= amount/100 shift by hash(y,1,seed)*distance
    along direction (glitch.rs:44-99)."""
    h, w = img.shape[:2]
    out = _pixel_drag_fn(int(seed), float(amount), int(distance), float(direction), h, w)(img)
    return _masked(img, out, mask)


@functools.lru_cache(maxsize=32)
def _rgb_displace_fn(r_off, g_off, b_off, h, w):
    def idx(off):
        xi = np.clip(np.arange(w) + off[0], 0, w - 1)
        yi = np.clip(np.arange(h) + off[1], 0, h - 1)
        return yi, xi

    (ry, rx), (gy, gx), (by, bx) = idx(r_off), idx(g_off), idx(b_off)

    @jax.jit
    def run(img):
        return jnp.stack(
            [
                img[ry][:, rx][..., 0],
                img[gy][:, gx][..., 1],
                img[by][:, bx][..., 2],
                img[..., 3],
            ],
            axis=-1,
        )

    return run


def rgb_displace(img, r_offset=(0, 0), g_offset=(0, 0), b_offset=(0, 0), mask=None):
    """Per-channel integer offset sample; alpha from center (glitch.rs:142-196)."""
    h, w = img.shape[:2]
    out = _rgb_displace_fn(tuple(r_offset), tuple(g_offset), tuple(b_offset), h, w)(img)
    return _masked(img, out, mask)
