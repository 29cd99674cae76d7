"""Additive noise generation (Uniform / Gaussian / Perlin).

Behavioral contract: src/ops/effects/noise.rs:52-143 — deterministic
coordinate-hash noise (bit-identical via paintfe_tpu.utils.hashing), colour
mode re-derives per channel with seed+0/1/2, strength = amount*255/100.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from paintfe_tpu.utils.hashing import hash_f32, turbulence_2d
from paintfe_tpu.utils.quant import exact_div, round_u8

f32 = np.float32


class NoiseType(enum.IntEnum):
    UNIFORM = 0
    GAUSSIAN = 1
    PERLIN = 2


from paintfe_tpu.ops.common import coord_grids, masked as _masked  # shared


@functools.lru_cache(maxsize=32)
def _noise_fn(amount, noise_type, monochrome, seed, scale, octaves, h, w):
    inv_scale = f32(1.0) / f32(max(scale, 0.1))
    oct_n = int(np.clip(octaves, 1, 8))
    strength = f32(f32(amount) * f32(255.0) / f32(100.0))

    @jax.jit
    def run(img):
        xs, ys = coord_grids(h, w)
        sx = xs * inv_scale
        sy = ys * inv_scale
        qx = jnp.floor(xs * inv_scale).astype(jnp.int32)
        qy = jnp.floor(ys * inv_scale).astype(jnp.int32)

        def chan_noise(s):
            if noise_type == NoiseType.PERLIN:
                return turbulence_2d(sx, sy, s, oct_n, 0.5) * 2.0 - 1.0
            return hash_f32(qx, qy, s) * 2.0 - 1.0

        if noise_type == NoiseType.UNIFORM:
            base = hash_f32(qx, qy, seed) * 2.0 - 1.0
        elif noise_type == NoiseType.GAUSSIAN:
            u1 = jnp.maximum(hash_f32(qx, qy, seed), 0.0001)
            u2 = hash_f32(qx, qy, (seed + 7) & 0xFFFFFFFF)
            base = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * f32(np.pi) * u2) * 0.33
        else:
            base = turbulence_2d(sx, sy, seed, oct_n, 0.5) * 2.0 - 1.0

        src = img.astype(jnp.float32)
        if monochrome:
            n = base * strength
            out = jnp.stack(
                [src[..., 0] + n, src[..., 1] + n, src[..., 2] + n, src[..., 3]],
                axis=-1,
            )
        else:
            nr = chan_noise(seed) * strength
            ng = chan_noise((seed + 1) & 0xFFFFFFFF) * strength
            nb = chan_noise((seed + 2) & 0xFFFFFFFF) * strength
            out = jnp.stack(
                [src[..., 0] + nr, src[..., 1] + ng, src[..., 2] + nb, src[..., 3]],
                axis=-1,
            )
        return round_u8(out)

    return run


def add_noise(img, amount, noise_type=NoiseType.UNIFORM, monochrome=False,
              seed=42, scale=1.0, octaves=1, mask=None):
    h, w = img.shape[:2]
    out = _noise_fn(
        float(amount), NoiseType(noise_type), bool(monochrome), int(seed),
        float(scale), int(octaves), h, w
    )(img)
    return _masked(img, out, mask)
