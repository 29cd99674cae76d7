"""Pallas TPU kernels for the convolution hot path.

The XLA pad+static-slice formulation (ops/filters.py) fully fuses and is
speed-of-light up to a few hundred taps, but its code size grows with the
radius (one slice+madd per tap: sigma-50 is 301 taps -> ~8s compile).  This
kernel is the constant-code-size alternative: the padded row tile stays
resident in VMEM and a `fori_loop` walks the taps with a dynamic lane
rotate — the analogue of the reference's shared-memory tile+apron GPU blur
(src/gpu/shaders.rs:919-1005), with VMEM playing the shared-memory role.

Accumulation is in tap order, so results are bit-identical to both the
reference's CPU loop and the unrolled XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paintfe_tpu.ops.filters import gaussian_kernel
from paintfe_tpu.utils.quant import round_u8

f32 = np.float32


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _make_conv_kernel(ntaps: int, out_w: int):
    def kernel(taps_ref, padded_ref, out_ref):
        """taps: [ntaps] f32 in SMEM; padded: [1, TH, Wp] f32 in VMEM;
        out: [1, TH, out_w]."""
        tile = padded_ref[0]

        def body(k, acc):
            tap = taps_ref[k]  # SMEM scalar read at a dynamic index
            rotated = pltpu.roll(tile, -k, axis=1)  # window start -> lane 0
            return acc + rotated[:, :out_w] * tap

        acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
        out_ref[0] = jax.lax.fori_loop(0, ntaps, body, acc)

    return kernel


@functools.lru_cache(maxsize=32)
def _pass_fn(ntaps: int, c: int, hp: int, w: int, wp: int, tile_h: int,
             interpret: bool):
    grid = (c, hp // tile_h)

    def run(padded, taps):
        return pl.pallas_call(
            _make_conv_kernel(ntaps, w),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tile_h, wp), lambda ci, ti: (ci, ti, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, w), lambda ci, ti: (ci, ti, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, hp, w), jnp.float32),
            interpret=interpret,
        )(taps, padded)

    return jax.jit(run)


def _conv_pass(planar: jnp.ndarray, taps: jnp.ndarray, r: int, tile_h: int,
               interpret: bool) -> jnp.ndarray:
    """One edge-clamped separable pass along the last axis of [C, H, W] f32."""
    c, h, w = planar.shape
    hp = _round_up(h, tile_h)
    wp = _round_up(w + 2 * r, 128)
    padded = jnp.concatenate(
        [jnp.repeat(planar[:, :, :1], r, 2), planar, jnp.repeat(planar[:, :, -1:], r, 2)],
        axis=2,
    )
    padded = jnp.pad(padded, ((0, 0), (0, hp - h), (0, wp - (w + 2 * r))))
    out = _pass_fn(int(taps.shape[0]), c, hp, w, wp, tile_h, interpret)(padded, taps)
    return out[:, :h, :]


def gaussian_blur_pallas(img, sigma: float, tile_h: int = 8,
                         interpret: bool = None):
    """Separable Gaussian for arbitrary radius, bit-identical to the
    reference (H pass u8->f32, V pass f32->u8 round-half-up)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    taps = jnp.asarray(gaussian_kernel(float(sigma)))
    r = int(taps.shape[0]) // 2
    planar = jnp.asarray(img).astype(jnp.float32).transpose(2, 0, 1)  # [C, H, W]
    hbuf = _conv_pass(planar, taps, r, tile_h, interpret)
    vbuf = _conv_pass(hbuf.transpose(0, 2, 1), taps, r, tile_h, interpret)
    out = vbuf.transpose(2, 1, 0)  # [C, W', H'] -> [H, W, C]
    return round_u8(out)
