"""Quantization helpers matching the reference's u8 semantics.

The reference (Rust) uses two distinct float->u8 quantizations:
  * effects/adjustments: ``v.round().clamp(0, 255) as u8`` — round half away
    from zero (src/ops/effects.rs:91-95).  For non-negative clamped values
    this equals ``floor(v + 0.5)``.
  * the blend compositor: ``(v * 255.0).clamp(0.0, 255.0) as u8`` — a
    *truncating* saturating cast (src/canvas/canvas_state.rs:1418-1422).

Pixel-exact golden parity requires reproducing both exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_div(x, c):
    """IEEE-correct division by a compile-time constant.

    Two hardware hazards break golden parity at u8 rounding boundaries:
    * XLA's algebraic simplifier rewrites `x / const` into `x * (1/const)`
      (1 ulp off for non-power-of-two constants) — defeated by hiding the
      divisor behind an optimization barrier, forcing a true divide.
    * The TPU VPU's divide itself is reciprocal-based and not correctly
      rounded (measured: 255.0/255.0 -> 0.99999994, wrong for 255 of the
      256 u8 numerators).  One Newton step (q + (x - q*c)/c) restores the
      exact IEEE quotient there.  On CPU the hardware divide is already
      correctly rounded and — without FMA — the refinement can perturb it,
      so the step is applied only on TPU.
    """
    cb = jax.lax.optimization_barrier(jnp.float32(c))
    q = x / cb
    if jax.default_backend() == "tpu":
        q = q + (x - q * cb) / cb
    return q


def exact_div_hw(x, c):
    """IEEE-correct division by a runtime tensor divisor.

    The TPU VPU divide is ~1 ulp off (see exact_div); one Newton step fixes
    it.  On CPU the hardware divide is already correctly rounded, and the
    FMA-less refinement could perturb it, so it applies on TPU only.
    """
    q = x / c
    if jax.default_backend() == "tpu":
        q = q + (x - q * c) / c
    return q


def round_u8(x):
    """Round-half-up then clamp to [0, 255] and truncate to u8.

    Matches Rust ``v.round().clamp(0,255) as u8`` for all finite v (values
    below 0.5 floor to <=0 and clamp to 0 either way).
    """
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


def trunc_u8(x):
    """Clamp to [0, 255] then truncate toward zero (Rust saturating `as u8`)."""
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def to_f32(u8_img):
    """u8 -> f32 in [0, 255] (no normalization)."""
    return u8_img.astype(jnp.float32)


def to_unit(u8_img):
    """u8 -> f32 in [0, 1] (divide by 255, matching reference normalization)."""
    return u8_img.astype(jnp.float32) / 255.0
