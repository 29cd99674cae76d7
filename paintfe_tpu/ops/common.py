"""Shared op helpers: ONE definition of the selection-mask merge and the
coordinate-grid idiom (they were copy-pasted across every effects module;
a future semantics change must land exactly once)."""

from __future__ import annotations

import jax.numpy as jnp


def masked(img, out, mask):
    """Selection-aware result merge: masked-out pixels keep the input
    (mask is u8 [H, W], 0 = unselected; None = everything selected)."""
    if mask is None:
        return out
    return jnp.where((mask > 0)[..., None], out, img)


def coord_grids(h: int, w: int):
    """f32 pixel-coordinate grids (xs [H, W], ys [H, W])."""
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    return xs, ys
