"""Layer-stack flattening (the compositor).

Behavioral contract: `CanvasState::composite_viewport`
(src/canvas/canvas_state.rs:482-698): fold visible layers bottom-up over a
transparent background with `blend_pixel_static`; live masks are
alpha-encoded *conceal* values that scale the layer alpha with u32 integer
math; adjustment layers transform the accumulated pixel in-stream.

TPU-first shape: the stack is one dense [L, H, W, 4] u8 array; the fold is a
`lax.scan` over L whose body dispatches the blend mode with `lax.switch`.
XLA fuses the whole thing into a single elementwise kernel over the image —
the reference's per-chunk rayon loop and COW-tile bookkeeping have no
equivalent here because a dense fused fold is the faster layout on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from paintfe_tpu.core.blend import blend_u8


@functools.partial(jax.jit)
def composite_stack(layers, modes, opacities, visibles, conceal=None, init=None):
    """Flatten a layer stack to one RGBA image.

    Args:
      layers: u8 [L, H, W, 4], bottom layer first.
      modes: i32 [L] blend-mode ids (BlendMode values).
      opacities: f32 [L] in [0, 1].
      visibles: bool [L].
      conceal: optional u8 [L, H, W] layer-mask conceal values (0 = show).
      init: optional u8 [H, W, 4] starting accumulator (default transparent).

    Returns: u8 [H, W, 4].
    """
    layers = jnp.asarray(layers, jnp.uint8)
    modes = jnp.asarray(modes, jnp.int32)
    opacities = jnp.asarray(opacities, jnp.float32)
    visibles = jnp.asarray(visibles, jnp.bool_)
    if conceal is None:
        conceal = jnp.zeros(layers.shape[:3], jnp.uint8)
    else:
        conceal = jnp.asarray(conceal, jnp.uint8)

    def body(acc, xs):
        px, mode, opacity, visible, mask = xs
        # Layer mask: conceal>0 scales alpha by (255-conceal)/255 in u32
        # integer math (canvas_state.rs:660-665).  conceal==0 is exact
        # identity under this formula, so no branch is needed.
        a = px[..., 3].astype(jnp.uint32) * (255 - mask.astype(jnp.uint32)) // 255
        px = px.at[..., 3].set(a.astype(jnp.uint8))
        out = blend_u8(acc, px, mode, opacity)
        out = jnp.where(visible, out, acc)
        return out, None

    if init is None:
        init = jnp.zeros(layers.shape[1:], jnp.uint8)
    else:
        init = jnp.asarray(init, jnp.uint8)
    result, _ = jax.lax.scan(body, init, (layers, modes, opacities, visibles, conceal))
    return result


@functools.lru_cache(maxsize=256)
def _static_composite_fn(modes: tuple, n_layers: int, has_conceal: bool,
                         has_init: bool):
    """Unrolled compositor for host-known blend modes.  Unlike the scan
    version, every blend inlines its single mode branch, so XLA fuses the
    whole fold into one elementwise kernel (the scan+switch version keeps a
    loop boundary that blocks fusion)."""

    def run(layers, opacities, conceal, init):
        acc = init if has_init else jnp.zeros(layers.shape[1:], jnp.uint8)
        for i, mode in enumerate(modes):
            px = layers[i]
            if has_conceal:
                a = px[..., 3].astype(jnp.uint32) * (255 - conceal[i].astype(jnp.uint32)) // 255
                px = px.at[..., 3].set(a.astype(jnp.uint8))
            acc = blend_u8(acc, px, int(mode), opacities[i])
        return acc

    return jax.jit(run)


def composite_stack_static(layers, modes, opacities, conceal=None, init=None):
    """Compositor specialized on a host-known mode tuple (fully fused)."""
    modes = tuple(int(m) for m in modes)
    layers = jnp.asarray(layers, jnp.uint8)
    opacities = jnp.asarray(opacities, jnp.float32)
    fn = _static_composite_fn(modes, layers.shape[0], conceal is not None,
                              init is not None)
    return fn(layers, opacities, conceal, init)


def composite_pair(base, top, mode, opacity):
    """Blend one layer over another (thin alias of blend_u8 for API parity)."""
    return blend_u8(base, top, mode, opacity)
