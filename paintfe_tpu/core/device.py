"""Device-residency management — the accelerator buffer cache.

Behavioral contract: src/gpu/renderer.rs — per-layer texture cache keyed by
a generation counter (`ensure_layer_texture` :324, `layer_is_current` :427),
VRAM accounting (:953-965), and the transfer-minimisation discipline
(upload only what changed; keep composites device-resident).  Here the
"texture" is a jax device array; jit outputs stay in HBM until the host
asks for bytes, so the cache's job is avoiding re-uploads of unchanged
layers between composites.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceLayerCache:
    """Keeps layer pixel buffers device-resident, keyed by layer identity +
    generation.  Callers bump the generation when they mutate in place
    (ops that replace layer.pixels get picked up by object identity)."""

    def __init__(self, device=None):
        self.device = device
        self._cache: Dict[int, Tuple[int, int, object]] = {}
        # layer key -> (generation, array id, device array)

    def _key(self, layer) -> int:
        return id(layer)

    def get(self, layer, generation: Optional[int] = None):
        """Device array for `layer.pixels`, uploading only when stale."""
        key = self._key(layer)
        gen = generation if generation is not None else -1
        arr_id = id(layer.pixels)
        hit = self._cache.get(key)
        if hit is not None:
            old_gen, old_arr_id, dev = hit
            if old_arr_id == arr_id and (generation is None or old_gen == gen):
                return dev
        dev = jnp.asarray(np.ascontiguousarray(layer.pixels, np.uint8))
        if self.device is not None:
            dev = jax.device_put(dev, self.device)
        self._cache[key] = (gen, arr_id, dev)
        return dev

    def invalidate(self, layer):
        self._cache.pop(self._key(layer), None)

    def clear(self):
        self._cache.clear()

    def memory_bytes(self) -> int:
        """Device-memory accounting (renderer.rs:953-965 analogue)."""
        return sum(int(np.prod(dev.shape)) for _, _, dev in self._cache.values())

    def resident_count(self) -> int:
        return len(self._cache)


def composite_device(canvas, cache: DeviceLayerCache):
    """Composite with device-resident layers; returns a device array (no
    readback — the composite_to_gpu analogue, renderer.rs:805)."""
    from paintfe_tpu.core.composite import composite_stack

    vis = [
        (i, l) for i, l in enumerate(canvas.layers)
        if canvas.layer_effectively_visible(i) and l.content != "adjustment"
    ]
    if not vis:
        return jnp.zeros((canvas.height, canvas.width, 4), jnp.uint8)
    stack = jnp.stack([cache.get(l) for _, l in vis])
    modes = jnp.asarray([int(l.blend_mode) for _, l in vis], jnp.int32)
    opacities = jnp.asarray([l.opacity for _, l in vis], jnp.float32)
    visibles = jnp.ones(len(vis), bool)
    return composite_stack(stack, modes, opacities, visibles)


def _bucket(v: int, step: int = 64) -> int:
    return ((v + step - 1) // step) * step


def composite_dirty_rect(canvas, cache: DeviceLayerCache, prev, rect):
    """Incremental recompute: re-composite only the dirty window and splice
    it into the previous device-resident composite.

    The reference's interactive loop recomposites and reads back only the
    dirty rect (canvas_state.rs:1511-1531 mark_dirty, renderer.rs:588
    dirty readback); the TPU analogue is a windowed composite +
    lax.dynamic_update_slice, leaving everything in HBM.  Window sizes are
    bucketed to 64 px so brush-sized edits reuse one compiled program.

    rect = (x0, y0, x1, y1) inclusive; `prev` is a [H, W, 4] device array.
    """
    from paintfe_tpu.core.composite import composite_stack_static

    x0, y0, x1, y1 = rect
    x0 = max(int(x0), 0)
    y0 = max(int(y0), 0)
    x1 = min(int(x1), canvas.width - 1)
    y1 = min(int(y1), canvas.height - 1)
    if x1 < x0 or y1 < y0:
        return prev
    bw = min(_bucket(x1 - x0 + 1), canvas.width - x0)
    bh = min(_bucket(y1 - y0 + 1), canvas.height - y0)

    vis = [
        (i, l) for i, l in enumerate(canvas.layers)
        if canvas.layer_effectively_visible(i) and l.content != "adjustment"
    ]
    if not vis:
        return prev
    windows = jnp.stack([
        jax.lax.dynamic_slice(cache.get(l), (y0, x0, 0), (bh, bw, 4))
        for _, l in vis
    ])
    modes = tuple(int(l.blend_mode) for _, l in vis)
    opacities = jnp.asarray([l.opacity for _, l in vis], jnp.float32)
    patch = composite_stack_static(windows, modes, opacities)
    return jax.lax.dynamic_update_slice(prev, patch, (y0, x0, 0))
