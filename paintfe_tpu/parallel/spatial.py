"""Spatial sharding: one huge canvas split across chips.

Batch sharding (parallel/pipeline.py) covers the many-images case; this
module covers the one-giant-image case (the reference clamps documents at
256 Mpix — src/canvas/tiled_image.rs:14-26 — which exceeds a single chip's
appetite for fused f32 intermediates).  The image's row axis is sharded
over the mesh with `jax.sharding.NamedSharding`; ops stay the ordinary
jitted functions, and XLA's SPMD partitioner inserts the halo exchanges
(collective-permutes over ICI) that neighborhood ops like the separable
blur need at shard boundaries — no manual communication code, and results
are bit-identical to the single-device run.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def rows_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the row axis of a single image."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("rows",))


def rows_sharding(mesh: Mesh) -> NamedSharding:
    """[H, W, 4] image sharded by rows."""
    return NamedSharding(mesh, P("rows", None, None))


def process_spatial(img, fn: Callable, mesh: Optional[Mesh] = None):
    """Run `fn(image) -> image` on one image with its rows sharded over the
    mesh.  `fn` is any jittable op or op chain built from this framework's
    kernels; XLA partitions it and adds the boundary halo exchanges.

    Pads H to a multiple of the mesh size (edge-replicate, so convolution
    taps see the same neighborhood as the unpadded image) and crops back.
    Returns a committed sharded device array; np.asarray() gathers it.
    """
    mesh = mesh if mesh is not None else rows_mesh()
    n = mesh.devices.size
    img = jnp.asarray(img)
    h = img.shape[0]
    pad = (-h) % n
    if pad:
        img = jnp.concatenate([img, jnp.repeat(img[-1:], pad, axis=0)], axis=0)
    sharding = rows_sharding(mesh)
    sharded = jax.device_put(img, sharding)
    out = jax.jit(fn, out_shardings=sharding)(sharded)
    return out[:h] if pad else out


def composite_spatial(layers, modes, opacities, mesh: Optional[Mesh] = None):
    """Flatten a layer stack whose rows are sharded over the mesh: the
    [N, H, W, 4] stack is placed with H split across devices and the fused
    static compositor runs fully parallel (pointwise — no halos needed)."""
    from paintfe_tpu.core.composite import composite_stack_static

    mesh = mesh if mesh is not None else rows_mesh()
    n = mesh.devices.size
    layers = jnp.asarray(layers, jnp.uint8)
    h = layers.shape[1]
    pad = (-h) % n
    if pad:
        layers = jnp.pad(layers, ((0, 0), (0, pad), (0, 0), (0, 0)))
    sharding = NamedSharding(mesh, P(None, "rows", None, None))
    placed = jax.device_put(layers, sharding)
    modes = tuple(int(m) for m in modes)
    opacities = jnp.asarray(opacities, jnp.float32)
    out = composite_stack_static(placed, modes, opacities)
    return out[:h]
