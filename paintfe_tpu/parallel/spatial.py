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

import functools
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
    out = _process_spatial_fn(fn, sharding)(sharded)
    return out[:h] if pad else out


@functools.lru_cache(maxsize=64)
def _process_spatial_fn(fn: Callable, sharding):
    """Cached jit wrapper per (fn, sharding) — a fresh jax.jit per call is
    a jit cache MISS every call (the CLAUDE.md hard-won rule; ~3 s/frame
    measured on this rig before _fused_chain_spatial_fn was cached)."""
    return jax.jit(fn, out_shardings=sharding)


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


@functools.lru_cache(maxsize=32)
def _fused_chain_spatial_fn(mesh: Mesh, r: int, params_items: tuple):
    """Jitted shard_map program for (mesh, halo radius, params) — cached so
    repeated calls are jit cache HITS (a fresh shard_map closure per call
    would retrace + relower every frame)."""
    from paintfe_tpu.ops.fused_chain import fused_chain_kernel

    n = mesh.devices.size
    params = dict(params_items)

    def local(block, ov_block):
        if r == 0:  # blur has no taps (sigma ~ 0): pointwise, no halo
            return fused_chain_kernel(block, ov_block, **params)
        extended = _halo_extend(block, r, n)
        ov_ext = jnp.pad(ov_block, ((r, r), (0, 0), (0, 0)))
        out = fused_chain_kernel(extended, ov_ext, **params)
        return out[r:-r]

    fn = _shard_map(local, mesh, (P("rows", None, None),) * 2,
                    P("rows", None, None))
    return jax.jit(fn)


def grid_mesh(n_batch: int, n_rows: int,
              devices: Optional[Sequence] = None) -> Mesh:
    """2-D mesh ('batch', 'rows'): data parallelism over images x spatial
    parallelism within each image — the production layout for batches of
    canvases too large for one chip's fused-f32 appetite."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_batch * n_rows, (
        f"need {n_batch * n_rows} devices, have {len(devices)}")
    grid = np.array(devices[:n_batch * n_rows]).reshape(n_batch, n_rows)
    return Mesh(grid, ("batch", "rows"))


@functools.lru_cache(maxsize=32)
def _fused_chain_grid_fn(mesh: Mesh, r: int, params_items: tuple):
    """Jitted shard_map program over the 2-D ('batch', 'rows') mesh: each
    device holds a [B/nb, H/nr, W, 4] block, exchanges its r boundary rows
    with its 'rows' neighbors (ppermute moves the whole local batch slab
    in one collective), and runs the Pallas mega-kernel per local image
    (lax.map — images are processed sequentially per device, which is the
    natural schedule; parallelism comes from the mesh)."""
    from paintfe_tpu.ops.fused_chain import fused_chain_kernel

    n_rows = mesh.shape["rows"]
    params = dict(params_items)

    def local(blk, ov_blk):  # [b, h_blk, w, 4] u8 x2
        if r == 0:  # blur has no taps (sigma ~ 0): pointwise, no halo
            ext, ov_ext = blk, ov_blk
        else:
            idx = jax.lax.axis_index("rows")
            up = jax.lax.ppermute(blk[:, -r:], "rows",
                                  [(i, i + 1) for i in range(n_rows - 1)])
            down = jax.lax.ppermute(blk[:, :r], "rows",
                                    [(i + 1, i) for i in range(n_rows - 1)])
            top = jnp.where(idx == 0, jnp.repeat(blk[:, :1], r, axis=1), up)
            bottom = jnp.where(idx == n_rows - 1,
                               jnp.repeat(blk[:, -1:], r, axis=1), down)
            ext = jnp.concatenate([top, blk, bottom], axis=1)
            ov_ext = jnp.concatenate(
                [jnp.zeros_like(top), ov_blk, jnp.zeros_like(bottom)], axis=1)

        def one(pair):
            img, ov = pair
            out = fused_chain_kernel(img, ov, **params)
            return out[r:-r] if r else out

        return jax.lax.map(one, (ext, ov_ext))

    fn = _shard_map(local, mesh,
                    (P("batch", "rows", None, None),) * 2,
                    P("batch", "rows", None, None))
    return jax.jit(fn)


def fused_chain_grid(imgs, overlays, mesh: Mesh, **params):
    """The headline fused chain over a batch of images on the 2-D
    ('batch', 'rows') mesh: images shard over 'batch', each image's rows
    over 'rows' with ICI halo exchange.  Bit-identical to running
    fused_chain_kernel per image on one device.  B must be padded to a
    multiple of the batch axis by the caller (or pass B divisible)."""
    from paintfe_tpu.ops.filters import gaussian_kernel

    nb, nr = mesh.shape["batch"], mesh.shape["rows"]
    sigma = params.get("sigma", 2.0)
    r = int(gaussian_kernel(float(sigma)).shape[0] - 1) // 2

    imgs = jnp.asarray(imgs, jnp.uint8)
    overlays = jnp.asarray(overlays, jnp.uint8)
    b, h = imgs.shape[0], imgs.shape[1]
    if b % nb != 0:
        raise ValueError(f"batch {b} not divisible by mesh batch axis {nb}")
    pad = (-h) % nr
    if (h + pad) // nr < r:
        from paintfe_tpu.ops.fused_chain import fused_chain_kernel

        outs = [fused_chain_kernel(imgs[i], overlays[i], **params)
                for i in range(b)]
        return jnp.stack(outs, axis=0)
    if pad:
        imgs = jnp.concatenate(
            [imgs, jnp.repeat(imgs[:, -1:], pad, axis=1)], axis=1)
        overlays = jnp.concatenate(
            [overlays, jnp.repeat(overlays[:, -1:], pad, axis=1)], axis=1)
    sharding = NamedSharding(mesh, P("batch", "rows", None, None))
    fn = _fused_chain_grid_fn(mesh, r, tuple(sorted(params.items())))
    out = fn(jax.device_put(imgs, sharding),
             jax.device_put(overlays, sharding))
    return out[:, :h]


def _shard_map(local, mesh, in_specs, out_specs):
    """shard_map with the replication checker disabled (pallas out_shape
    carries no vma info); kwarg renamed check_rep -> check_vma across jax
    versions."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    try:
        return shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax
        return shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _halo_extend(block, r, n):
    """Exchange r boundary rows with mesh neighbors over ICI (ppermute);
    edge shards replicate their own edge rows (matches single-device
    edge-pad semantics)."""
    idx = jax.lax.axis_index("rows")
    up = jax.lax.ppermute(block[-r:], "rows",
                          [(i, i + 1) for i in range(n - 1)])
    down = jax.lax.ppermute(block[:r], "rows",
                            [(i + 1, i) for i in range(n - 1)])
    top = jnp.where(idx == 0, jnp.repeat(block[:1], r, axis=0), up)
    bottom = jnp.where(idx == n - 1, jnp.repeat(block[-1:], r, axis=0), down)
    return jnp.concatenate([top, block, bottom], axis=0)


@functools.lru_cache(maxsize=32)
def _median_spatial_fn(mesh: Mesh, r: int, interpret: bool):
    """Jitted shard_map program for the tiled-median Pallas kernel: each
    shard halo-extends its row block by r (ppermute over ICI) and runs the
    VMEM median kernel (ops/pallas_kernels.median_pallas) on the extended
    block.  The kernel's own edge-replicate padding then only affects the
    halo rows, which are cropped — so results are bit-identical to the
    single-device kernel.  Cached per (mesh, r): the kernel's
    scalar-prefetched dynamic-offset DMA makes it the most
    partition-fragile pattern in the repo; this program certifies it under
    a real mesh partitioner."""
    from paintfe_tpu.ops.pallas_kernels import median_pallas

    n = mesh.devices.size

    def local(block):
        extended = _halo_extend(block, r, n)
        out = median_pallas(extended, r, interpret=interpret)
        return out[r:-r]

    fn = _shard_map(local, mesh, (P("rows", None, None),),
                    P("rows", None, None))
    return jax.jit(fn)


def median_spatial(img, r: int, mesh: Optional[Mesh] = None):
    """Window median of one row-sharded image on the mesh; bit-identical
    to ops/pallas_kernels.median_pallas single-device."""
    from paintfe_tpu.ops.pallas_kernels import median_pallas

    mesh = mesh if mesh is not None else rows_mesh()
    n = mesh.devices.size
    interpret = jax.default_backend() != "tpu"
    img = jnp.asarray(img, jnp.uint8)
    h = img.shape[0]
    if r <= 0 or (h + ((-h) % n)) // n < r:
        # r == 0 is the identity window (no halo, and the [r:-r] crop
        # would be empty); shard blocks shorter than the halo radius
        # can't source their neighbors' r rows from one ppermute
        return median_pallas(img, r, interpret=interpret)
    pad = (-h) % n
    if pad:
        img = jnp.concatenate([img, jnp.repeat(img[-1:], pad, axis=0)], axis=0)
    sharding = rows_sharding(mesh)
    placed = jax.device_put(img, sharding)
    out = _median_spatial_fn(mesh, int(r), interpret)(placed)
    return out[:h]


@functools.lru_cache(maxsize=32)
def _warp_spatial_fn(mesh: Mesh, wh: int, s_sweep: int, hb: int, w: int,
                     src_h: int, src_w: int, mode: str, interpret: bool):
    """Jitted shard_map program for the warp sweep-gather kernel: the
    source image is replicated (a warp gathers from arbitrary rows, so
    locality can't be assumed), the displacement field is row-sharded, and
    each shard plans its own DMA windows (`_window_params` on its block)
    and launches the Pallas kernel with the fleet-wide (wh, s) buckets.
    Per-shard spans are subsets of the full-field spans, so buckets chosen
    by a full-field plan are feasible on every shard."""
    from paintfe_tpu.ops import warp_kernel as wk

    hp = wk._round_up(hb, wk.TH)
    wp = wk._round_up(w, wk.TW)
    ww = wk._window_width(s_sweep)
    gh, gw = hp // wk.TH, wp // wk.TW
    kernel = wk._make_kernel(wh, s_sweep, wk.TH, wk.TW, ww, src_h, src_w,
                             gw, mode)

    def local(src_u8, sxb, syb):
        sxp = jnp.pad(sxb, ((0, hp - hb), (0, wp - w)))
        syp = jnp.pad(syb, ((0, hp - hb), (0, wp - w)))
        oy, ox, _, _ = wk._window_params(sxp, syp, src_h, src_w, hb, w)
        return wk._launch(kernel, src_u8, sxp, syp, oy, ox, wh, ww, gh, gw,
                          hp, wp, hb, w, interpret)

    fn = _shard_map(local, mesh,
                    (P(None, None, None), P("rows", None), P("rows", None)),
                    P("rows", None, None))
    return jax.jit(fn)


def warp_spatial(src, sx, sy, mode: str = "zero",
                 mesh: Optional[Mesh] = None):
    """Bilinear warp gather with the displacement field row-sharded over
    the mesh (ops/warp_kernel.gather_bilinear_u8 semantics).  Returns None
    when the field is infeasible for the sweep kernel (same contract as
    the single-device path)."""
    from paintfe_tpu.ops import warp_kernel as wk

    mesh = mesh if mesh is not None else rows_mesh()
    n = mesh.devices.size
    interpret = jax.default_backend() != "tpu"
    src_u8 = jnp.asarray(src, jnp.uint8)
    src_h, src_w = src_u8.shape[0], src_u8.shape[1]
    sxf = jnp.asarray(sx, jnp.float32)
    syf = jnp.asarray(sy, jnp.float32)
    h, w = sxf.shape

    planned = wk.plan(sxf, syf, src_h, src_w)
    if planned is None:
        return None
    _, _, wh, s_sweep = planned

    # Pad H to a multiple of n * TH so every shard-local tile coincides
    # with a full-field tile (same absolute row groups) — per-shard spans
    # are then exactly the planned spans and the buckets stay feasible.
    # Pad rows replicate the last row's taps (already included in the
    # plan), never new geometry.
    pad = (-h) % (n * wk.TH)
    if pad:
        sxf = jnp.concatenate([sxf, jnp.repeat(sxf[-1:], pad, axis=0)],
                              axis=0)
        syf = jnp.concatenate([syf, jnp.repeat(syf[-1:], pad, axis=0)],
                              axis=0)
    hb = (h + pad) // n
    sharding = NamedSharding(mesh, P("rows", None))
    fn = _warp_spatial_fn(mesh, wh, s_sweep, hb, w, src_h, src_w, mode,
                          interpret)
    out = fn(jax.device_put(src_u8, NamedSharding(mesh, P(None, None, None))),
             jax.device_put(sxf, sharding), jax.device_put(syf, sharding))
    return out[:h]


def fused_chain_spatial(img, overlay, mesh: Optional[Mesh] = None, **params):
    """The headline fused chain (ops/fused_chain.fused_chain_kernel) over a
    row-sharded mesh: each shard exchanges its r boundary rows with its
    neighbors over ICI (jax.lax.ppermute), runs the Pallas mega-kernel on
    its halo-extended block, and crops — the scaling-book recipe (shard,
    exchange halos, compute locally) applied to an image kernel.  Boundary
    shards replicate their own edge rows where no neighbor exists, so the
    result is bit-identical to the single-device kernel.
    """
    from paintfe_tpu.ops.filters import gaussian_kernel

    mesh = mesh if mesh is not None else rows_mesh()
    n = mesh.devices.size
    sigma = params.get("sigma", 2.0)
    r = int(gaussian_kernel(float(sigma)).shape[0] - 1) // 2

    img = jnp.asarray(img, jnp.uint8)
    overlay = jnp.asarray(overlay, jnp.uint8)
    h = img.shape[0]
    if (h + ((-h) % n)) // n < r:
        # shard blocks shorter than the blur radius can't fill their halo
        # from one neighbor ppermute; run the single-device kernel
        from paintfe_tpu.ops.fused_chain import fused_chain_kernel

        return fused_chain_kernel(img, overlay, **params)
    pad = (-h) % n
    if pad:
        img = jnp.concatenate([img, jnp.repeat(img[-1:], pad, axis=0)], axis=0)
        overlay = jnp.concatenate(
            [overlay, jnp.repeat(overlay[-1:], pad, axis=0)], axis=0
        )
    sharding = rows_sharding(mesh)
    fn = _fused_chain_spatial_fn(mesh, r, tuple(sorted(params.items())))
    placed = jax.device_put(img, sharding)
    ov_placed = jax.device_put(overlay, sharding)
    out = fn(placed, ov_placed)
    return out[:h]
