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
    """One edge-clamped separable pass along the last axis of [C, H, W] f32.

    The tile width is padded to a POWER OF TWO, not just a multiple of 128:
    the kernel's fori_loop uses a dynamic lane roll, and Mosaic's dynamic
    roll is wrong on non-power-of-two vreg widths (measured on v5e:
    384/640 lanes corrupt for every nonzero shift, 256/512/1024 correct —
    see ops/warp_kernel.py _window_width and CLAUDE.md)."""
    c, h, w = planar.shape
    hp = _round_up(h, tile_h)
    wp = 128
    while wp < w + 2 * r:
        wp *= 2
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


# ---------------------------------------------------------------------------
# Uber-composite: the whole layer fold in one kernel, accumulator in VMEM
# ---------------------------------------------------------------------------
#
# The reference's flagship shader is UBER_COMPOSITE (gpu/shaders.rs:139-433):
# all 25 blend modes in one fragment program, ping-pong accumulation.  The
# TPU analogue keeps the accumulator tile resident in VMEM while folding the
# full layer stack, so HBM traffic is one read per layer tile + one write —
# the scan compositor instead round-trips the accumulator through HBM at
# every layer boundary.  Modes are host-known (like composite_stack_static),
# so each blend inlines its single branch.
#
# Layout is channel-planar [N, 4, H, W]: lanes = W, and the cross-channel
# Porter-Duff plumbing indexes channel planes on the leading axis.

from paintfe_tpu.core.blend import _RGB_MIXERS, BlendMode
from paintfe_tpu.utils.quant import exact_div


# True-IEEE division in both execution modes: under interpret the kernel
# body runs through XLA:CPU, which rewrites x/const into x*(1/const) (1 ulp
# off) unless barriered; Mosaic lowers the divide directly (no rewrite) but
# the TPU VPU divide is not correctly rounded, so the compiled path applies
# the same one-step Newton refinement as utils.quant.exact_div does on TPU.
# The mode is threaded as an explicit `barrier` argument (True = interpret)
# — a module global read at trace time would latch whichever specialization
# was built last and silently break bit-exactness on a retrace.


def _ediv(x, c, barrier: bool):
    if barrier:
        return exact_div(x, c)
    c = jnp.float32(c)
    q = x / c
    return q + (x - q * c) / c


def _rdiv(x, c, barrier: bool):
    """Runtime-divisor divide with the TPU Newton step (plain on CPU
    interpret, where hardware division is already correctly rounded)."""
    if barrier:
        return x / c
    q = x / c
    return q + (x - q * c) / c


def _u8_to_f32(x):
    # Mosaic has no direct u8 -> f32 cast; hop through i32
    return x.astype(jnp.int32).astype(jnp.float32)


def _trunc_u8(x):
    # trunc_u8 parity (clip + truncating cast) via the i32 hop
    return jnp.clip(x, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _blend_planar(base, top, mode: int, opacity, barrier: bool):
    """blend_u8 (core/blend.py) restated for [4, th, w] channel-planar u8
    tiles; same math, same fast paths, same truncating quantization.  All
    arithmetic runs on 2D per-channel planes (Mosaic relayouts singleton
    leading dims of 3D mask vectors poorly)."""
    opacity = jnp.clip(jnp.float32(opacity), 0.0, 1.0)
    bf = [_ediv(_u8_to_f32(base[c]), 255.0, barrier) for c in range(4)]
    tf = [_ediv(_u8_to_f32(top[c]), 255.0, barrier) for c in range(4)]
    base_a = bf[3]
    top_a = tf[3] * opacity
    mode = BlendMode(int(mode))

    def q(x):  # clip + truncating u8 cast per plane
        return jnp.clip(x * 255.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)

    if mode == BlendMode.OVERWRITE:
        planes = [q(tf[0]), q(tf[1]), q(tf[2]), q(top_a)]
    elif mode == BlendMode.XOR:
        xor_a = base_a * (1.0 - top_a) + top_a * (1.0 - base_a)
        empty = xor_a == 0.0
        safe = jnp.where(empty, 1.0, xor_a)
        planes = []
        for c in range(3):
            rgb = _rdiv(
                bf[c] * base_a * (1.0 - top_a) + tf[c] * top_a * (1.0 - base_a),
                safe, barrier
            )
            planes.append(q(jnp.where(empty, 0.0, rgb)))
        planes.append(q(jnp.where(empty, 0.0, xor_a)))
    else:
        mixer = _RGB_MIXERS[mode]
        inv = 1.0 - top_a
        out_a = top_a + base_a * inv
        empty = out_a == 0.0
        safe = jnp.where(empty, 1.0, out_a)
        planes = []
        for c in range(3):
            rgb = _rdiv(mixer(bf[c], tf[c]) * top_a + bf[c] * base_a * inv,
                        safe, barrier)
            planes.append(q(jnp.where(empty, 0.0, rgb)))
        planes.append(q(jnp.where(empty, 0.0, out_a)))

    # Mosaic mis-relayouts i1 masks born from u8-vector compares when they
    # feed selects on other dtypes; compare on an i32 copy of the alpha plane
    top_a_i32 = top[3].astype(jnp.int32)
    if mode == BlendMode.NORMAL:
        sel = jnp.where(top_a_i32 == 255, 1.0, 0.0) * jnp.where(opacity >= 1.0, 1.0, 0.0)
        planes = [jnp.where(sel > 0.5, top[c], planes[c]) for c in range(4)]
    clear = top_a_i32 == 0
    planes = [jnp.where(clear, base[c], planes[c]) for c in range(4)]
    return jnp.stack(planes, axis=0)


def _make_composite_kernel(modes: tuple, barrier: bool):
    n = len(modes)

    def kernel(opac_ref, layers_ref, out_ref):
        """opac: [N] f32 SMEM; layers: [N, 4, th, w] u8 VMEM; out: [4, th, w]."""
        acc = jnp.zeros(out_ref.shape, jnp.uint8)
        for i, mode in enumerate(modes):
            acc = _blend_planar(acc, layers_ref[i], int(mode), opac_ref[i],
                                barrier)
        out_ref[...] = acc

    return kernel


@functools.lru_cache(maxsize=32)
def _composite_fn(modes: tuple, n: int, hp: int, wp: int, tile_h: int,
                  interpret: bool):
    grid = (hp // tile_h, wp // 128)

    def run(layers, opacities):
        return pl.pallas_call(
            _make_composite_kernel(modes, barrier=interpret),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n, 4, tile_h, 128), lambda i, j: (0, 0, i, j)),
            ],
            out_specs=pl.BlockSpec((4, tile_h, 128), lambda i, j: (0, i, j)),
            out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.uint8),
            interpret=interpret,
        )(opacities, layers)

    return jax.jit(run)


def composite_stack_pallas(layers, modes, opacities, tile_h: int = 128,
                           interpret: bool = None):
    """Composite a [N, H, W, 4] u8 layer stack bottom-up in one Pallas kernel.

    `modes` is a host-known tuple (one specialization per mode sequence,
    like composite_stack_static).  Bit-identical to the XLA compositor.
    interpret=None auto-detects the backend like the other kernel entry
    points (a real Mosaic compile on a CPU host would just fail)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    layers = jnp.asarray(layers, jnp.uint8)
    n, h, w = layers.shape[0], layers.shape[1], layers.shape[2]
    planar = jnp.transpose(layers, (0, 3, 1, 2))  # [N, 4, H, W]
    hp = _round_up(h, tile_h)
    wp = _round_up(w, 128)
    planar = jnp.pad(planar, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    fn = _composite_fn(tuple(int(m) for m in modes), n, hp, wp, tile_h,
                       interpret)
    out = fn(planar, jnp.asarray(opacities, jnp.float32))
    return jnp.transpose(out[:, :h, :w], (1, 2, 0))


# ---------------------------------------------------------------------------
# Fused two-pass Gaussian: one HBM read, one HBM write
# ---------------------------------------------------------------------------
#
# The XLA separable blur materializes the f32 intermediate between the H and
# V passes (2x 133 MB per 4K frame, ~600 MB of HBM traffic).  This kernel
# does both passes per tile in VMEM on a channel-planar [4, H, W] view:
# the grid is (channel, row-tile, col-tile); each step DMAs a halo block
# from HBM, runs the horizontal taps as static lane rotates of the small
# f32 tile, the vertical taps as static sublane slices, quantizes, and
# writes the u8 tile.  Small tiles keep the unrolled tap copies inside
# VMEM (full-width tiles OOM Mosaic's scoped vmem).
#
# Tap order matches ops/filters.py (H pass then V pass, ordered f32 sums),
# so the result is bit-identical to the XLA path and the reference.
# Measured on v5e: 1.8 ms per 4K frame vs 5.4 ms for the XLA formulation.


def _make_blur2d_kernel(taps: tuple, th: int, tw: int, halo_c: int):
    nt = len(taps)

    def kernel(src_hbm, out_ref, scratch, sem):
        c = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        cp = pltpu.make_async_copy(
            src_hbm.at[c, pl.ds(i * th, scratch.shape[0]),
                       pl.ds(j * tw, halo_c)],
            scratch, sem,
        )
        cp.start()
        cp.wait()
        tile = scratch[...].astype(jnp.int32).astype(jnp.float32)
        acc = None
        for k in range(nt):  # H pass: static lane rotates
            rolled = pltpu.roll(tile, halo_c - k, axis=1) if k else tile
            term = rolled[:, 0:tw] * taps[k]
            acc = term if acc is None else acc + term
        out = None
        for k in range(nt):  # V pass: static sublane slices
            term = acc[k:k + th, :] * taps[k]
            out = term if out is None else out + term
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
        out_ref[0] = out.astype(jnp.int32).astype(jnp.uint8)

    return kernel


@functools.lru_cache(maxsize=32)
def _blur2d_fn(taps: tuple, r: int, h: int, w: int, th: int, tw: int,
               interpret: bool):
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    halo_r = _round_up(th + 2 * r, 8)
    halo_c = _round_up(tw + 2 * r, 128)
    grid = (4, hp // th, wp // tw)
    extra = {}
    if len(taps) > 25 and not interpret:
        # Mosaic's scoped-VMEM need grows with the unrolled tap sweep's
        # liveness window, not the declared buffers: taps=41 (this
        # kernel's ceiling) at w=768 measured 18.20M on v5e against the
        # 16M default cap (round 5; same failure class as fused_chain's
        # sigma=25 OOM).  Raise the cap for the large-tap band — v5e has
        # 128M physical VMEM.
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)

    def run(planar):  # u8 [4, hp + (halo_r - th), wp + (halo_c - tw)]
        return pl.pallas_call(
            _make_blur2d_kernel(taps, th, tw, halo_c),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, th, tw), lambda c, i, j: (c, i, j)),
            out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.uint8),
            scratch_shapes=[
                pltpu.VMEM((halo_r, halo_c), jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            **extra,
        )(planar)

    return jax.jit(run)


def gaussian_blur_fused_planar(planar, h: int, w: int, sigma: float,
                               th: int = 128, tw: int = 1024,
                               interpret: bool = False):
    """Blur a channel-planar u8 [4, H, W] image; returns planar [4, H, W].

    Falls back to the XLA separable path for very large radii: the kernel
    unrolls one static roll per tap, so code size and live VMEM copies grow
    with the radius (the XLA path's compile time does too, but it has no
    VMEM ceiling)."""
    from paintfe_tpu.ops.filters import gaussian_kernel

    taps = gaussian_kernel(float(sigma))
    if taps.shape[0] == 1:
        return jnp.asarray(planar, jnp.uint8)
    if taps.shape[0] > 41:  # radius > 20: VMEM-unfriendly unroll
        # Call the XLA separable program directly — going through
        # filters.gaussian_blur would re-dispatch to this kernel on TPU
        # (infinite mutual recursion)
        from paintfe_tpu.ops.filters import _gaussian_fn

        img = jnp.transpose(jnp.asarray(planar, jnp.uint8), (1, 2, 0))
        out = _gaussian_fn(float(sigma), h, w)(img)
        return jnp.transpose(out, (2, 0, 1))
    r = (taps.shape[0] - 1) // 2
    th = min(th, _round_up(h, 8))
    tw = min(tw, _round_up(w, 128))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    halo_r = _round_up(th + 2 * r, 8)
    halo_c = _round_up(tw + 2 * r, 128)
    bottom = (hp - th) + halo_r - (h + r)
    right = (wp - tw) + halo_c - (w + r)
    padded = jnp.pad(jnp.asarray(planar, jnp.uint8),
                     ((0, 0), (r, bottom), (r, right)), mode="edge")
    fn = _blur2d_fn(tuple(float(t) for t in taps), r, h, w, th, tw, interpret)
    return fn(padded)[:, :h, :w]


def gaussian_blur_fused(img, sigma: float, th: int = 128, tw: int = 1024,
                        interpret: bool = False):
    """Bit-exact Gaussian blur with both separable passes fused in one
    kernel pass over HBM.  img: u8 [H, W, 4]."""
    img = jnp.asarray(img, jnp.uint8)
    h, w = img.shape[0], img.shape[1]
    planar = jnp.transpose(img, (2, 0, 1))
    out = gaussian_blur_fused_planar(planar, h, w, sigma, th, tw, interpret)
    return jnp.transpose(out, (1, 2, 0))


# ---------------------------------------------------------------------------
# Tiled median: the reference GPU median (shaders.rs:1199) as a VMEM kernel
# ---------------------------------------------------------------------------
#
# The XLA formulation keeps (2r+1)^2 full-frame taps live through a Batcher
# network — HBM-resident intermediates make radius 4 cost ~10 s per 4K
# frame.  Here each tile's taps live in VMEM and the network is *pruned to
# the single median output*: walking the comparator list backward from the
# median index keeps only compare-exchanges that can influence it (~halves
# the network).  Identical min/max algebra, so results are bit-equal to the
# XLA path and the reference's per-pixel window sort.


def _median_network(k2: int):
    """Batcher network for k2 inputs, pruned to output index k2 // 2."""
    full = _oe_network(k2)
    live = {k2 // 2}
    kept = []
    for (a, b) in reversed(full):
        if a in live or b in live:
            kept.append((a, b))
            live.add(a)
            live.add(b)
    kept.reverse()
    return kept


def _oe_network(n: int):
    from paintfe_tpu.ops.filters import _oddeven_merge_network

    return _oddeven_merge_network(n)


def _make_median_kernel(r: int, th: int, tw: int, halo_c: int):
    k = 2 * r + 1
    comparators = _median_network(k * k)
    m_idx = (k * k) // 2

    def kernel(src_hbm, out_ref, scratch, sem):
        c = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        cp = pltpu.make_async_copy(
            src_hbm.at[c, pl.ds(i * th, scratch.shape[0]),
                       pl.ds(j * tw, halo_c)],
            scratch, sem,
        )
        cp.start()
        cp.wait()
        tile = scratch[...].astype(jnp.int32)
        rolls = [pltpu.roll(tile, halo_c - dx, axis=1) if dx else tile
                 for dx in range(k)]
        taps = []
        for dy in range(k):
            for dx in range(k):
                taps.append(rolls[dx][dy:dy + th, 0:tw])
        for a, b in comparators:
            lo = jnp.minimum(taps[a], taps[b])
            hi = jnp.maximum(taps[a], taps[b])
            taps[a], taps[b] = lo, hi
        out_ref[0] = taps[m_idx].astype(jnp.uint8)

    return kernel


@functools.lru_cache(maxsize=32)
def _median_pallas_fn(r: int, h: int, w: int, th: int, tw: int,
                      interpret: bool):
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    halo_r = _round_up(th + 2 * r, 8)
    halo_c = _round_up(tw + 2 * r, 128)
    grid = (4, hp // th, wp // tw)

    def run(planar):  # u8 [4, hp + (halo_r - th), wp + (halo_c - tw)]
        return pl.pallas_call(
            _make_median_kernel(r, th, tw, halo_c),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, th, tw), lambda c, i, j: (c, i, j)),
            out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.uint8),
            scratch_shapes=[
                pltpu.VMEM((halo_r, halo_c), jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(planar)

    return jax.jit(run)


def median_pallas(img, r: int, th: int = 32, tw: int = 256,
                  interpret: bool = None):
    """Bit-exact per-channel window median with the taps VMEM-resident.
    img: u8 [H, W, 4]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img = jnp.asarray(img, jnp.uint8)
    h, w = img.shape[0], img.shape[1]
    planar = jnp.transpose(img, (2, 0, 1))
    th = min(th, _round_up(h, 8))
    tw = min(tw, _round_up(w, 128))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    halo_r = _round_up(th + 2 * r, 8)
    halo_c = _round_up(tw + 2 * r, 128)
    bottom = (hp - th) + halo_r - (h + r)
    right = (wp - tw) + halo_c - (w + r)
    padded = jnp.pad(planar, ((0, 0), (r, bottom), (r, right)), mode="edge")
    out = _median_pallas_fn(r, h, w, th, tw, interpret)(padded)
    return jnp.transpose(out[:, :h, :w], (1, 2, 0))
