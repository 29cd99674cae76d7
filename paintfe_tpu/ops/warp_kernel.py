"""Displacement-aware Pallas gather kernel: the warp family's fast path.

The reference warps (Liquify, mesh warp, bulge/twist, displacement fields)
are per-pixel bilinear gathers — a GPU texture fetch (LIQUIFY_WARP,
src/gpu/shaders.rs:1390-1462).  TPUs have no per-lane gather from HBM, and
the XLA `gather` formulation runs at ~300 ms per 4K frame.  This kernel
rebuilds the fetch from two primitives Mosaic *does* have:

- an 8-sublane per-lane selector (`jnp.take_along_axis(axis=0)` on one
  vreg of rows) — the hardware sublane shuffle;
- static lane rotates (`pltpu.roll`).

Shape of the algorithm, per output tile [TH, TW]:

1.  The XLA prologue computes integer tap coordinates and, per tile, the
    row window start `oy = min(y0c)` and the *relative* column
    parameterization `s = x0c - (tile_x0 + x) - rxmin` — relative to the
    output pixel, so the sweep width tracks the field's within-tile
    geometry (a constant displacement costs S=1 regardless of magnitude).
2.  The kernel DMAs the packed-u32 source window [WH, WW] for its tile
    (start row/col from scalar-prefetched per-tile arrays).
3.  For each 8-row output chunk x window row-group g x column offset s:
    one sublane-gather per tap row answers `W[y0 mod 8, x+s]` for all
    lanes at once; (s, g) compare-masks select which output pixels take
    the value.  All four bilinear taps ride the same sweep (two gathers
    per (g, s): rows y0 and y1).
4.  The bilinear blend replicates ops/transform.py `_warp_fn` expression
    order exactly (clamped taps masked to zero out of bounds, straight
    f32 lerp, round-half-up) — bit-identical results.

Fields whose per-tile spans exceed the largest bucket (pathological
shear/minification) are reported infeasible by `plan()`; the caller
falls back to the XLA gather path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = np.float32

TH = 32                            # output tile rows
TW = 256                           # output tile cols
PAD_L = TW                         # left pad: window starts can be < 0
WH_BUCKETS = (48, 64, 96, 128, 192, 256, 384)  # window rows (x8)
S_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128)   # column sweep widths
_BIG = np.int32(1 << 28)


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _window_params(sxp, syp, src_h, src_w, h, w):
    """Tap coords + per-tile window parameters (device-side, traceable).

    Pixels in the tile-alignment pad region are excluded from the
    reductions so they can't inflate the buckets."""
    hp, wp = sxp.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    colg = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    valid = (row < h) & (colg < w)

    x0 = jnp.floor(sxp).astype(jnp.int32)
    y0 = jnp.floor(syp).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, src_w - 1)
    x1c = jnp.clip(x0 + 1, 0, src_w - 1)
    y0c = jnp.clip(y0, 0, src_h - 1)
    y1c = jnp.clip(y0 + 1, 0, src_h - 1)
    rx0 = x0c - colg
    rx1 = x1c - colg

    def tmin(v, sentinel):
        v = jnp.where(valid, v, sentinel)
        return jnp.min(v.reshape(hp // TH, TH, wp // TW, TW), axis=(1, 3))

    def tmax(v, sentinel):
        v = jnp.where(valid, v, sentinel)
        return jnp.max(v.reshape(hp // TH, TH, wp // TW, TW), axis=(1, 3))

    oy = tmin(y0c, src_h - 1)
    vspan = jnp.maximum(tmax(y1c, 0) - oy + 1, 1)
    rxmin = jnp.minimum(tmin(rx0, _BIG), tmin(rx1, _BIG))
    rxmax = jnp.maximum(tmax(rx0, -_BIG), tmax(rx1, -_BIG))
    sspan = jnp.maximum(rxmax - rxmin + 1, 1)
    ox = jnp.arange(wp // TW, dtype=jnp.int32)[None, :] * TW + rxmin
    ox = jnp.clip(ox, -PAD_L, src_w - 1)  # all-invalid tiles: keep DMA legal
    return (oy.astype(jnp.int32), ox.astype(jnp.int32),
            jnp.max(jnp.where(sspan < _BIG, vspan, 1)),
            jnp.max(jnp.where(sspan < _BIG, sspan, 1)))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _prologue(sx, sy, src_h, src_w, h, w):
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    sxp = jnp.pad(sx, ((0, hp - h), (0, wp - w)))
    syp = jnp.pad(sy, ((0, hp - h), (0, wp - w)))
    return _window_params(sxp, syp, src_h, src_w, h, w)


def plan(sx, sy, src_h: int, src_w: int):
    """Window parameters + bucket choice; None when infeasible."""
    h, w = sx.shape
    oy, ox, vmax, smax = _prologue(
        jnp.asarray(sx, jnp.float32), jnp.asarray(sy, jnp.float32),
        src_h, src_w, h, w)
    # ONE host sync for both maxima: on a tunneled device every device_get
    # is a round trip
    vmax, smax = (int(v) for v in jax.device_get((vmax, smax)))
    # +8: the DMA window start is aligned down to a multiple of 8 rows
    wh = next((b for b in WH_BUCKETS if b >= vmax + 8), None)
    s = next((b for b in S_BUCKETS if b >= smax), None)
    if wh is None or s is None or (wh // 8) * s > 1536:
        return None
    return oy, ox, wh, s


def _make_kernel(wh, s_sweep, th, tw, ww, src_h, src_w, gw, mode):
    n_chunks = th // 8
    n_groups = wh // 8

    def kernel(oy_ref, oxal_ref, oxb_ref, src_hbm, sx_ref, sy_ref, out_ref,
               scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        t = i * gw + j
        oy = oy_ref[t]        # window start row, pre-aligned to 8
        ox_al = oxal_ref[t]   # biased window start col, aligned to 128
        oxb = oxb_ref[t]      # true biased window start col
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(pl.multiple_of(oy, 8), wh),
                       pl.ds(pl.multiple_of(ox_al, 128), ww)], scratch, sem)
        cp.start()
        cp.wait()
        # undo the 128-lane DMA alignment once per window row-group, so all
        # later indexing sees the true (unaligned) window start
        r = oxb - ox_al
        wgs = [pltpu.roll(scratch[g * 8:g * 8 + 8, :].astype(jnp.int32),
                          -r, axis=1) for g in range(n_groups)]

        sx = sx_ref[...]
        sy = sy_ref[...]
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = sx - x0.astype(jnp.float32)
        fy = sy - y0.astype(jnp.float32)
        oob = (x0 < -1) | (y0 < -1) | (x0 >= src_w) | (y0 >= src_h)
        inb_x0 = (x0 >= 0) & (x0 < src_w)
        inb_x1 = (x0 + 1 >= 0) & (x0 + 1 < src_w)
        inb_y0 = (y0 >= 0) & (y0 < src_h)
        inb_y1 = (y0 + 1 >= 0) & (y0 + 1 < src_h)

        col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
        base = oxb - PAD_L                      # absolute window start col
        x0l = jnp.clip(x0, 0, src_w - 1) - base  # window-local tap columns
        x1l = jnp.clip(x0 + 1, 0, src_w - 1) - base
        y0l = jnp.clip(y0, 0, src_h - 1) - oy    # window-local tap rows
        y1l = jnp.clip(y0 + 1, 0, src_h - 1) - oy
        s0 = x0l - col                           # sweep offsets, in [0, S)
        s1 = x1l - col
        y0g = jnp.right_shift(y0l, 3)
        y0m = jnp.bitwise_and(y0l, 7)
        y1g = jnp.right_shift(y1l, 3)
        y1m = jnp.bitwise_and(y1l, 7)

        # combined (group << 8 | sweep) keys: one compare selects a (g, s)
        # cell instead of two compares + an AND
        k_tl = jnp.left_shift(y0g, 8) | s0
        k_tr = jnp.left_shift(y0g, 8) | s1
        k_bl = jnp.left_shift(y1g, 8) | s0
        k_br = jnp.left_shift(y1g, 8) | s1

        for c in range(n_chunks):
            sl = slice(c * 8, c * 8 + 8)
            # output-aligned gather indices: the operand is the *sliced*
            # window columns [s, s+tw), so out[y,x] = Wg[y?m[y,x], x+s]
            # with no index rolling at all
            y0m_c = y0m[sl]
            y1m_c = y1m[sl]
            k_tl_c, k_tr_c = k_tl[sl], k_tr[sl]
            k_bl_c, k_br_c = k_bl[sl], k_br[sl]
            z = jnp.zeros((8, tw), jnp.int32)
            tl = z
            tr = z
            bl = z
            br = z
            for s in range(s_sweep):
                for g in range(n_groups):
                    key = (g << 8) | s
                    v0 = jnp.take_along_axis(wgs[g][:, s:s + tw], y0m_c,
                                             axis=0)
                    v1 = jnp.take_along_axis(wgs[g][:, s:s + tw], y1m_c,
                                             axis=0)
                    tl = jnp.where(k_tl_c == key, v0, tl)
                    tr = jnp.where(k_tr_c == key, v0, tr)
                    bl = jnp.where(k_bl_c == key, v1, bl)
                    br = jnp.where(k_br_c == key, v1, br)

            # bilinear blend per channel; expression order depends on mode
            in_tl = (inb_x0 & inb_y0)[sl]
            in_tr = (inb_x1 & inb_y0)[sl]
            in_bl = (inb_x0 & inb_y1)[sl]
            in_br = (inb_x1 & inb_y1)[sl]
            oob_c = oob[sl]
            fxc = fx[sl]
            fyc = fy[sl]
            q = []
            for ch in range(4):
                def chan(v):
                    return (jnp.right_shift(v, 8 * ch) & 0xFF).astype(jnp.float32)

                if mode == "zero":
                    # ops/transform._warp_fn: OOB taps 0, successive lerps
                    vtl = jnp.where(in_tl, chan(tl), 0.0)
                    vtr = jnp.where(in_tr, chan(tr), 0.0)
                    vbl = jnp.where(in_bl, chan(bl), 0.0)
                    vbr = jnp.where(in_br, chan(br), 0.0)
                    top = vtl + (vtr - vtl) * fxc
                    bot = vbl + (vbr - vbl) * fxc
                    v = jnp.clip(jnp.floor(top + (bot - top) * fyc + 0.5),
                                 0.0, 255.0)
                    v = jnp.where(oob_c, 0.0, v)
                else:
                    # effects/distort.sample_bilinear: edge clamp, product
                    # weights (effects.rs:118-140), round_u8 by the caller
                    p00 = chan(tl)
                    p10 = chan(tr)
                    p01 = chan(bl)
                    p11 = chan(br)
                    v = (p00 * (1.0 - fxc) * (1.0 - fyc)
                         + p10 * fxc * (1.0 - fyc)
                         + p01 * (1.0 - fxc) * fyc
                         + p11 * fxc * fyc)
                    v = jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)
                q.append(v.astype(jnp.int32))
            out_ref[sl, :] = (q[0] | (q[1] << 8) | (q[2] << 16)
                              | (q[3] << 24)).astype(jnp.uint32)

    return kernel


def _window_width(s_sweep: int) -> int:
    """Window lane count: the next power-of-two multiple of 128 that fits
    tw + sweep + alignment slack.  Mosaic's dynamic lane roll (used to undo
    the 128-lane DMA alignment) produces wrong results on non-power-of-two
    vreg counts (measured: 384/640 wrong for every nonzero shift, 256/512/
    1024 correct), so only power-of-two widths are legal here."""
    need = TW + s_sweep + 136
    ww = 256
    while ww < need:
        ww *= 2
    return ww


def _launch(kernel, src_u8, sxp, syp, oy, ox, wh, ww, gh, gw, hp, wp, h, w,
            interpret):
    """Pad/bitcast/align + the pallas_call; traceable (one program)."""
    packed = jax.lax.bitcast_convert_type(src_u8, jnp.uint32)
    packed = jnp.pad(packed, ((0, wh), (PAD_L, ww)))
    oy_al = (oy.reshape(-1) // 8) * 8          # DMA row alignment
    oxb = ox.reshape(-1) + PAD_L               # biased (>= 0) col start
    oxb_al = (oxb // 128) * 128                # DMA col alignment
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(gh, gw),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j)),
                pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j)),
            ],
            out_specs=pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j)),
            scratch_shapes=[
                pltpu.VMEM((wh, ww), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(oy_al, oxb_al, oxb, packed, sxp, syp)
    return jax.lax.bitcast_convert_type(out[:h, :w], jnp.uint8)


@functools.lru_cache(maxsize=64)
def _gather_fn(wh, s_sweep, hp, wp, src_h, src_w, mode, interpret):
    ww = _window_width(s_sweep)
    gh, gw = hp // TH, wp // TW
    kernel = _make_kernel(wh, s_sweep, TH, TW, ww, src_h, src_w, gw, mode)

    def run(src_u8, sx, sy, oy, ox, h, w):
        # whole prologue-to-epilogue in ONE program: on a remote/tunneled
        # device every eager op is a round trip, so pads/bitcasts/alignment
        # math must not run op-by-op
        sxp = jnp.pad(sx, ((0, hp - h), (0, wp - w)))
        syp = jnp.pad(sy, ((0, hp - h), (0, wp - w)))
        return _launch(kernel, src_u8, sxp, syp, oy, ox, wh, ww, gh, gw,
                       hp, wp, h, w, interpret)

    return jax.jit(run, static_argnums=(5, 6))


@functools.lru_cache(maxsize=64)
def _gather_fn_checked(wh, s_sweep, hp, wp, src_h, src_w, mode, interpret):
    """Plan-free fast path: window parameters, the feasibility check for
    the *cached* buckets, AND the kernel fused into one jitted program.

    plan() costs a blocking host round trip BEFORE the kernel can even
    launch (the reference instead keeps a persistent displacement buffer,
    liquify.rs:166-176).  Here an interactive stroke re-using the same
    field geometry pays a single post-kernel scalar sync on `ok`: when the
    field still fits the buckets the already-computed output is valid, and
    only a bucket change (rare mid-stroke) falls back to a full re-plan."""
    ww = _window_width(s_sweep)
    gh, gw = hp // TH, wp // TW
    kernel = _make_kernel(wh, s_sweep, TH, TW, ww, src_h, src_w, gw, mode)

    def run(src_u8, sx, sy, h, w):
        sxp = jnp.pad(sx, ((0, hp - h), (0, wp - w)))
        syp = jnp.pad(sy, ((0, hp - h), (0, wp - w)))
        oy, ox, vmax, smax = _window_params(sxp, syp, src_h, src_w, h, w)
        ok = (vmax + 8 <= wh) & (smax <= s_sweep)
        # running with undersized buckets is memory-safe (the DMA windows
        # stay inside the padded source); `ok` guards value correctness
        out = _launch(kernel, src_u8, sxp, syp, oy, ox, wh, ww, gh, gw,
                      hp, wp, h, w, interpret)
        return out, ok

    return jax.jit(run, static_argnums=(3, 4))


# geometry key -> (wh, s_sweep) buckets from the last successful plan
_BUCKET_CACHE: dict = {}
_BUCKET_CACHE_MAX = 128

# plan_key -> (oy, ox, wh, s_sweep) | "infeasible", for fields that are a
# pure function of their key (parametric effects like dents/twist/bulge)
_PLAN_CACHE: dict = {}
_INFEASIBLE = "infeasible"


def gather_bilinear_u8_planned(src, sx, sy, plan_key, mode: str = "zero",
                               interpret: Optional[bool] = None):
    """gather_bilinear_u8 for callers whose field is a pure function of
    `plan_key` (the dents/twist/bulge parameter set + shape): the window
    plan — one blocking host round trip — runs once per key, and every
    later call reuses the cached device-resident (oy, ox) windows with NO
    host sync at all: steady state is pure kernel time.  Infeasibility is
    cached too, so the XLA-gather fallback also skips the plan RTT on
    repeat calls.  Returns None when the field is infeasible."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    src_h, src_w = src.shape[0], src.shape[1]
    h, w = sx.shape[0], sx.shape[1]
    # plan() depends only on the field and shapes — mode/interpret in the
    # key would duplicate entries for identical plans
    key = (plan_key, h, w, src_h, src_w)
    planned = _PLAN_CACHE.get(key)
    if planned is None:
        planned = plan(jnp.asarray(sx, jnp.float32),
                       jnp.asarray(sy, jnp.float32), src_h, src_w)
        if planned is None:
            planned = _INFEASIBLE
        while len(_PLAN_CACHE) >= _BUCKET_CACHE_MAX:
            # evict the OLDEST entry (insertion order): an interactive
            # slider generating one-shot keys must not flush every other
            # live effect's hot plan with a wholesale clear()
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = planned
    if planned is _INFEASIBLE:
        return None
    oy, ox, wh, s_sweep = planned
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    fn = _gather_fn(wh, s_sweep, hp, wp, src_h, src_w, mode, interpret)
    return fn(jnp.asarray(src, jnp.uint8), jnp.asarray(sx, jnp.float32),
              jnp.asarray(sy, jnp.float32), oy, ox, h, w)


def gather_bilinear_u8(src, sx, sy, mode: str = "zero",
                       interpret: Optional[bool] = None,
                       defer_check: bool = False):
    """Bilinear gather `out[y,x] = bilerp(src, sx[y,x], sy[y,x])`.

    mode="zero": ops/transform._warp_fn semantics — clamped taps zeroed
    out of bounds, successive lerps, fully-out pixels transparent-black.
    mode="clamp": effects/distort.sample_bilinear semantics — edge-clamped
    taps, product-form weights (effects.rs:118-140) with round_u8.

    Repeated calls with the same geometry (an interactive Liquify stroke)
    skip plan()'s pre-kernel host sync: the cached buckets run the fused
    checked program and only re-plan when the field outgrows them.

    Returns None when the field is infeasible for the sweep kernel; the
    caller should then use the XLA gather path.

    defer_check=True returns `(out, ok)` WITHOUT any host sync: `ok` is a
    device bool scalar that is True iff `out` is valid.  Interactive
    callers batch-fetch frame i's ok together with their own per-frame
    consume (one round trip total).  When ok comes back False the cached
    buckets are stale: redo that frame with defer_check=False, which
    re-plans and refreshes (or evicts) the cache entry.  A call that has
    no cached buckets and whose plan is infeasible returns (None, None)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    src_h, src_w = src.shape[0], src.shape[1]
    h, w = sx.shape[0], sx.shape[1]
    hp, wp = _round_up(h, TH), _round_up(w, TW)
    src_u8 = jnp.asarray(src, jnp.uint8)
    sxf = jnp.asarray(sx, jnp.float32)
    syf = jnp.asarray(sy, jnp.float32)

    key = (h, w, src_h, src_w, mode, interpret)
    cached = _BUCKET_CACHE.get(key)
    if cached is not None:
        wh, s_sweep = cached
        fn = _gather_fn_checked(wh, s_sweep, hp, wp, src_h, src_w, mode,
                                interpret)
        out, ok = fn(src_u8, sxf, syf, h, w)
        if defer_check:
            return out, ok
        if bool(ok):  # the ONLY host sync on the steady-state path
            return out

    planned = plan(sxf, syf, src_h, src_w)
    if planned is None:
        _BUCKET_CACHE.pop(key, None)
        return (None, None) if defer_check else None
    oy, ox, wh, s_sweep = planned
    if len(_BUCKET_CACHE) >= _BUCKET_CACHE_MAX:
        _BUCKET_CACHE.clear()
    _BUCKET_CACHE[key] = (wh, s_sweep)
    fn = _gather_fn(wh, s_sweep, hp, wp, src_h, src_w, mode, interpret)
    out = fn(src_u8, sxf, syf, oy, ox, h, w)
    return (out, jnp.asarray(True)) if defer_check else out
