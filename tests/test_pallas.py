"""Pallas kernel parity (interpret mode on the CPU test backend)."""

import jax
import numpy as np
import pytest

from paintfe_tpu.core import fixtures
from paintfe_tpu.ops import filters
from paintfe_tpu.ops.pallas_kernels import gaussian_blur_pallas


def test_pallas_blur_matches_unrolled():
    img = fixtures.test_gradient(64, 48)
    for sigma in (1.0, 2.0, 5.0):
        a = np.asarray(filters.gaussian_blur(img, sigma))
        b = np.asarray(gaussian_blur_pallas(img, sigma))
        np.testing.assert_array_equal(a, b, err_msg=f"sigma={sigma}")


def test_pallas_blur_nonsquare_and_odd():
    img = fixtures.test_gradient(37, 61)
    a = np.asarray(filters.gaussian_blur(img, 3.0))
    b = np.asarray(gaussian_blur_pallas(img, 3.0))
    np.testing.assert_array_equal(a, b)


# -- uber-composite kernel (gpu/shaders.rs:139-433 analogue) -------------------


def test_composite_stack_pallas_all_modes_bit_exact():
    from paintfe_tpu.core.composite import composite_stack_static
    from paintfe_tpu.ops.pallas_kernels import composite_stack_pallas

    rng = np.random.default_rng(0)
    n, h, w = 26, 96, 200
    layers = rng.integers(0, 256, (n, h, w, 4), np.uint8)
    modes = tuple(range(25)) + (0,)  # every blend mode once
    opac = rng.random(n).astype(np.float32)
    ref = np.asarray(composite_stack_static(layers, modes, opac))
    # interpret mode emulates the kernel through the ACTIVE backend: its
    # barriered-divide path is exact on XLA:CPU but not on XLA:TPU, where
    # the real Mosaic kernel (Newton-refined divides) is the correct
    # configuration — so compile for real when the suite runs on-chip.
    import jax as _jax
    interp = _jax.default_backend() != "tpu"
    out = np.asarray(composite_stack_pallas(layers, modes, opac, interpret=interp))
    np.testing.assert_array_equal(ref, out)


# -- fused two-pass blur -------------------------------------------------------


@pytest.mark.parametrize("shape,sigma", [
    ((100, 173), 2.0), ((64, 64), 5.0), ((257, 511), 3.3), ((33, 40), 1.1),
])
def test_gaussian_blur_fused_bit_exact(shape, sigma):
    from paintfe_tpu.ops import filters
    from paintfe_tpu.ops.pallas_kernels import gaussian_blur_fused

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, shape + (4,), np.uint8)
    ref = np.asarray(jax.jit(lambda x: filters.gaussian_blur(x, sigma))(img))
    out = np.asarray(gaussian_blur_fused(img, sigma, interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_fused_chain_matches_public_ops():
    from paintfe_tpu.core.blend import BlendMode, blend_u8
    from paintfe_tpu.ops import filters
    from paintfe_tpu.ops.fused_chain import fused_chain
    from paintfe_tpu.parallel.pipeline import (
        _bc_device, _levels_device, _sepia_device,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (130, 201, 4), np.uint8)
    ov = rng.integers(0, 256, (130, 201, 4), np.uint8)

    def public_chain(a, b):
        x = filters.gaussian_blur(a, 2.0)
        x = _bc_device(x, 10.0, 20.0)
        x = _levels_device(x, 10.0, 245.0, 1.1)
        x = _sepia_device(x, 0.5)
        return blend_u8(x, b, int(BlendMode.SOFT_LIGHT), 0.6)

    ref = np.asarray(jax.jit(public_chain)(img, ov))
    out = np.asarray(jax.jit(lambda a, b: fused_chain(a, b))(img, ov))
    np.testing.assert_array_equal(ref, out)


def test_fused_chain_kernel_matches_fused_chain():
    from paintfe_tpu.ops.fused_chain import fused_chain, fused_chain_kernel

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (130, 201, 4), np.uint8)
    ov = rng.integers(0, 256, (130, 201, 4), np.uint8)
    ref = np.asarray(jax.jit(lambda a, b: fused_chain(a, b))(img, ov))
    out = np.asarray(fused_chain_kernel(img, ov, interpret=True))
    np.testing.assert_array_equal(ref, out)
    # transparent overlay pixels pass the base through (blend fast path)
    ov2 = ov.copy()
    ov2[:10, :, 3] = 0
    ref2 = np.asarray(jax.jit(lambda a, b: fused_chain(a, b))(img, ov2))
    out2 = np.asarray(fused_chain_kernel(img, ov2, interpret=True))
    np.testing.assert_array_equal(ref2, out2)


def test_pick_tiles_exact_divisors():
    """Tile auto-pick: exact divisors at the bench geometry (removes the
    overlay-pad and out-slice copies), graceful fallback when none land
    in range, and tile choice never changes results."""
    from paintfe_tpu.ops.fused_chain import (_pick_tiles, fused_chain,
                                             fused_chain_kernel)

    assert _pick_tiles(2160, 3840, 6) == (240, 768, None)  # 4K: both exact
    th, tw, lim = _pick_tiles(2161, 3841, 6)           # primes: fallback
    assert (th, tw, lim) == (128, 512, None)
    th, tw, lim = _pick_tiles(1080, 1920, 6)
    assert 1080 % th == 0 and 1920 % tw == 0

    import jax

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (72, 384, 4), np.uint8)   # 72 % 72-divisors
    ov = rng.integers(0, 256, (72, 384, 4), np.uint8)
    ref = np.asarray(jax.jit(lambda a, b: fused_chain(a, b))(img, ov))
    # interpret=None auto-selects per backend (the interpret kernel's
    # exact-div variant assumes CPU's correctly-rounded divide)
    auto = np.asarray(fused_chain_kernel(img, ov))
    explicit = np.asarray(fused_chain_kernel(img, ov, th=32, tw=256))
    np.testing.assert_array_equal(ref, auto)
    np.testing.assert_array_equal(ref, explicit)


def test_pick_tiles_radius_bands():
    """The VMEM policy is table-driven on on-chip measurements (fused_chain
    module docstring): exact-divisor tiles only to r=20, 128x512 to r=75
    (raised scoped limit past r=60), 64x256 with the raised limit to
    r=126, and beyond MAX_KERNEL_RADIUS the mega kernel must delegate to
    the planar two-kernel path (reference radius-cap discipline,
    src/gpu/shaders.rs:933-936)."""
    from paintfe_tpu.ops.fused_chain import (_RAISED_VMEM_LIMIT,
                                             MAX_KERNEL_RADIUS, _pick_tiles,
                                             fused_chain, fused_chain_kernel)

    assert _pick_tiles(2160, 3840, 20) == (240, 768, None)
    assert _pick_tiles(2160, 3840, 21) == (128, 512, None)
    assert _pick_tiles(2160, 3840, 60) == (128, 512, None)
    assert _pick_tiles(2160, 3840, 61) == (128, 512, _RAISED_VMEM_LIMIT)
    assert _pick_tiles(2160, 3840, 75) == (128, 512, _RAISED_VMEM_LIMIT)
    assert _pick_tiles(2160, 3840, 76) == (64, 256, _RAISED_VMEM_LIMIT)
    assert _pick_tiles(2160, 3840, 126) == (64, 256, _RAISED_VMEM_LIMIT)
    assert MAX_KERNEL_RADIUS == 126

    # beyond the cap: bit-identical via the planar fallback (sigma=50 ->
    # r=150); interpret mode exercises the delegation logic itself
    import jax

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (48, 160, 4), np.uint8)
    ov = rng.integers(0, 256, (48, 160, 4), np.uint8)
    ref = np.asarray(jax.jit(
        lambda a, b: fused_chain(a, b, sigma=50.0))(img, ov))
    out = np.asarray(fused_chain_kernel(img, ov, sigma=50.0))
    np.testing.assert_array_equal(ref, out)


def test_fused_blur_large_radius_fallback_no_redispatch(monkeypatch):
    """taps > 41 must go straight to the XLA program: routing through
    filters.gaussian_blur would re-dispatch to this kernel on a TPU backend
    (infinite mutual recursion, round-4 review)."""
    from paintfe_tpu.ops import filters
    from paintfe_tpu.ops.pallas_kernels import gaussian_blur_fused

    def boom(*a, **k):  # the dispatcher must NOT be on this path
        raise AssertionError("fallback routed through gaussian_blur")

    monkeypatch.setattr(filters, "gaussian_blur", boom)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 52, 4), np.uint8)
    out = np.asarray(gaussian_blur_fused(img, 8.0, interpret=True))
    ref = np.asarray(filters._gaussian_fn(8.0, 40, 52)(img))
    np.testing.assert_array_equal(out, ref)


def test_conv_pass_pads_to_power_of_two_lanes():
    """The dynamic-lane-roll kernel is only correct on power-of-two vreg
    widths (measured on v5e, see CLAUDE.md); the pass must never build a
    384/640/3968-lane tile."""
    import paintfe_tpu.ops.pallas_kernels as pk

    seen = []
    orig = pk._pass_fn

    def spy(ntaps, c, hp, w, wp, tile_h, interpret):
        seen.append(wp)
        return orig(ntaps, c, hp, w, wp, tile_h, interpret)

    pk._pass_fn = spy
    try:
        rng = np.random.default_rng(4)
        # w=300 (+2r) used to round to 384 lanes — a measured-corrupt width
        img = rng.integers(0, 256, (16, 300, 4), np.uint8)
        out = np.asarray(gaussian_blur_pallas(img, 2.5))
        from paintfe_tpu.ops import filters
        ref = np.asarray(filters._gaussian_fn(2.5, 16, 300)(img))
        np.testing.assert_array_equal(out, ref)
    finally:
        pk._pass_fn = orig
    assert seen and all(wp & (wp - 1) == 0 for wp in seen), seen
