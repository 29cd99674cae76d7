"""On-chip Mosaic smoke: compile + run every Pallas kernel for real.

The main suite runs the Pallas kernels in interpret mode on the CPU
backend (conftest.py), which validates semantics but not Mosaic
compilation.  These tests force `interpret=False` so each kernel goes
through the real Mosaic pipeline; they only run when the session backend
is a TPU:

    PAINTFE_TEST_BACKEND=tpu python -m pytest tests/test_tpu_smoke.py -q

Shapes are kept small so each kernel compiles in seconds.  Every test
asserts bit-identity against the XLA (non-Pallas) formulation, so this is
a correctness check, not just a does-it-compile check.
"""

import numpy as np
import pytest

import jax

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic smoke needs the TPU backend (PAINTFE_TEST_BACKEND=tpu)",
)

pytestmark = [pytest.mark.tpu_smoke, tpu_only]


def _img(h=96, w=200, seed=0):
    rng = np.random.default_rng(seed)
    return np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))


def test_mosaic_conv_pass_blur():
    from paintfe_tpu.ops.filters import gaussian_blur
    from paintfe_tpu.ops.pallas_kernels import gaussian_blur_pallas

    img = _img()
    got = np.asarray(gaussian_blur_pallas(img, 2.5, interpret=False))
    want = np.asarray(gaussian_blur(img, 2.5))
    assert np.array_equal(got, want)


def test_mosaic_fused_blur2d():
    from paintfe_tpu.ops.filters import gaussian_blur
    from paintfe_tpu.ops.pallas_kernels import gaussian_blur_fused

    img = _img(seed=1)
    got = np.asarray(gaussian_blur_fused(img, 2.0, interpret=False))
    want = np.asarray(gaussian_blur(img, 2.0))
    assert np.array_equal(got, want)


def test_mosaic_composite_stack():
    from paintfe_tpu.core.blend import BlendMode
    from paintfe_tpu.core.composite import composite_stack_static
    from paintfe_tpu.ops.pallas_kernels import composite_stack_pallas

    rng = np.random.default_rng(2)
    layers = np.asarray(rng.integers(0, 256, (3, 64, 160, 4), np.uint8))
    modes = (int(BlendMode.NORMAL), int(BlendMode.MULTIPLY),
             int(BlendMode.SOFT_LIGHT))
    opac = (1.0, 0.8, 0.6)
    got = np.asarray(composite_stack_pallas(layers, modes, opac,
                                            interpret=False))
    want = np.asarray(composite_stack_static(layers, modes, opac))
    assert np.array_equal(got, want)


def test_mosaic_chain_mega_kernel():
    from paintfe_tpu.ops.fused_chain import fused_chain, fused_chain_kernel

    img, ov = _img(seed=3), _img(seed=4)
    got = np.asarray(fused_chain_kernel(img, ov, interpret=False))
    want = np.asarray(fused_chain(img, ov, interpret=False))
    assert np.array_equal(got, want)


def test_mosaic_median_tiled():
    """The tiled median kernel (pruned network, VMEM taps) on-chip."""
    from paintfe_tpu.ops import filters
    from paintfe_tpu.ops.pallas_kernels import median_pallas

    img = _img(96, 256, seed=9)
    want = np.asarray(filters._median_fn(2, 96, 256)(img))
    got = np.asarray(median_pallas(img, 2, interpret=False))
    assert np.array_equal(got, want)


def test_mosaic_warp_sweep_gather():
    """The displacement-aware sweep-gather kernel, both modes, on-chip."""
    from paintfe_tpu.ops import transform as tfm
    from paintfe_tpu.ops.effects.distort import sample_bilinear
    from paintfe_tpu.ops.warp_kernel import gather_bilinear_u8
    from paintfe_tpu.utils.quant import round_u8
    import jax.numpy as jnp

    h, w = 96, 280
    src = _img(h, w, seed=7)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = (xx - 5 * np.sin(yy / 11.0)).astype(np.float32)
    sy = (yy - 5 * np.cos(xx / 13.0)).astype(np.float32)

    got = gather_bilinear_u8(src, sx, sy, mode="zero", interpret=False)
    assert got is not None
    disp = np.stack([xx - sx, yy - sy], axis=-1).astype(np.float32)
    want = np.asarray(tfm._warp_fn(h, w, h, w)(src, disp))
    assert np.array_equal(np.asarray(got), want)

    gotc = gather_bilinear_u8(src, sx, sy, mode="clamp", interpret=False)
    wantc = np.asarray(jax.jit(
        lambda i, a, b: round_u8(sample_bilinear(i, a, b)))(
        src, jnp.asarray(sx), jnp.asarray(sy)))
    assert np.array_equal(np.asarray(gotc), wantc)


def test_mosaic_chain_kernel_respecialized():
    """A second Mosaic specialization of the mega kernel (different sigma =
    different tap count/halo, different params) stays bit-identical to the
    XLA formulation."""
    from paintfe_tpu.ops.fused_chain import fused_chain, fused_chain_kernel

    img, ov = _img(seed=5), _img(seed=6)
    kw = dict(sigma=3.5, brightness=-5.0, contrast=35.0, black=4.0,
              white=250.0, gamma=0.8, sepia_strength=0.2, blend_opacity=0.9)
    got = np.asarray(fused_chain_kernel(img, ov, interpret=False, **kw))
    want = np.asarray(fused_chain(img, ov, interpret=False, **kw))
    assert np.array_equal(got, want)


def test_mosaic_conv_pass_blur_nonpow2_width():
    """w=320 (+2r) used to build a 384-lane tile — one of the widths where
    Mosaic's dynamic lane roll is measurably WRONG on v5e; the pass now
    pads to the next power of two.  Bit-checked vs the XLA program."""
    from paintfe_tpu.ops.filters import _gaussian_fn
    from paintfe_tpu.ops.pallas_kernels import gaussian_blur_pallas

    for w in (320, 520):  # pre-fix wp = 384 / 640, both measured-corrupt
        img = _img(h=64, w=w, seed=3)
        got = np.asarray(gaussian_blur_pallas(img, 2.5, interpret=False))
        want = np.asarray(_gaussian_fn(2.5, 64, w)(img))
        assert np.array_equal(got, want), f"w={w} corrupt"


def test_mosaic_chain_kernel_auto_tile_geometries():
    """Exercise the exact-divisor auto-picked tile shapes (th=240/216,
    tw=768/640/384 with their big static-roll halos) on real Mosaic —
    interpret-mode tests can't catch a width-dependent miscompile in this
    measured-bug class.  Bit-checked vs the planar two-kernel oracle."""
    from paintfe_tpu.ops.fused_chain import (_pick_tiles, fused_chain,
                                             fused_chain_kernel)

    for h, w in ((240, 768), (216, 640), (240, 384)):
        th, tw, _lim = _pick_tiles(h, w, r=6)
        assert (th, tw) == (h, w), f"auto-pick drifted for {h}x{w}"
        rng = np.random.default_rng(h + w)
        img = np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
        ov = np.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
        got = np.asarray(fused_chain_kernel(img, ov, interpret=False))
        want = np.asarray(fused_chain(img, ov, interpret=False))
        assert np.array_equal(got, want), f"{h}x{w} tile geometry corrupt"


def test_mosaic_chain_kernel_large_sigma_fits_vmem():
    """Radius-aware pick at sigma=25 (r=75): 128x512 tiles with the raised
    scoped-VMEM limit (the kernel needs 51.68M on chip — the round-4
    halo-area budget OOMed exactly here) must compile + match the oracle."""
    from paintfe_tpu.ops.fused_chain import fused_chain, fused_chain_kernel

    rng = np.random.default_rng(9)
    img = np.asarray(rng.integers(0, 256, (480, 1536, 4), np.uint8))
    ov = np.asarray(rng.integers(0, 256, (480, 1536, 4), np.uint8))
    got = np.asarray(fused_chain_kernel(img, ov, sigma=25.0, interpret=False))
    want = np.asarray(fused_chain(img, ov, sigma=25.0, interpret=False))
    assert np.array_equal(got, want)


def test_mosaic_chain_kernel_exact_divisor_band_endpoint():
    """r=20 (sigma=6.66) is the largest radius still allowed the big
    exact-divisor tiles; certify that band endpoint (240x768 tile, nt=41
    halo sweep) on real Mosaic under the DEFAULT scoped limit."""
    from paintfe_tpu.ops.fused_chain import (_pick_tiles, fused_chain,
                                             fused_chain_kernel)

    sigma = 20.0 / 3.0  # ceil(3*sigma) == 20
    rng = np.random.default_rng(11)
    img = np.asarray(rng.integers(0, 256, (240, 768, 4), np.uint8))
    ov = np.asarray(rng.integers(0, 256, (240, 768, 4), np.uint8))
    th, tw, lim = _pick_tiles(240, 768, 20)
    assert (th, tw, lim) == (240, 768, None)
    got = np.asarray(fused_chain_kernel(img, ov, sigma=sigma, interpret=False))
    want = np.asarray(fused_chain(img, ov, sigma=sigma, interpret=False))
    assert np.array_equal(got, want)


def test_mosaic_chain_kernel_max_radius_band():
    """The top band: sigma=42 (r=126, 253 taps) on 64x256 tiles with the
    raised limit — measured 100.36M scoped need on v5e, the largest
    radius the mega kernel accepts before delegating to the planar path.
    Wide aspect stresses the lane-dim halo at its maximum."""
    from paintfe_tpu.ops.fused_chain import fused_chain, fused_chain_kernel

    rng = np.random.default_rng(12)
    img = np.asarray(rng.integers(0, 256, (256, 1024, 4), np.uint8))
    ov = np.asarray(rng.integers(0, 256, (256, 1024, 4), np.uint8))
    got = np.asarray(fused_chain_kernel(img, ov, sigma=42.0, interpret=False))
    want = np.asarray(fused_chain(img, ov, sigma=42.0, interpret=False))
    assert np.array_equal(got, want)


def test_mosaic_chain_kernel_beyond_cap_planar_fallback():
    """sigma=50 (r=150) exceeds MAX_KERNEL_RADIUS: fused_chain_kernel must
    delegate to the planar two-kernel path, which runs the XLA separable
    blur on chip — certify it executes and matches the XLA public-op
    formulation end to end."""
    import jax.numpy as jnp
    from paintfe_tpu.core.blend import BlendMode, blend_u8
    from paintfe_tpu.ops.filters import _gaussian_fn
    from paintfe_tpu.ops.fused_chain import (_bc_planar, _levels_planar,
                                             _sepia_planar, fused_chain_kernel)

    rng = np.random.default_rng(13)
    img = np.asarray(rng.integers(0, 256, (96, 256, 4), np.uint8))
    ov = np.asarray(rng.integers(0, 256, (96, 256, 4), np.uint8))
    got = np.asarray(fused_chain_kernel(img, ov, sigma=50.0, interpret=False))

    def oracle(a, b):
        blurred = _gaussian_fn(50.0, 96, 256)(a)
        pl_ = [jnp.transpose(blurred, (2, 0, 1))[c] for c in range(4)]
        pl_ = _bc_planar(pl_, 10.0, 20.0)
        pl_ = _levels_planar(pl_, 10.0, 245.0, 1.1)
        pl_ = _sepia_planar(pl_, 0.5)
        base = jnp.transpose(jnp.stack(pl_, 0), (1, 2, 0))
        return blend_u8(base, b, BlendMode.SOFT_LIGHT, 0.6)

    import jax

    want = np.asarray(jax.jit(oracle)(img, ov))
    assert np.array_equal(got, want)
