"""Inpainting tests (mirror of tests/inpaint.rs), exercising the native C++
component."""

import numpy as np
import pytest

from paintfe_tpu import native
from paintfe_tpu.ops import inpaint

from common import assert_golden


def pattern_with_hole(transparent=False):
    img = np.zeros((64, 64, 4), np.uint8)
    cx = np.arange(64) // 8
    checker = (cx[None, :] + cx[:, None]) % 2 == 0
    img[checker] = [200, 50, 50, 255]
    img[~checker] = [50, 50, 200, 255]
    mask = np.zeros((64, 64), np.uint8)
    mask[24:40, 24:40] = 255
    if transparent:
        img[24:40, 24:40] = 0
    return img, mask


def test_native_lib_builds():
    lib = native.load()
    assert lib is not None, f"native build failed: {native.build_error()}"


def test_instant_brush_preserves_outside():
    src, mask = pattern_with_hole()
    out = src.copy()
    inpaint.inpaint_instant_brush(src, mask, out, 32.0, 32.0, 12.0, 24.0, 0.8)
    np.testing.assert_array_equal(out[0, 0], src[0, 0])
    np.testing.assert_array_equal(out[63, 63], src[63, 63])
    np.testing.assert_array_equal(out[5, 5], src[5, 5])


def test_instant_brush_golden():
    src, mask = pattern_with_hole()
    out = src.copy()
    inpaint.inpaint_instant_brush(src, mask, out, 32.0, 32.0, 12.0, 24.0, 0.8)
    assert_golden("inpaint", "instant_brush_center", out)


def test_patchmatch_fills_hole():
    src, mask = pattern_with_hole(transparent=True)
    result = inpaint.fill_region_patchmatch(src, mask, 5, 3)
    assert (result[24:40, 24:40, 3] > 128).all()


def test_patchmatch_preserves_outside():
    src, mask = pattern_with_hole(transparent=True)
    result = inpaint.fill_region_patchmatch(src, mask, 5, 3)
    np.testing.assert_array_equal(result[:24], src[:24])


def test_patchmatch_golden():
    src, mask = pattern_with_hole(transparent=True)
    result = inpaint.fill_region_patchmatch(src, mask, 5, 3)
    assert_golden("inpaint", "patchmatch_checkerboard", result)


def test_quality_tiers():
    q = inpaint.ContentAwareQuality
    assert q.INSTANT.patchmatch_iters == 0
    assert q.BALANCED.patchmatch_iters == 3 and q.BALANCED.patch_size == 5
    assert q.HIGH_QUALITY.patchmatch_iters == 6 and q.HIGH_QUALITY.patch_size == 7
