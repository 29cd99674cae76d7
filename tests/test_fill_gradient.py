"""Flood fill / magic wand / gradient tests (property-based, mirroring the
strategy of gpu_pipelines.rs: assert behavior rather than goldens)."""

import numpy as np

from paintfe_tpu.core import fixtures
from paintfe_tpu.ops import fill, gradient


def two_region_image():
    img = np.zeros((32, 32, 4), np.uint8)
    img[...] = [10, 10, 10, 255]
    img[4:12, 4:12] = [200, 40, 40, 255]
    img[20:28, 20:28] = [200, 40, 40, 255]  # same color, disconnected
    return img


def test_magic_wand_contiguous():
    img = two_region_image()
    mask = fill.magic_wand_mask(img, 5, 5, 20.0, contiguous=True, anti_aliased=False)
    assert (mask[4:12, 4:12] == 255).all()
    assert (mask[20:28, 20:28] == 0).all()  # disconnected region excluded


def test_magic_wand_global():
    img = two_region_image()
    mask = fill.magic_wand_mask(img, 5, 5, 20.0, contiguous=False, anti_aliased=False)
    assert (mask[4:12, 4:12] == 255).all()
    assert (mask[20:28, 20:28] == 255).all()  # global mode includes both


def test_tolerance_widens_selection():
    img = fixtures.test_gradient(32, 32)
    small = fill.magic_wand_mask(img, 16, 16, 5.0, anti_aliased=False)
    large = fill.magic_wand_mask(img, 16, 16, 60.0, anti_aliased=False)
    assert (large > 0).sum() > (small > 0).sum()


def test_anti_aliased_fringe():
    img = two_region_image()
    mask = fill.magic_wand_mask(img, 5, 5, 20.0, contiguous=False, anti_aliased=True)
    assert set(np.unique(mask).tolist()) <= {0, 128, 255}


def test_bucket_fill():
    img = two_region_image()
    out = fill.bucket_fill(img, 5, 5, (0, 255, 0, 255), tolerance=20.0,
                           anti_aliased=False)
    assert (out[4:12, 4:12, 1] == 255).all()
    np.testing.assert_array_equal(out[0, 0], img[0, 0])


def test_distance_map_zero_at_target():
    img = fixtures.color_bands(64, 64)
    d = np.asarray(fill.perceptual_distance_map(img, img[10, 2]))
    assert d[10, 2] == 0
    assert d[10, 60] > 0  # black band far from red


def test_gradient_linear():
    g = gradient.render_gradient(
        64, 1, (0, 0), (64, 0), (0, 0, 0, 255), (255, 255, 255, 255),
        gradient.GradientShape.LINEAR,
    )
    assert g[0, 0, 0] < 8 and g[0, 63, 0] > 247
    assert (np.diff(g[0, :, 0].astype(int)) >= 0).all()  # monotone


def test_gradient_radial_symmetric():
    g = gradient.render_gradient(
        65, 65, (32.5, 32.5), (64.5, 32.5), (255, 0, 0, 255), (0, 0, 255, 255),
        gradient.GradientShape.RADIAL,
    )
    np.testing.assert_array_equal(g[32, 10], g[32, 54])  # mirror about center
    assert g[32, 32, 0] == 255  # center = color_a


def test_gradient_reflected_and_repeat():
    g = gradient.render_gradient(
        64, 1, (32, 0), (48, 0), (0, 0, 0, 255), (255, 255, 255, 255),
        gradient.GradientShape.LINEAR_REFLECTED,
    )
    assert g[0, 16, 0] == g[0, 47, 0]  # reflection symmetry (pixel centers)
    rep = gradient.render_gradient(
        64, 1, (0, 0), (16, 0), (0, 0, 0, 255), (255, 255, 255, 255),
        gradient.GradientShape.LINEAR, repeat=True,
    )
    assert abs(int(rep[0, 8, 0]) - int(rep[0, 24, 0])) <= 16  # period 16


def test_gradient_eraser():
    base = fixtures.solid(16, 16, (100, 100, 100, 255))
    g = gradient.render_gradient(
        16, 16, (0, 0), (16, 0), (0, 0, 0, 255), (255, 255, 255, 255),
        gradient.GradientShape.LINEAR, base=base, eraser=True,
    )
    assert g[8, 0, 3] < 20 and g[8, 15, 3] > 235
    np.testing.assert_array_equal(g[..., 0], base[..., 0])
