"""Pallas kernel parity (interpret mode on the CPU test backend)."""

import numpy as np

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
