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


def _bfs_reach(passable: np.ndarray, sy: int, sx: int, conn8=False) -> np.ndarray:
    """Host-side BFS oracle for the exact connected component."""
    from collections import deque

    h, w = passable.shape
    reach = np.zeros((h, w), bool)
    if not passable[sy, sx]:
        return reach
    reach[sy, sx] = True
    dq = deque([(sy, sx)])
    steps = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if conn8:
        steps += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    while dq:
        y, x = dq.popleft()
        for dy, dx in steps:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and passable[ny, nx] and not reach[ny, nx]:
                reach[ny, nx] = True
                dq.append((ny, nx))
    return reach


def _serpentine(h, w, pitch=4):
    """Boustrophedon corridor: horizontal walls every `pitch` rows with the
    gap alternating between the right and left end — worst case for
    1-step relaxation (path length ~ h*w/pitch)."""
    passable = np.ones((h, w), bool)
    for k, y in enumerate(range(pitch, h - 1, pitch)):
        passable[y, :] = False
        if k % 2 == 0:
            passable[y, w - 2] = True  # gap on the right
        else:
            passable[y, 1] = True      # gap on the left
    return passable


def test_serpentine_reach_exact_and_fast():
    """The scanline relaxation matches a BFS oracle bit-for-bit on a
    256x256 serpentine maze and converges in ~O(#turns) iterations, not
    O(path length) (the 1-step bound would be ~16k iterations here)."""
    h = w = 256
    passable = _serpentine(h, w)
    reach, iters = fill._reachability_iters(
        np.asarray(passable), 0, 0, connectivity8=False)
    oracle = _bfs_reach(passable, 0, 0)
    assert np.array_equal(np.asarray(reach), oracle)
    turns = h // 4
    assert int(iters) <= turns + 8, int(iters)


def test_reachability_conn8_matches_bfs():
    rng = np.random.default_rng(5)
    for trial in range(3):
        passable = rng.random((48, 64)) < 0.55
        passable[10, 10] = True
        for conn8 in (False, True):
            reach, _ = fill._reachability_iters(
                np.asarray(passable), 10, 10, connectivity8=conn8)
            oracle = _bfs_reach(passable, 10, 10, conn8=conn8)
            assert np.array_equal(np.asarray(reach), oracle), (trial, conn8)


def test_reachability_blocked_seed():
    passable = np.zeros((16, 16), bool)
    reach, _ = fill._reachability_iters(np.asarray(passable), 3, 3)
    assert not np.asarray(reach).any()
