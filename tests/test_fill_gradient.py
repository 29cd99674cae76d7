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
    # triangle wave (state.rs:1192-1201): color_a at BOTH endpoints,
    # color_b peak at the midpoint
    g = gradient.render_gradient(
        64, 1, (32, 0), (48, 0), (0, 0, 0, 255), (255, 255, 255, 255),
        gradient.GradientShape.LINEAR_REFLECTED,
    )
    assert g[0, 32, 0] < 20 and g[0, 47, 0] < 20   # endpoints ~ color_a
    assert g[0, 40, 0] > 235                        # midpoint ~ color_b
    assert g[0, 16, 0] == 0                         # clamped before start
    rep = gradient.render_gradient(
        64, 1, (0, 0), (16, 0), (0, 0, 0, 255), (255, 255, 255, 255),
        gradient.GradientShape.LINEAR, repeat=True,
    )
    assert abs(int(rep[0, 8, 0]) - int(rep[0, 24, 0])) <= 16  # period 16


def test_gradient_eraser():
    # the eraser mask is LUMINANCE of the gradient color (shaders.rs
    # is_eraser): black start -> mask 0 (alpha kept), white end -> mask 1
    # (fully erased) — the commit multiplies alpha by (1 - mask)
    base = fixtures.solid(16, 16, (100, 100, 100, 255))
    g = gradient.render_gradient(
        16, 16, (0, 0), (16, 0), (0, 0, 0, 255), (255, 255, 255, 255),
        gradient.GradientShape.LINEAR, base=base, eraser=True,
    )
    assert g[8, 0, 3] > 235 and g[8, 15, 3] < 20
    np.testing.assert_array_equal(g[..., 0], base[..., 0])
    # swapping the ramp colors inverts the erase direction
    g2 = gradient.render_gradient(
        16, 16, (0, 0), (16, 0), (255, 255, 255, 255), (0, 0, 0, 255),
        gradient.GradientShape.LINEAR, base=base, eraser=True,
    )
    assert g2[8, 0, 3] < 20 and g2[8, 15, 3] > 235


def test_gradient_multi_stop_and_degenerate():
    # 3-stop LUT sampling (rebuild_lut parity) + degenerate start==end -> t=0
    stops = [(0.0, (255, 0, 0, 255)), (0.5, (0, 255, 0, 255)),
             (1.0, (0, 0, 255, 255))]
    g = gradient.render_gradient(64, 1, (0, 0), (64, 0), stops=stops)
    assert g[0, 0, 0] > 240 and g[0, 32, 1] > 240 and g[0, 63, 2] > 240
    d = gradient.render_gradient(
        8, 8, (4, 4), (4, 4), (255, 0, 0, 255), (0, 0, 255, 255),
        gradient.GradientShape.RADIAL,
    )
    assert (d[..., 0] == 255).all()  # start color everywhere (t = 0)


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


def test_wand_bottleneck_pocket_gets_fringe_alpha():
    """Minimax semantics (fill_magic.rs:942-1019): an in-tolerance pocket
    enclosed by an exactly-fringe ring is reachable only by crossing a
    thr+1 step, so its alpha is 128 (the bottleneck), not 255."""
    img = np.zeros((9, 9, 4), np.uint8)
    img[...] = [10, 10, 10, 255]
    # build with the LEGACY metric for exact distance control
    img[2:7, 2:7] = [60, 10, 10, 255]   # ring band: far from seed
    img[4, 4] = [10, 10, 10, 255]       # pocket: identical to seed
    # tolerance such that thr = 49: ring dist 50 == thr+1 (fringe)
    tol = 49 / 255 * 100
    from paintfe_tpu.ops.fill import magic_wand_mask, tolerance_threshold_u8
    assert tolerance_threshold_u8(tol) == 49
    mask = magic_wand_mask(img, 0, 0, tol, contiguous=True,
                           anti_aliased=True, metric="legacy")
    assert mask[0, 0] == 255          # seed core
    assert mask[2, 2] == 128          # fringe ring
    assert mask[4, 4] == 128          # pocket: bottleneck thr+1, NOT 255
    # without AA the fringe is impassable: pocket unreachable
    mask2 = magic_wand_mask(img, 0, 0, tol, contiguous=True,
                            anti_aliased=False, metric="legacy")
    assert mask2[4, 4] == 0 and mask2[2, 2] == 0 and mask2[0, 0] == 255


def test_bucket_fill_uses_legacy_metric():
    """The fill tool pins max-component distance (fill_magic.rs:1267-1273):
    byte-identical flat regions always fill completely at tolerance 0."""
    img = np.zeros((8, 8, 4), np.uint8)
    img[...] = [123, 47, 201, 255]
    out = fill.bucket_fill(img, 2, 2, (0, 255, 0, 255), tolerance=0.0)
    assert (out[..., 1] == 255).all() and (out[..., 0] == 0).all()
