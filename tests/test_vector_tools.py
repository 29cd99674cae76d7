"""Clone/heal brushes and vector tools (clone_heal.rs, bezier_math.rs,
perspective_gradient.rs)."""

import numpy as np

from paintfe_tpu.core import fixtures
from paintfe_tpu.core.canvas import Canvas
from paintfe_tpu.core.selection import SelectionMode
from paintfe_tpu.tools import clone_heal as ch
from paintfe_tpu.tools import vector_tools as vt
from paintfe_tpu.tools.brush import Brush


def _src():
    return np.asarray(fixtures.test_gradient(64, 64))


def test_clone_stamp_samples_offset_source():
    src = _src()
    b = Brush(size=12.0, hardness=0.8)
    prev = np.zeros_like(src)
    ch.clone_stamp_circle(b, prev, src, (40, 40), (-20.0, -20.0))
    # center pixel copies the source 20px up-left, alpha from the brush core
    np.testing.assert_array_equal(prev[40, 40, 0:3], src[20, 20, 0:3])
    assert prev[40, 40, 3] == 255
    assert prev[5, 5, 3] == 0  # untouched outside the stamp


def test_clone_stamp_respects_selection_and_bounds():
    src = _src()
    b = Brush(size=12.0, hardness=1.0)
    sel = np.zeros((64, 64), np.uint8)
    sel[:, 40:] = 255
    prev = np.zeros_like(src)
    ch.clone_stamp_circle(b, prev, src, (40, 40), (0.0, 0.0), selection=sel)
    assert (prev[:, :40, 3] == 0).all()
    assert (prev[:, 40:, 3] > 0).any()
    # source offset walking off-canvas stamps nothing
    prev2 = np.zeros_like(src)
    ch.clone_stamp_circle(b, prev2, src, (3, 3), (-100.0, -100.0))
    assert (prev2[..., 3] == 0).all()


def test_heal_averages_surroundings():
    src = _src()
    marred = src.copy()
    marred[28:36, 28:36, 0:3] = 0
    b = Brush(size=12.0, hardness=0.8)
    prev = np.zeros_like(src)
    ch.heal_line(b, prev, marred, (30, 30), (34, 34), sample_radius=10.0)
    # the healed center pulls color from the intact ring, far from 0
    assert prev[32, 32, 3] > 0
    assert prev[32, 32, 0:3].astype(int).sum() > 150


def test_bezier_solid_line_covers_path():
    prev = np.zeros((64, 64, 4), np.uint8)
    vt.rasterize_bezier(prev, [(5, 32), (25, 32), (40, 32), (58, 32)],
                        (0, 255, 0, 255), 4.0)
    row = prev[32, 6:58]
    assert (row[:, 3] > 0).mean() > 0.9  # near-continuous coverage
    assert (row[row[:, 3] > 0][:, 1] == 255).all()


def test_bezier_dashed_has_gaps_and_flat_caps_skip_ends():
    solid = np.zeros((64, 64, 4), np.uint8)
    dashed = np.zeros((64, 64, 4), np.uint8)
    pts = [(5, 32), (25, 32), (40, 32), (58, 32)]
    vt.rasterize_bezier(solid, pts, (255, 0, 0, 255), 4.0)
    vt.rasterize_bezier(dashed, pts, (255, 0, 0, 255), 4.0, pattern="dashed")
    assert (dashed[..., 3] > 0).sum() < (solid[..., 3] > 0).sum()
    # flat caps skip only the endpoint stamps; with dense spacing neighbors
    # cover the same pixels, so flat coverage is a (possibly equal) subset
    flat = np.zeros((64, 64, 4), np.uint8)
    vt.rasterize_bezier(flat, pts, (255, 0, 0, 255), 4.0, cap_style="flat")
    assert ((flat[..., 3] > 0) & ~(solid[..., 3] > 0)).sum() == 0


def test_bezier_arrowhead():
    plain = np.zeros((64, 64, 4), np.uint8)
    arrow = np.zeros((64, 64, 4), np.uint8)
    pts = [(5, 32), (20, 32), (35, 32), (50, 32)]
    vt.rasterize_bezier(plain, pts, (255, 0, 0, 255), 3.0)
    vt.rasterize_bezier(arrow, pts, (255, 0, 0, 255), 3.0, arrow_side="end")
    # the arrow adds pixels past the endpoint
    assert (arrow[:, 51:, 3] > 0).sum() > (plain[:, 51:, 3] > 0).sum()


def test_lasso_selection_modes():
    c = Canvas.from_image(_src())
    vt.apply_lasso_selection(c, [(10, 10), (50, 10), (50, 50), (10, 50)],
                             SelectionMode.REPLACE)
    assert c.selection[30, 30] == 255 and c.selection[5, 5] == 0
    vt.apply_lasso_selection(c, [(0, 0), (20, 0), (20, 20), (0, 20)],
                             SelectionMode.SUBTRACT)
    assert c.selection[12, 12] == 0 and c.selection[30, 30] == 255
    vt.apply_lasso_selection(c, [(25, 25), (60, 25), (60, 60), (25, 60)],
                             SelectionMode.INTERSECT)
    assert c.selection[30, 30] == 255 and c.selection[22, 22] == 0


def test_perspective_crop_bilinear_center_sampling():
    src = _src()
    c = Canvas.from_image(src)
    assert vt.apply_perspective_crop(c, [(8, 8), (40, 8), (40, 40), (8, 40)])
    assert (c.width, c.height) == (32, 32)

    # manual per-pixel reference of the +0.5-center bilinear quad mapping
    def lerp(a, b, t):
        return np.clip(np.floor(a * (1 - t) + b * t + 0.5), 0, 255)

    def bl(x, y):
        x0, y0 = int(x), int(y)
        fx, fy = x - x0, y - y0
        p = src.astype(np.float32)
        top = lerp(p[y0, x0], p[y0, x0 + 1], fx)
        bot = lerp(p[y0 + 1, x0], p[y0 + 1, x0 + 1], fx)
        return lerp(top, bot, fy).astype(np.uint8)

    np.testing.assert_array_equal(c.layers[0].pixels[0, 0], bl(8.5, 8.5))
    np.testing.assert_array_equal(c.layers[0].pixels[10, 20], bl(28.5, 18.5))
    assert c.selection is None


def test_perspective_crop_skewed_quad():
    c = Canvas.from_image(_src())
    assert vt.apply_perspective_crop(c, [(10, 8), (44, 12), (40, 44), (6, 40)])
    assert c.width >= 2 and c.height >= 2
    # degenerate quad is rejected
    c2 = Canvas.from_image(_src())
    assert not vt.apply_perspective_crop(c2, [(10, 10), (11, 10), (11, 11), (10, 11)])


def test_bezier_start_arrowhead_points_backward():
    """The start arrow's apex trails BEHIND P0 (bezier_math.rs:252-276:
    tip = P0 - t(0)*tip_advance); it used to point forward into the curve."""
    import paintfe_tpu.tools.vector_tools as vt

    pts = ((20.0, 32.0), (30.0, 32.0), (40.0, 32.0), (50.0, 32.0))
    plain = np.zeros((64, 64, 4), np.uint8)
    vt.rasterize_bezier(plain, pts, (255, 0, 0, 255), 3.0, arrow_side="none")
    start = np.zeros((64, 64, 4), np.uint8)
    vt.rasterize_bezier(start, pts, (255, 0, 0, 255), 3.0, arrow_side="start")
    # pixels appear BEFORE x=20 (behind the start point)...
    assert (start[:, :19, 3] > 0).sum() > (plain[:, :19, 3] > 0).sum()
    # ...apex at x = 20 - tip_adv = 15.5, base toward the curve at 24.5
    assert (start[:, 14:17, 3] > 0).any()
    # nothing extends further back than the apex
    assert not (start[:, :14, 3] > 0).any()
