"""Brush/eraser/line stamping vs goldens (mirror of tool_strokes.rs)."""

import numpy as np

from paintfe_tpu.core import fixtures
from paintfe_tpu.tools import Brush, BrushMode

from common import assert_golden

W = H = 64
WHITE = (1.0, 1.0, 1.0, 1.0)
BLACK = (0.0, 0.0, 0.0, 1.0)
RED = (1.0, 0.0, 0.0, 1.0)
BLUE_SEMI = (0.0, 0.0, 1.0, 0.5)


def blank():
    return np.zeros((H, W, 4), np.uint8)


def white():
    return np.full((H, W, 4), 255, np.uint8)


def test_brush_circle_center():
    img = blank()
    Brush(20.0, 1.0, True).draw_circle(img, (32.0, 32.0), primary=BLACK, secondary=WHITE)
    assert_golden("tools", "brush_circle_center", img)


def test_brush_circle_soft():
    img = blank()
    Brush(30.0, 0.0, True).draw_circle(img, (32.0, 32.0), primary=BLACK, secondary=WHITE)
    assert_golden("tools", "brush_circle_soft", img)


def test_brush_circle_hard():
    img = blank()
    Brush(20.0, 1.0, False).draw_circle(img, (32.0, 32.0), primary=BLACK, secondary=WHITE)
    assert_golden("tools", "brush_circle_hard", img)


def test_brush_circle_tiny():
    img = blank()
    Brush(3.0, 1.0, True).draw_circle(img, (32.0, 32.0), primary=RED, secondary=WHITE)
    assert_golden("tools", "brush_circle_tiny", img)


def test_brush_circle_large():
    img = blank()
    Brush(60.0, 0.5, True).draw_circle(img, (32.0, 32.0), primary=BLACK, secondary=WHITE)
    assert_golden("tools", "brush_circle_large", img)


def test_brush_semi_transparent():
    img = blank()
    Brush(20.0, 1.0, True).draw_circle(img, (32.0, 32.0), primary=BLUE_SEMI, secondary=WHITE)
    assert_golden("tools", "brush_semi_transparent", img)


def test_brush_secondary_color():
    img = blank()
    Brush(20.0, 1.0, True).draw_circle(
        img, (32.0, 32.0), use_secondary=True, primary=BLACK, secondary=RED
    )
    assert_golden("tools", "brush_secondary_color", img)


def test_eraser_circle():
    img = white()
    Brush(20.0, 1.0, True).draw_circle(img, (32.0, 32.0), is_eraser=True,
                                       primary=BLACK, secondary=WHITE)
    assert_golden("tools", "eraser_circle", img)


def test_eraser_soft():
    img = white()
    Brush(30.0, 0.0, True).draw_circle(img, (32.0, 32.0), is_eraser=True,
                                       primary=BLACK, secondary=WHITE)
    assert_golden("tools", "eraser_soft", img)


def test_line_horizontal():
    img = blank()
    Brush(8.0, 1.0, True).draw_line(img, (4.0, 32.0), (60.0, 32.0), primary=BLACK)
    assert_golden("tools", "line_horizontal", img)


def test_line_vertical():
    img = blank()
    Brush(8.0, 1.0, True).draw_line(img, (32.0, 4.0), (32.0, 60.0), primary=BLACK)
    assert_golden("tools", "line_vertical", img)


def test_line_diagonal():
    img = blank()
    Brush(6.0, 0.8, True).draw_line(img, (4.0, 4.0), (60.0, 60.0), primary=BLACK)
    assert_golden("tools", "line_diagonal", img)


def test_line_soft_thick():
    img = blank()
    Brush(16.0, 0.3, True).draw_line(img, (10.0, 50.0), (54.0, 10.0), primary=RED)
    assert_golden("tools", "line_soft_thick", img)


def test_line_eraser():
    img = white()
    Brush(10.0, 1.0, True).draw_line(img, (4.0, 32.0), (60.0, 32.0), is_eraser=True,
                                     primary=BLACK)
    assert_golden("tools", "line_eraser", img)


def test_brush_with_selection_mask():
    img = blank()
    mask = np.zeros((H, W), np.uint8)
    mask[:, : W // 2] = 255
    Brush(40.0, 1.0, True).draw_circle(img, (32.0, 32.0), primary=BLACK, mask=mask)
    assert_golden("tools", "brush_with_selection_mask", img)


def test_stroke_multiple_stamps():
    img = blank()
    brush = Brush(10.0, 0.8, True)
    for i in range(8):
        brush.draw_circle(img, (8.0 + i * 7.0, 32.0), primary=BLACK)
    assert_golden("tools", "stroke_multiple_stamps", img)


def test_brush_at_origin():
    img = blank()
    Brush(10.0, 1.0, True).draw_circle(img, (0.0, 0.0), primary=BLACK)
    assert_golden("tools", "brush_at_origin", img)


def test_brush_at_corner():
    img = blank()
    Brush(20.0, 1.0, True).draw_circle(img, (63.0, 63.0), primary=BLACK)
    assert_golden("tools", "brush_at_corner", img)


def test_line_zero_length():
    img = blank()
    Brush(12.0, 1.0, True).draw_line(img, (32.0, 32.0), (32.0, 32.0), primary=BLACK)
    assert_golden("tools", "line_zero_length", img)


def test_brush_dodge_mode():
    img = fixtures.test_gradient(W, H)
    Brush(24.0, 1.0, True, brush_mode=BrushMode.DODGE).draw_circle(
        img, (32.0, 32.0), primary=BLACK
    )
    assert_golden("tools", "brush_dodge_mode", img)


def test_brush_burn_mode():
    img = fixtures.test_gradient(W, H)
    Brush(24.0, 1.0, True, brush_mode=BrushMode.BURN).draw_circle(
        img, (32.0, 32.0), primary=BLACK
    )
    assert_golden("tools", "brush_burn_mode", img)


def test_pencil_circle():
    img = blank()
    Brush(12.0, 1.0, False).draw_circle(img, (32.0, 32.0), primary=BLACK)
    assert_golden("tools", "pencil_circle", img)
    alphas = np.unique(img[..., 3])
    assert set(alphas.tolist()) <= {0, 255}  # aliased: binary alpha


def test_pencil_line():
    img = blank()
    Brush(4.0, 1.0, False).draw_line(img, (4.0, 4.0), (60.0, 60.0), primary=RED)
    assert_golden("tools", "pencil_line", img)


def test_color_picker_reads_painted_pixel():
    img = blank()
    Brush(10.0, 1.0, True).draw_circle(img, (32.0, 32.0), primary=RED)
    assert img[32, 32, 0] == 255 and img[32, 32, 1] == 0 and img[32, 32, 3] == 255
