"""All 25 blend modes vs the reference's golden PNGs.

Mirror of tests/visual_blend.rs: checkerboard BG + translucent gradient FG,
flattened, compared golden-per-mode.
"""

import numpy as np
import pytest

from paintfe_tpu.core.blend import BlendMode
from paintfe_tpu.core.canvas import Canvas, Layer
from paintfe_tpu.core import fixtures

from common import assert_golden

GOLDEN_NAMES = {
    BlendMode.NORMAL: "normal",
    BlendMode.MULTIPLY: "multiply",
    BlendMode.SCREEN: "screen",
    BlendMode.ADDITIVE: "additive",
    BlendMode.REFLECT: "reflect",
    BlendMode.GLOW: "glow",
    BlendMode.COLOR_BURN: "color_burn",
    BlendMode.COLOR_DODGE: "color_dodge",
    BlendMode.OVERLAY: "overlay",
    BlendMode.DIFFERENCE: "difference",
    BlendMode.NEGATION: "negation",
    BlendMode.LIGHTEN: "lighten",
    BlendMode.DARKEN: "darken",
    BlendMode.XOR: "xor",
    BlendMode.OVERWRITE: "overwrite",
    BlendMode.HARD_LIGHT: "hard_light",
    BlendMode.SOFT_LIGHT: "soft_light",
    BlendMode.EXCLUSION: "exclusion",
    BlendMode.SUBTRACT: "subtract",
    BlendMode.DIVIDE: "divide",
    BlendMode.LINEAR_BURN: "linear_burn",
    BlendMode.VIVID_LIGHT: "vivid_light",
    BlendMode.LINEAR_LIGHT: "linear_light",
    BlendMode.PIN_LIGHT: "pin_light",
    BlendMode.HARD_MIX: "hard_mix",
}


def make_blend_canvas(mode: BlendMode, opacity: float = 1.0) -> Canvas:
    w = h = 64
    canvas = Canvas.from_image(fixtures.test_checkerboard(w, h))
    fg = Layer(name="Foreground", pixels=fixtures.blend_test_foreground(w, h))
    fg.blend_mode = mode
    fg.opacity = opacity
    canvas.layers.append(fg)
    return canvas


@pytest.mark.parametrize("mode", list(GOLDEN_NAMES), ids=[GOLDEN_NAMES[m] for m in GOLDEN_NAMES])
def test_blend_mode_golden(mode):
    result = make_blend_canvas(mode).composite()
    assert_golden("blend", GOLDEN_NAMES[mode], result)


def test_normal_half_opacity():
    # FG here is the opaque test gradient, not the translucent blend FG
    # (visual_blend.rs:89-106).
    canvas = Canvas.from_image(fixtures.test_checkerboard(64, 64))
    fg = Layer(name="Foreground", pixels=fixtures.test_gradient(64, 64))
    fg.opacity = 0.5
    canvas.layers.append(fg)
    assert_golden("blend", "normal_half_opacity", canvas.composite())


def test_transparent_top_passthrough():
    base = fixtures.test_gradient(32, 32)
    canvas = Canvas.from_image(base)
    canvas.layers.append(Layer(name="empty", pixels=fixtures.transparent(32, 32)))
    np.testing.assert_array_equal(canvas.composite(), base)


def test_invisible_layer_skipped():
    base = fixtures.test_gradient(32, 32)
    canvas = Canvas.from_image(base)
    top = Layer(name="top", pixels=fixtures.solid(32, 32, (255, 0, 0, 255)))
    top.visible = False
    canvas.layers.append(top)
    np.testing.assert_array_equal(canvas.composite(), base)


def test_layer_mask_conceals():
    base = fixtures.solid(16, 16, (0, 0, 0, 255))
    canvas = Canvas.from_image(base)
    top = Layer(name="top", pixels=fixtures.solid(16, 16, (255, 255, 255, 255)))
    mask = np.zeros((16, 16), np.uint8)
    mask[:, 8:] = 255  # conceal right half
    top.mask = mask
    canvas.layers.append(top)
    out = canvas.composite()
    assert (out[:, :8, 0] == 255).all()
    assert (out[:, 8:, 0] == 0).all()
