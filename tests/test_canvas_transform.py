"""Canvas-level transforms incl. selection-aware cutout semantics
(mirror of the in-module tests at transform.rs:1763-1871)."""

import numpy as np

from paintfe_tpu.core import fixtures
from paintfe_tpu.core.canvas import Canvas, Layer
from paintfe_tpu.ops import canvas_transform as ct


def transparent_canvas(w, h, layer_count=2):
    c = Canvas(width=w, height=h)
    for i in range(layer_count):
        c.layers.append(Layer.new(f"Layer {i + 1}", w, h))
    return c


def test_flip_h_moves_selected_pixels_on_all_layers():
    # transform.rs:1781-1818
    c = transparent_canvas(4, 4)
    c.layers[0].pixels[1, 0] = [255, 0, 0, 255]
    c.layers[0].pixels[2, 0] = [0, 255, 0, 255]
    c.layers[1].pixels[1, 0] = [0, 0, 255, 255]
    mask = np.zeros((4, 4), np.uint8)
    mask[1, 0] = mask[1, 1] = mask[2, 0] = 255
    c.selection = mask
    ct.flip_canvas_horizontal(c)
    np.testing.assert_array_equal(c.layers[0].pixels[1, 0], [0, 0, 0, 0])
    np.testing.assert_array_equal(c.layers[0].pixels[1, 1], [255, 0, 0, 255])
    np.testing.assert_array_equal(c.layers[0].pixels[2, 1], [0, 255, 0, 255])
    np.testing.assert_array_equal(c.layers[1].pixels[1, 1], [0, 0, 255, 255])
    assert c.selection[1, 0] == 255 and c.selection[1, 1] == 255
    assert c.selection[2, 1] == 255 and c.selection[2, 0] == 0


def test_full_selection_flips_whole_canvas():
    c = Canvas.from_image(fixtures.test_gradient(8, 8))
    c.selection = np.full((8, 8), 255, np.uint8)  # full selection -> whole-canvas path
    before = c.layers[0].pixels.copy()
    ct.flip_canvas_horizontal(c)
    np.testing.assert_array_equal(c.layers[0].pixels, before[:, ::-1])


def test_rotate_90_swaps_dims_without_selection():
    c = Canvas.from_image(fixtures.test_gradient(8, 4))
    ct.rotate_canvas_90cw(c)
    assert (c.width, c.height) == (4, 8)
    assert c.layers[0].pixels.shape[:2] == (8, 4)
    ct.rotate_canvas_90ccw(c)
    assert (c.width, c.height) == (8, 4)
    np.testing.assert_array_equal(c.layers[0].pixels, fixtures.test_gradient(8, 4))


def test_rotate_selected_region_stays_centered():
    c = transparent_canvas(5, 5)
    c.layers[0].pixels[1, 1] = [255, 0, 0, 255]
    c.layers[0].pixels[2, 1] = [0, 255, 0, 255]
    mask = np.zeros((5, 5), np.uint8)
    mask[1, 1] = mask[2, 1] = 255  # 1x2 vertical region
    c.selection = mask
    ct.rotate_canvas_90cw(c)
    assert (c.width, c.height) == (5, 5)  # canvas unchanged for region rotate
    # the 1-wide, 2-tall strip becomes 2-wide, 1-tall, centered on the bbox
    assert (c.selection > 0).sum() == 2
    reds = np.argwhere((c.layers[0].pixels[..., 0] == 255))
    greens = np.argwhere((c.layers[0].pixels[..., 1] == 255))
    assert len(reds) == 1 and len(greens) == 1
    assert reds[0][0] == greens[0][0]  # now on one row


def test_canvas_resize_and_lod():
    c = Canvas.from_image(fixtures.test_gradient(64, 48))
    ct.resize_image(c, 32, 24)
    assert (c.width, c.height) == (32, 24)
    assert c.layers[0].pixels.shape[:2] == (24, 32)
    big = Canvas.from_image(fixtures.test_gradient(2048, 1024))
    lod = ct.composite_lod(big)
    assert max(lod.shape[:2]) == 1024


def test_composite_viewport_window():
    c = Canvas.from_image(fixtures.test_gradient(32, 32))
    window = ct.composite_viewport(c, (8, 8, 16, 16))
    np.testing.assert_array_equal(window, c.composite()[8:16, 8:16])


def test_crop_to_selection():
    """adjustments.rs:737-786: crop all layers to the selection bbox,
    shrink the canvas, clear the selection; no-op without a selection."""
    from paintfe_tpu.core.canvas import Canvas, Layer
    from paintfe_tpu.core.selection import rect_mask
    from paintfe_tpu.ops.canvas_transform import crop_to_selection

    rng = np.random.default_rng(0)
    px0 = rng.integers(0, 256, (20, 30, 4), np.uint8)
    px1 = rng.integers(0, 256, (20, 30, 4), np.uint8)
    lm = rng.integers(0, 256, (20, 30), np.uint8)
    canvas = Canvas(width=30, height=20, layers=[
        Layer(name="a", pixels=px0.copy()),
        Layer(name="b", pixels=px1.copy(), mask=lm.copy()),
    ])
    # no selection: no-op
    crop_to_selection(canvas)
    assert canvas.width == 30 and canvas.height == 20

    canvas.selection = rect_mask(30, 20, 5, 3, 24, 14)
    crop_to_selection(canvas)
    assert (canvas.width, canvas.height) == (20, 12)
    assert canvas.selection is None
    assert np.array_equal(canvas.layers[0].pixels, px0[3:15, 5:25])
    assert np.array_equal(canvas.layers[1].pixels, px1[3:15, 5:25])
    assert np.array_equal(canvas.layers[1].mask, lm[3:15, 5:25])

    # empty (all-zero) selection: no-op
    canvas.selection = np.zeros((12, 20), np.uint8)
    crop_to_selection(canvas)
    assert (canvas.width, canvas.height) == (20, 12)


def test_canvas_transforms_clear_preview():
    """Every canvas transform drops the stroke preview first (the reference
    calls clear_preview_state in all 9 entry points); a stale pre-rotation
    preview on a non-square canvas used to crash the next composite."""
    from paintfe_tpu.ops import canvas_transform as ct

    for op in (ct.rotate_canvas_90cw, ct.rotate_canvas_90ccw,
               ct.rotate_canvas_180, ct.flip_canvas_horizontal,
               lambda c: ct.rotate_canvas_arbitrary(c, 30.0),
               lambda c: ct.resize_image(c, 40, 30),
               lambda c: ct.resize_canvas(c, 50, 60)):
        c = Canvas.new(32, 64, background=(10, 20, 30, 255))
        c.preview = np.zeros((64, 32, 4), np.uint8)
        c.preview[5:10, 5:10] = [255, 0, 0, 255]
        op(c)
        assert c.preview is None
        out = c.composite()  # crashed on shape mismatch before the fix
        assert out.shape[0] == c.height and out.shape[1] == c.width
