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


# -- image brush tips (brushes.rs:1290-1388, brush_render.rs:402-720) ----------


def _tip_png(pattern="disc", size=64):
    import io as _io

    from PIL import Image

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    d = np.hypot(xx - size / 2, yy - size / 2)
    if pattern == "disc":
        img = np.where(d < size * 0.4, 255, 0).astype(np.uint8)
    else:  # soft radial
        img = np.clip(255.0 * (1.0 - d / (size * 0.5)), 0, 255).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(img, "L").save(buf, "PNG")
    return buf.getvalue()


def test_brush_tip_load_and_square_pad():
    import io as _io

    from PIL import Image

    from paintfe_tpu.tools import brush_tips as bt

    lib = bt.BrushTipLibrary()
    tip = lib.load_brush_tip("disc", "custom", _tip_png())
    assert tip.mask_size == 64 and lib.categories == {"custom": ["disc"]}
    # non-square source pads to max dimension with zeros
    rect = np.full((16, 40), 200, np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(rect, "L").save(buf, "PNG")
    tip2 = lib.load_brush_tip("rect", "custom", buf.getvalue())
    assert tip2.mask_size == 40
    assert (tip2.mask[16:, :] == 0).all() and (tip2.mask[:16, :40] == 200).all()
    assert lib.remove_brush_tip("rect") and lib.get("rect") is None


def test_rebuild_tip_mask_hardness_and_aa():
    from paintfe_tpu.tools import brush_tips as bt

    lib = bt.BrushTipLibrary()
    tip = lib.load_brush_tip("soft", "custom", _tip_png("soft"))
    hard = bt.rebuild_tip_mask(tip, 32.0, 1.0)
    soft = bt.rebuild_tip_mask(tip, 32.0, 0.2)
    assert hard.shape == (32, 32)
    # low hardness thresholds away the dim fringe
    assert (soft > 0).sum() < (hard > 0).sum()
    # upscale path skips the AA blur and keeps the full-intensity core
    # (the downscale path's blur pass dims the peak)
    big = bt.rebuild_tip_mask(tip, 128.0, 1.0)
    assert big.shape == (128, 128) and big.max() == 255 and hard.max() < 255


def test_draw_image_tip_stamp_rotation_scatter():
    from paintfe_tpu.tools import brush_tips as bt

    lib = bt.BrushTipLibrary()
    tip = lib.load_brush_tip("disc", "custom", _tip_png())
    m = bt.rebuild_tip_mask(tip, 24.0, 1.0)

    plain = np.zeros((64, 64, 4), np.uint8)
    bt.draw_image_tip(plain, (32, 32), m, (255, 0, 0, 255))
    assert plain[32, 32, 3] == 255 and plain[2, 2, 3] == 0

    rot = np.zeros((64, 64, 4), np.uint8)
    bt.draw_image_tip(rot, (32, 32), m, (255, 0, 0, 255), rotation_deg=30.0)
    assert (rot[..., 3] > 0).any()

    # scatter is deterministic per (pos, counter)
    c1 = np.zeros((64, 64, 4), np.uint8)
    c2 = np.zeros((64, 64, 4), np.uint8)
    bt.draw_image_tip(c1, (32, 32), m, (0, 255, 0, 255), scatter=0.5,
                      stamp_counter=3, brush_size=24)
    bt.draw_image_tip(c2, (32, 32), m, (0, 255, 0, 255), scatter=0.5,
                      stamp_counter=3, brush_size=24)
    np.testing.assert_array_equal(c1, c2)

    # selection mask gates the stamp
    sel = np.zeros((64, 64), np.uint8)
    sel[:, 32:] = 255
    gated = np.zeros((64, 64, 4), np.uint8)
    bt.draw_image_tip(gated, (32, 32), m, (255, 0, 0, 255), selection=sel)
    assert (gated[:, :32, 3] == 0).all() and (gated[:, 32:, 3] > 0).any()


def test_draw_image_tip_eraser_and_jitter():
    from paintfe_tpu.tools import brush_tips as bt

    lib = bt.BrushTipLibrary()
    tip = lib.load_brush_tip("disc", "custom", _tip_png())
    m = bt.rebuild_tip_mask(tip, 24.0, 1.0)
    base = np.full((64, 64, 4), 100, np.uint8)  # alpha 100 < full-strength 255
    bt.draw_image_tip(base, (32, 32), m, (0, 0, 0, 255), is_eraser=True)
    assert base[32, 32, 3] == 255 and (base[32, 32, 0:3] == 0).all()
    assert (base[2, 2] == 100).all()

    c = bt.jitter_color((200, 40, 40), 0.5, 0.3, (10.0, 12.0), 7)
    assert c != (200, 40, 40) and all(0 <= v <= 255 for v in c)
    assert bt.jitter_color((200, 40, 40), 0.0, 0.0, (10.0, 12.0), 7) == (200, 40, 40)


def test_stock_tip_registry_matches_reference_inventory():
    """Same names/categories as the reference's embedded asset set
    (assets/brushes/* via config/brushes.rs:1055-1066); masks are
    procedural originals."""
    from paintfe_tpu.tools.brush_tips import stock_library

    lib = stock_library()
    # title-cased display names/categories, both sorted, exactly like
    # build.rs registers the embedded PNGs ('dry_brush.png' -> 'Dry Brush')
    assert lib.categories == {
        "Artistic": ["Chalk", "Charcoal", "Dry Brush", "Ink Splatter",
                     "Spray", "Watercolor"],
        "Basic": ["Diamond", "Square"],
        "Texture": ["Blob", "Hatching"],
        "Vegetation": ["Fern", "Grass", "Maple"],
    }
    assert list(lib.categories) == ["Artistic", "Basic", "Texture",
                                    "Vegetation"]
    # deterministic across constructions
    lib2 = stock_library()
    for name, tip in lib.tips.items():
        assert tip.mask_size == tip.mask.shape[0] == tip.mask.shape[1]
        assert np.array_equal(tip.mask, lib2.tips[name].mask)
        assert tip.mask.max() > 100        # real coverage, not near-empty
        assert (tip.mask > 0).mean() > 0.01


def test_stock_tips_stamp():
    from paintfe_tpu.tools.brush_tips import (draw_image_tip, rebuild_tip_mask,
                                              stock_library)

    lib = stock_library()
    for name, tip in lib.tips.items():
        mask = rebuild_tip_mask(tip, 24.0, 0.8)
        target = np.zeros((48, 48, 4), np.uint8)
        draw_image_tip(target, (24.0, 24.0), mask, (255, 0, 0, 255))
        assert (target[..., 3] > 0).any(), name


def test_clone_line_skips_offcanvas_steps_but_taps_stamp():
    """clone_stamp_line skips step centers outside the canvas; a tap
    stamps unconditionally with bbox clipping (clone_heal.rs:101-132)."""
    from paintfe_tpu.tools import clone_heal as ch
    from paintfe_tpu.tools.brush import Brush

    src = np.full((32, 32, 4), 200, np.uint8)
    brush = Brush(size=10.0)
    # line whose first steps are off-canvas: those stamps must be skipped
    pv1 = np.zeros((32, 32, 4), np.uint8)
    ch.clone_stamp_line(brush, pv1, src, (-6.0, 16.0), (-2.0, 16.0), (4.0, 0.0))
    assert not (pv1[..., 3] > 0).any()
    # a tap just off-canvas still stamps its in-canvas bbox
    pv2 = np.zeros((32, 32, 4), np.uint8)
    ch.heal_line(brush, pv2, src, (-0.5, 16.0), (-0.5, 16.0), 4.0)
    assert (pv2[..., 3] > 0).any()


def test_clone_source_rounds_half_away():
    """Rust f32::round is half away from zero: a source coord of exactly
    -0.5 rounds to -1 (out of bounds, skipped) — floor(x+0.5) would clone
    from column 0."""
    from paintfe_tpu.tools import clone_heal as ch
    from paintfe_tpu.tools.brush import Brush

    src = np.zeros((16, 16, 4), np.uint8)
    src[:, 0] = [9, 9, 9, 255]  # column 0 is the telltale
    brush = Brush(size=3.0, anti_aliased=False)
    pv = np.zeros((16, 16, 4), np.uint8)
    # dest x=8, offset -8.5 -> sx = round(-0.5) = -1: nothing cloned
    ch.clone_stamp_circle(brush, pv, src, (8.0, 8.0), (-8.5, 0.0))
    assert not (pv[..., 3] > 0).any()


def test_brush_scatter_and_jitter_active():
    """scatter/hue_jitter/brightness_jitter were silently dead on the
    circle brush (r4 review): they must change the stroke, deterministically
    via the stamp-counter hash."""
    from paintfe_tpu.tools.brush import Brush

    def stroke(**props):
        b = Brush(size=8.0)
        for k, v in props.items():
            setattr(b.properties, k, v)
        img = np.zeros((64, 64, 4), np.uint8)
        b.draw_line(img, (10.0, 32.0), (54.0, 32.0),
                    primary=(0.8, 0.3, 0.2, 1.0))
        return img

    base = stroke()
    scattered = stroke(scatter=0.5)
    assert (base != scattered).any(), "scatter is a dead property"
    np.testing.assert_array_equal(scattered, stroke(scatter=0.5))  # seeded
    jittered = stroke(hue_jitter=0.8)
    assert (base != jittered).any(), "hue_jitter is a dead property"


def test_stamp_hash_saturates_negative_coords():
    """Rust `(x*100.0) as u32` saturates negatives to 0 — wrapping to
    0xFFFFFF9C diverges every scatter offset for off-canvas stamps."""
    from paintfe_tpu.tools.brush_tips import stamp_hash

    assert stamp_hash(-1.0, 5.0, 3) == stamp_hash(-123.0, 5.0, 3) == \
        stamp_hash(0.0, 5.0, 3)
