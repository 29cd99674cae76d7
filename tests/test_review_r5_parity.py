"""Regression tests for the round-5 tools/engine/ops parity review.

Pins: host-fn arity errors are catchable script errors in every tier
(incl. the traced batch path), canvas-op dimension changes keep layer
masks readable, cut auto-deselects, merge_down rasterizes text layers,
duplicate naming, and text-effect derivation from glyph coverage.
"""

import numpy as np
import pytest

from paintfe_tpu.core.canvas import Canvas, Layer
from paintfe_tpu.scripting import ScriptError, execute_script_sync


def test_host_arity_errors_are_script_errors(monkeypatch):
    px = np.zeros((4, 4, 4), np.uint8)
    for mode in ("0", "1"):
        monkeypatch.setenv("PAINTFE_SCRIPT_COMPILE", mode)
        with pytest.raises(ScriptError, match="function not found"):
            execute_script_sync("apply_levels(0.0, 255.0);", px, 4, 4, None)
        with pytest.raises(ScriptError, match="function not found"):
            execute_script_sync("apply_blur();", px, 4, 4, None)
        # catchable from script-level try
        out = execute_script_sync(
            'try { apply_blur(); } catch (e) { print_line("caught"); }',
            px, 4, 4, None)
        assert out[3] == ["caught"]
        # optional-arg forms stay legal
        execute_script_sync("apply_sepia();", px, 4, 4, None)


def test_trace_path_arity_matches_interpreter():
    from paintfe_tpu.parallel.pipeline import trace_script
    from paintfe_tpu.scripting.interp import RhaiRuntimeError

    with pytest.raises(RhaiRuntimeError, match="function not found"):
        trace_script("apply_levels(0.0, 255.0);")
    with pytest.raises(RhaiRuntimeError, match="function not found"):
        trace_script("apply_blur(1.0, 2.0);")
    assert [op.name for op in trace_script("apply_sepia();")] == ["apply_sepia"]


def test_canvas_ops_pad_stale_layer_masks():
    """A dimension-changing canvas op must leave masks readable (the
    reference's sparse mask reads 0 out of bounds) — the dense stack
    previously crashed the compositor on shape mismatch."""
    from paintfe_tpu.scripting.engine import apply_canvas_ops
    from paintfe_tpu.scripting.api import CanvasOpRequest

    c = Canvas.new(8, 6, (10, 10, 10, 255))
    c.layers.append(Layer.new("top", 8, 6, (200, 0, 0, 255)))
    c.layers[1].mask = np.full((6, 8), 255, np.uint8)
    c.layers[1].mask_enabled = True
    apply_canvas_ops(c, [CanvasOpRequest(kind="resize_image", w=12, h=10,
                                         filter="nearest")], skip_layer=-1)
    assert c.layers[1].mask.shape == (10, 12)
    out = c.composite()  # must not raise
    assert out.shape == (10, 12, 4)
    # old region kept its mask; the grown region reads 0 (concealed)
    assert c.layers[1].mask[:6, :8].min() == 255
    assert c.layers[1].mask[6:, :].max() == 0


def test_cut_auto_deselects():
    from paintfe_tpu.core.selection import rect_mask
    from paintfe_tpu.ops.clipboard import Clipboard

    c = Canvas.new(8, 8, (50, 60, 70, 255))
    c.selection = np.asarray(rect_mask(8, 8, 2, 2, 4, 4))
    cb = Clipboard()
    cb.cut(c)
    assert c.selection is None  # clipboard.rs:720 auto-deselect


def test_merge_down_rasterizes_text():
    from paintfe_tpu.ops.canvas_ops import merge_down
    from paintfe_tpu.ops.text_layer import make_text_layer_data

    c = Canvas.new(64, 32, (255, 255, 255, 255))
    top = Layer.new("text", 64, 32, (0, 0, 0, 0))
    top.content = "text"
    top.text_data = make_text_layer_data("Hi", 4, 4, size=16,
                                         color=(255, 0, 0, 255))
    c.layers.append(top)
    merge_down(c, 1)
    assert len(c.layers) == 1
    survivor = c.layers[0]
    assert survivor.content == "raster"
    assert survivor.text_data is None
    # the text pixels actually landed in the merge (red glyphs darken
    # the green/blue channels of the white background)
    assert (survivor.pixels[..., 1] < 250).any()


def test_duplicate_layer_name_capital_copy():
    from paintfe_tpu.ops.canvas_ops import duplicate_layer

    c = Canvas.new(4, 4, (1, 2, 3, 255))
    duplicate_layer(c, 0)
    assert c.layers[1].name == f"{c.layers[0].name} Copy"


def test_outline_derives_from_text_not_shadow():
    """An outline must ring the glyphs, not the drop shadow's blurred
    blob: with a far-offset shadow, no outline pixels may appear in the
    shadow-only region."""
    from paintfe_tpu.ops.text_layer import (OutlineEffect, OutlinePosition,
                                            ShadowEffect, TextEffects,
                                            _apply_effects)

    rgba = np.zeros((40, 80, 4), np.uint8)
    rgba[8:16, 8:24] = [255, 0, 0, 255]  # a "glyph" block
    fx = TextEffects(
        outline=OutlineEffect(width=2, color=(0, 255, 0, 255),
                              position=OutlinePosition.OUTSIDE),
        shadow=ShadowEffect(offset_x=30, offset_y=18, blur_radius=2.0,
                            color=(0, 0, 255, 255)),
    )
    out = _apply_effects(rgba, fx)
    # shadow-only region (offset block position): blue-ish, NO green ring
    region = out[24:36, 36:56]
    assert region[..., 3].max() > 0  # shadow present
    green_ring = (region[..., 1].astype(int) > 128) & (region[..., 2] < 100)
    assert not green_ring.any(), "outline traced the shadow blob"
    # the glyph still has its ring adjacent to the block
    ring_zone = out[5:19, 5:27]
    assert ((ring_zone[..., 1].astype(int) > 128)
            & (ring_zone[..., 0] < 100)).any()


def test_svg_subpath_after_z_keeps_closepoint():
    """SVG spec (and kurbo): a drawing command right after Z starts the
    new subpath at the closepoint — its first segment must not vanish."""
    from paintfe_tpu.ops.shapes import parse_svg_path

    polys = parse_svg_path("M0 0 H10 V10 Z L20 20 L30 30")
    assert len(polys) == 2
    assert polys[1][0] == (0.0, 0.0)  # starts at the closepoint
    assert polys[1][1] == (20.0, 20.0)


def test_custom_shape_bbox_includes_curve_extrema():
    """The scale mapping derives from kurbo's EXACT pre-flatten bounding
    box: a curve bulge between flattening samples must still count."""
    from paintfe_tpu.ops.shapes import parse_custom_shape

    # quadratic bulging to y = -50 at t=0.5 (extremum between samples)
    shape = parse_custom_shape("b", "t", "M0 0 Q 50 -100 100 0")
    x0, y0, x1, y1 = shape.bounds
    assert y0 <= -49.9, shape.bounds
    assert x0 == 0.0 and x1 == 100.0


def test_flood_tolerance_f32_chain():
    """tol_sq must follow the reference's pure-f32 chain (f32(tol) *
    2.55f32): the old f64-multiply-then-round lands 1 ulp off for about a
    third of tolerance values (e.g. 0.09), flipping exact-boundary
    membership.  Structural check: the mask must match a threshold
    computed with the f32-by-f32 product."""
    from paintfe_tpu.ops.color_removal import flood_select

    tol = 0.09  # a value where the two chains differ by 1 ulp
    t32 = np.float32(tol) * np.float32(2.55)
    assert t32 != np.float32(tol * 2.55)  # the premise: chains differ
    # pick a pixel distance straddling the two thresholds: d = old chain's
    # threshold (the LARGER one here) would be IN under f64, OUT under f32
    px = np.zeros((1, 2, 4), np.uint8)
    px[0, 0] = [10, 0, 0, 255]
    px[0, 1] = [11, 0, 0, 255]  # distance 1 > 0.2295 → OUT either way
    m = flood_select(px, 0, 0, tolerance=tol, contiguous=False)
    assert m[0, 1] == 0 and m[0, 0] == 255
    # and the implementation's threshold is bit-equal to the f32 chain
    import paintfe_tpu.ops.color_removal as cr
    import inspect

    src = inspect.getsource(cr.flood_select)
    assert "f32(tolerance) * f32(2.55)" in src


def test_device_cache_sees_layer_mask_bake():
    """apply_layer_mask (and every other document op) must REPLACE the
    pixel array — the device cache revalidates by host-array identity, so
    an in-place write would serve the stale upload forever."""
    from paintfe_tpu.core.device import DeviceLayerCache
    from paintfe_tpu.ops.canvas_ops import apply_layer_mask

    c = Canvas.new(8, 8, (100, 100, 100, 255))
    c.layers[0].mask = np.full((8, 8), 255, np.uint8)  # conceal all
    cache = DeviceLayerCache()
    before = np.asarray(cache.get(c.layers[0]))
    assert before[..., 3].min() == 255
    apply_layer_mask(c, 0)
    after = np.asarray(cache.get(c.layers[0]))
    assert after[..., 3].max() == 0, "cache served the stale upload"


def test_script_rotate_drops_selection_mask():
    """rotate_canvas_90cw on a non-square canvas with a selection used to
    crash later selection ops with IndexError (dense mask kept the old
    shape); the mask now drops like resize_image's."""
    px = np.zeros((4, 8, 4), np.uint8)  # 8 wide, 4 tall
    out = execute_script_sync(
        "select_rect(0, 0, 3, 3); rotate_canvas_90cw(); "
        "fill_selected(255, 0, 0, 255); print_line(`${has_selection()}`);",
        px, 8, 4, None)
    assert out[3] == ["false"]  # mask dropped; fill became a no-op-ish


def test_strict_int_typing():
    """Rhai's typed dispatch never coerces FLOAT->INT: i64-registered
    host fns called with 1.0 must error like the reference."""
    px = np.zeros((4, 4, 4), np.uint8)
    with pytest.raises(ScriptError, match="integer"):
        execute_script_sync("get_pixel(1.0, 2);", px, 4, 4, None)
    with pytest.raises(ScriptError, match="integer"):
        execute_script_sync("apply_median(2.0);", px, 4, 4, None)
    execute_script_sync("apply_median(2);", px, 4, 4, None)  # INT fine


def test_for_region_origin_u32_wrap():
    """Origins wrap through `as u32` like the reference (scripting.rs:513):
    rx = 2^32 truncates to 0, so columns 0..10 process."""
    px = np.zeros((4, 16, 4), np.uint8)
    out, _, _, console, _ = execute_script_sync(
        "let n = 0; for_region(4294967296, 0, 10, 4, "
        "|x, y, r, g, b, a| { n += 1; [255, g, b, 255] }); "
        "print_line(`${n}`);", px, 16, 4, None)
    assert console == [f"{10 * 4}"]
    assert (out[:, :10, 0] == 255).all() and (out[:, 10:, 0] == 0).all()


def test_warped_glyphs_land_on_anchor():
    """A 90-degree rotated glyph must render near its path anchor (the
    old fixed width//4 offset displaced it by ~pad/2)."""
    from paintfe_tpu.ops.text_layer import (TextBlock, TextLayerData,
                                            TextRun, TextStyle)

    td = TextLayerData()
    td.add_block(TextBlock(position=(40.0, 40.0), rotation=np.pi / 2,
                           runs=[TextRun(text="I",
                                         style=TextStyle(font_size=20,
                                                         color=(0, 0, 0, 255)))]))
    img = np.asarray(td.rasterize(96, 96))
    ys, xs = np.nonzero(img[..., 3])
    assert len(ys) > 0
    cx, cy = xs.mean(), ys.mean()
    # centroid within ~a glyph of the anchor (pre-fix: ~pad = 28px off)
    assert abs(cx - 40) < 22 and abs(cy - 40) < 22, (cx, cy)
