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
