"""Text layer invariants (mirror of tests/text_layer.rs — behavior asserts,
not goldens; glyph metrics differ by font engine)."""

import numpy as np

from paintfe_tpu.core.canvas import Canvas, Layer
from paintfe_tpu.ops import text_layer as tl


def visible(px):
    return int((px[..., 3] > 0).sum())


def test_empty_text_produces_no_pixels():
    td = tl.TextLayerData()
    td.add_block(tl.TextBlock(position=(50, 50), runs=[tl.TextRun("")]))
    assert visible(td.rasterize(200, 200)) == 0


def test_simple_text_produces_pixels():
    td = tl.make_text_layer_data("Hello", 20, 20, size=24)
    assert visible(td.rasterize(200, 200)) > 0


def test_text_color_appears():
    td = tl.make_text_layer_data("Red", 20, 20, size=32, color=(255, 0, 0, 255))
    out = td.rasterize(200, 200)
    opaque = out[out[..., 3] > 200]
    assert len(opaque) and (opaque[:, 0] == 255).any()


def test_larger_font_more_pixels():
    small = tl.make_text_layer_data("Aa", 20, 20, size=12).rasterize(200, 200)
    large = tl.make_text_layer_data("Aa", 20, 20, size=48).rasterize(200, 200)
    assert visible(large) > visible(small)


def test_multi_block_both_rasterized():
    td = tl.TextLayerData()
    td.add_block(tl.TextBlock(position=(10, 10), runs=[tl.TextRun("Top")]))
    td.add_block(tl.TextBlock(position=(10, 150), runs=[tl.TextRun("Bottom")]))
    out = td.rasterize(200, 200)
    assert visible(out[:100]) > 0
    assert visible(out[100:]) > 0


def test_multi_run_block():
    td = tl.TextLayerData()
    td.add_block(tl.TextBlock(position=(10, 10), runs=[
        tl.TextRun("A", tl.TextStyle(color=(255, 0, 0, 255))),
        tl.TextRun("B", tl.TextStyle(color=(0, 0, 255, 255), font_size=36.0)),
    ]))
    out = td.rasterize(200, 200)
    opaque = out[out[..., 3] > 200]
    assert (opaque[:, 0] == 255).any() and (opaque[:, 2] == 255).any()


def test_needs_rasterize_lifecycle():
    td = tl.make_text_layer_data("x", 10, 10)
    assert td.needs_rasterize()
    td.rasterize(64, 64)
    assert not td.needs_rasterize()
    td.mark_dirty()
    assert td.needs_rasterize()


def test_warps_change_layout():
    base = tl.make_text_layer_data("WAVEFORM", 30, 100, size=20).rasterize(300, 200)
    for warp in (tl.ArcWarp(bend=0.8), tl.CircularWarp(radius=60.0),
                 tl.PathFollowWarp(), tl.EnvelopeWarp(top=(0.0, -30.0, 0.0), bottom=(0.0, -10.0, 0.0))):
        td = tl.make_text_layer_data("WAVEFORM", 30, 100, size=20)
        td.blocks[0].warp = warp
        out = td.rasterize(300, 200)
        assert visible(out) > 0
        assert not np.array_equal(out, base), type(warp).__name__


def test_effects_outline_and_shadow():
    td = tl.make_text_layer_data("FX", 40, 40, size=40, color=(255, 255, 255, 255))
    plain = td.rasterize(160, 120)
    td2 = tl.make_text_layer_data("FX", 40, 40, size=40, color=(255, 255, 255, 255))
    td2.effects.outline = tl.OutlineEffect(color=(255, 0, 0, 255), width=2.0)
    td2.effects.shadow = tl.ShadowEffect(offset_x=4, offset_y=4, blur_radius=2.0)
    fx = td2.rasterize(160, 120)
    assert visible(fx) > visible(plain)


def test_canvas_text_layer_rasterizes_on_composite():
    c = Canvas.new(120, 60, background=(255, 255, 255, 255))
    layer = Layer.new("text", 120, 60)
    layer.content = "text"
    layer.text_data = tl.make_text_layer_data("Hi", 10, 10, size=30)
    c.layers.append(layer)
    tl.ensure_text_layers_rasterized(c)
    out = c.composite()
    assert (out[..., 0] < 250).any()  # dark text over white


def test_text_shadow_alpha_applied_once():
    """render_shadow (text_layer/effects.rs:220-300) applies the shadow
    color's alpha exactly once; the old path passed it both as opacity and
    in the color -> (sa/255)^2 darkening."""
    from paintfe_tpu.ops.text_layer import ShadowEffect, TextEffects, _apply_effects

    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[8:40, 8:40] = [200, 10, 10, 255]  # opaque block
    eff = TextEffects(shadow=ShadowEffect(color=(0, 0, 0, 160), offset_x=12.0,
                                          offset_y=12.0, blur_radius=0.0))
    out = _apply_effects(rgba, eff)
    # a shadow-only pixel (offset region beyond the block) carries alpha
    # exactly sa=160, not round(160^2/255)=100
    assert out[45, 45, 3] == 160
    np.testing.assert_array_equal(out[45, 45, :3], [0, 0, 0])
    # the text itself is untouched on top
    np.testing.assert_array_equal(out[20, 20], [200, 10, 10, 255])


def test_text_shadow_spread_radius_honored():
    """spread dilates the shadow by ITS radius (disc), not by the blur."""
    from paintfe_tpu.ops.text_layer import ShadowEffect, TextEffects, _apply_effects

    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[20:30, 20:30] = [0, 0, 0, 255]
    base = TextEffects(shadow=ShadowEffect(color=(0, 0, 0, 255), offset_x=0.0,
                                           offset_y=0.0, blur_radius=0.0,
                                           spread=0.0))
    spread = TextEffects(shadow=ShadowEffect(color=(0, 0, 0, 255), offset_x=0.0,
                                             offset_y=0.0, blur_radius=0.0,
                                             spread=5.0))
    out0 = _apply_effects(rgba.copy(), base)
    out5 = _apply_effects(rgba.copy(), spread)
    assert out0[25, 15, 3] == 0          # no spread: 5px out stays clear
    assert out5[25, 15, 3] == 255        # spread 5: dilated (disc reaches)
    assert out5[16, 16, 3] == 0          # diagonal ~5.7px: outside the disc


def test_envelope_warp_default_is_not_a_noop():
    """The default symmetric envelope (top -20, bottom +20) used to cancel
    exactly (frac hardcoded 0.5) so the warp did nothing."""
    from paintfe_tpu.ops.text_layer import (
        EnvelopeWarp, TextBlock, TextLayerData, TextRun, TextStyle)

    def raster(warp):
        td = TextLayerData()
        td.add_block(TextBlock(
            position=(4.0, 30.0),
            runs=[TextRun(text="WAVE", style=TextStyle(font_size=20.0,
                                                       color=(0, 0, 0, 255)))],
            warp=warp))
        return td.rasterize(120, 80)

    flat = raster(None)
    warped = raster(EnvelopeWarp())  # defaults top=(0,-20,0) bottom=(0,20,0)
    assert (flat[..., 3] > 0).any() and (warped[..., 3] > 0).any()
    assert (flat != warped).any(), "default envelope warp was a no-op"
