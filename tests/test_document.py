"""Document-model tests: layer ops, selection, history, clipboard, color
removal (mirror of layer_ops.rs + selection.rs)."""

import os

import numpy as np

from paintfe_tpu.core import fixtures, selection as sel
from paintfe_tpu.core.blend import BlendMode
from paintfe_tpu.core.canvas import Canvas, Layer, LayerFolder
from paintfe_tpu.core.history import (
    HistoryManager,
    LayerOpCommand,
    PixelPatch,
    SingleLayerSnapshotCommand,
    SnapshotCommand,
)
from paintfe_tpu.ops import canvas_ops as co
from paintfe_tpu.ops.clipboard import Clipboard
from paintfe_tpu.ops.color_removal import ColorToAlphaSettings, color_to_alpha, flood_select


def canvas64():
    return Canvas.from_image(fixtures.test_gradient(64, 64))


# -- layer ops -----------------------------------------------------------


def test_add_layer_creates_transparent():
    c = canvas64()
    idx = co.add_layer(c)
    assert idx == 1 and len(c.layers) == 2
    assert (c.layers[1].pixels == 0).all()
    assert c.active_layer_index == 1


def test_delete_layer():
    c = canvas64()
    co.add_layer(c)
    co.delete_layer(c)
    assert len(c.layers) == 1
    assert c.active_layer_index == 0


def test_duplicate_layer_copies_pixels():
    c = canvas64()
    idx = co.duplicate_layer(c)
    assert idx == 1
    np.testing.assert_array_equal(c.layers[0].pixels, c.layers[1].pixels)
    c.layers[1].pixels[0, 0] = [1, 2, 3, 4]
    assert not np.array_equal(c.layers[0].pixels[0, 0], c.layers[1].pixels[0, 0])


def test_hidden_layer_not_composited():
    c = canvas64()
    top = Layer(name="red", pixels=fixtures.solid(64, 64, (255, 0, 0, 255)))
    top.visible = False
    c.layers.append(top)
    np.testing.assert_array_equal(c.composite(), fixtures.test_gradient(64, 64))


def test_hidden_folder_hides_members():
    c = canvas64()
    top = Layer(name="red", pixels=fixtures.solid(64, 64, (255, 0, 0, 255)))
    top.folder_id = 7
    c.folders.append(LayerFolder(id=7, name="f", visible=False))
    c.layers.append(top)
    np.testing.assert_array_equal(c.composite(), fixtures.test_gradient(64, 64))


def test_merge_down_equals_composite():
    c = canvas64()
    top = Layer(name="fg", pixels=fixtures.blend_test_foreground(64, 64))
    top.blend_mode = BlendMode.MULTIPLY
    top.opacity = 0.7
    c.layers.append(top)
    expected = c.composite()
    co.merge_down(c, 1)
    assert len(c.layers) == 1
    np.testing.assert_array_equal(c.composite(), expected)


def test_merge_down_as_mask():
    c = Canvas.from_image(fixtures.solid(16, 16, (100, 150, 200, 255)))
    # black opaque mask on the left half -> erases; transparent right half -> keeps
    mask_px = np.zeros((16, 16, 4), np.uint8)
    mask_px[:, :8] = [0, 0, 0, 255]
    c.layers.append(Layer(name="mask", pixels=mask_px))
    co.merge_down_as_mask(c, 1)
    assert len(c.layers) == 1
    assert (c.layers[0].pixels[:, :8, 3] == 0).all()
    assert (c.layers[0].pixels[:, 8:, 3] == 255).all()


def test_channel_extract_and_replace():
    c = canvas64()
    co.extract_channel_to_layer(c, 0, co.ImageChannel.RED)
    assert len(c.layers) == 2
    np.testing.assert_array_equal(c.layers[1].pixels[..., 0], c.layers[0].pixels[..., 0])
    assert (c.layers[1].pixels[..., 3] == 255).all()
    co.replace_channel_from_layer(c, 0, 1, co.ImageChannel.ALPHA, co.ImageChannel.RED)
    np.testing.assert_array_equal(c.layers[0].pixels[..., 3], c.layers[1].pixels[..., 0])


def test_layer_mask_lifecycle():
    c = canvas64()
    c.selection = sel.rect_mask(64, 64, 0, 0, 31, 63)
    co.add_layer_mask_from_selection(c, 0)
    layer = c.layers[0]
    assert layer.mask is not None
    assert (layer.mask[:, :32] == 0).all()  # selected -> reveal
    assert (layer.mask[:, 32:] == 255).all()  # unselected -> conceal
    co.invert_layer_mask(c, 0)
    assert (layer.mask[:, :32] == 255).all()
    co.apply_layer_mask(c, 0)
    assert layer.mask is None
    assert (layer.pixels[:, :32, 3] == 0).all()
    assert (layer.pixels[:, 32:, 3] == 255).all()


# -- selection ------------------------------------------------------------


def test_selection_modes():
    a = sel.rect_mask(8, 8, 0, 0, 3, 7)
    b = sel.rect_mask(8, 8, 2, 0, 5, 7)
    add = sel.combine(a, b, sel.SelectionMode.ADD, 8, 8)
    assert (add[:, 0:6] == 255).all() and (add[:, 6:] == 0).all()
    subtract = sel.combine(a, b, sel.SelectionMode.SUBTRACT, 8, 8)
    assert (subtract[:, 0:2] == 255).all() and (subtract[:, 2:] == 0).all()
    inter = sel.combine(a, b, sel.SelectionMode.INTERSECT, 8, 8)
    assert (inter[:, 2:4] == 255).all()
    assert (inter[:, :2] == 0).all() and (inter[:, 4:] == 0).all()


def test_ellipse_selection():
    m = sel.ellipse_mask(32, 32, 16.0, 16.0, 8.0, 8.0)
    assert m[16, 16] == 255
    assert m[16, 9] == 255  # dx=-7 inside
    assert m[0, 0] == 0


def test_translate_clips():
    m = sel.rect_mask(16, 16, 0, 0, 3, 3)
    t = sel.translate(m, 14, 0)
    assert (t[0:4, 14:16] == 255).all()
    assert t.sum() == 255 * 2 * 4


def test_feather_expand_contract():
    m = sel.rect_mask(32, 32, 8, 8, 23, 23)
    f = sel.feather(m, 4.0)
    assert 0 < f[7, 7] < 255  # soft edge
    e = sel.expand(m, 3)
    assert e[6, 16] == 255
    con = sel.contract(m, 3)
    assert con[9, 16] == 0 and con[16, 16] == 255


def test_select_color_range():
    img = fixtures.color_bands(64, 64)
    mask = sel.select_color_range(img, 0.0, 30.0, 0.2, 0.5)
    # red band selected, green band not
    assert mask[:, 2].max() > 0
    assert (mask[:, 10] == 0).all()


# -- history ----------------------------------------------------------------


def test_pixel_patch_undo_redo():
    c = canvas64()
    before = c.layers[0].pixels.copy()
    c.layers[0].pixels[10:20, 10:20] = [255, 0, 0, 255]
    after = c.layers[0].pixels.copy()
    patch = PixelPatch("stroke", 0, before, after)
    assert patch.memory_bytes() > 0
    h = HistoryManager()
    h.push(patch)
    h.undo(c)
    np.testing.assert_array_equal(c.layers[0].pixels, before)
    h.redo(c)
    np.testing.assert_array_equal(c.layers[0].pixels, after)


def test_pixel_patch_stores_only_changed_tiles():
    before = np.zeros((256, 256, 4), np.uint8)
    after = before.copy()
    after[0:8, 0:8] = 255  # one tile touched
    patch = PixelPatch("dab", 0, before, after)
    assert len(patch.tiles) == 1
    # 2 x 64x64x4 tiles = 32 KB, far less than 2 x 256 KB full frames
    assert patch.memory_bytes() == 2 * 64 * 64 * 4


def test_layer_op_undo_redo():
    c = canvas64()
    prev_active = c.active_layer_index
    idx = co.add_layer(c)
    cmd = LayerOpCommand("add layer", "add", idx, c.layers[idx], prev_active, idx)
    h = HistoryManager()
    h.push(cmd)
    h.undo(c)
    assert len(c.layers) == 1 and c.active_layer_index == 0
    h.redo(c)
    assert len(c.layers) == 2 and c.active_layer_index == 1


def test_snapshot_undo_restores_folders():
    c = canvas64()
    snap = SnapshotCommand("structure", c)
    c.folders.append(LayerFolder(id=1, name="f"))
    c.layers[0].folder_id = 1
    snap.finalize(c)
    h = HistoryManager()
    h.push(snap)
    h.undo(c)
    assert not c.folders and c.layers[0].folder_id is None
    h.redo(c)
    assert c.folders and c.layers[0].folder_id == 1


def test_history_memory_trim():
    c = Canvas.from_image(fixtures.solid(64, 64, (1, 2, 3, 255)))
    h = HistoryManager(memory_limit_bytes=100_000)
    for i in range(10):
        before = c.layers[0].pixels.copy()
        c.layers[0].pixels[:, :] = [i, i, i, 255]
        h.push(SingleLayerSnapshotCommand(f"fill {i}", 0, before, c.layers[0].pixels))
    assert h.memory_bytes() <= 100_000 or len(h.undo_stack) == 1


# -- clipboard ----------------------------------------------------------------


def test_clipboard_copy_paste():
    c = canvas64()
    c.selection = sel.rect_mask(64, 64, 10, 10, 19, 19)
    clip = Clipboard()
    clip.copy(c)
    assert clip.image.shape == (10, 10, 4)
    idx = clip.paste_as_layer(c)
    assert idx == 1
    np.testing.assert_array_equal(
        c.layers[1].pixels[10:20, 10:20], c.layers[0].pixels[10:20, 10:20]
    )
    assert (c.layers[1].pixels[0:10] == 0).all()


def test_clipboard_cut_deletes():
    c = canvas64()
    c.selection = sel.rect_mask(64, 64, 0, 0, 7, 7)
    clip = Clipboard()
    clip.cut(c)
    assert (c.layers[0].pixels[0:8, 0:8] == 0).all()
    assert (c.layers[0].pixels[10:, 10:, 3] == 255).all()


# -- color removal --------------------------------------------------------------


def test_color_to_alpha_removes_target():
    img = fixtures.solid(16, 16, (255, 0, 0, 255))
    out = color_to_alpha(img, ColorToAlphaSettings(target=(255, 0, 0)))
    assert (out[..., 3] == 0).all()


def test_color_to_alpha_keeps_distant_colors():
    img = fixtures.solid(16, 16, (0, 0, 255, 255))
    out = color_to_alpha(img, ColorToAlphaSettings(target=(255, 0, 0)))
    np.testing.assert_array_equal(out, img)


def test_flood_select():
    img = np.zeros((16, 16, 4), np.uint8)
    img[...] = [10, 10, 10, 255]
    img[4:8, 4:8] = [200, 0, 0, 255]
    m = flood_select(img, 5, 5, 10.0)
    assert (m[4:8, 4:8] == 255).all()
    assert m.sum() == 255 * 16


# -- preview layer ------------------------------------------------------------


def test_preview_inherits_layer_blend():
    c = Canvas.from_image(fixtures.test_checkerboard(16, 16))
    top = Layer(name="t", pixels=fixtures.solid(16, 16, (0, 0, 0, 0)))
    top.blend_mode = BlendMode.MULTIPLY
    c.layers.append(top)
    c.active_layer_index = 1
    preview = np.zeros((16, 16, 4), np.uint8)
    preview[4:8, 4:8] = [128, 128, 128, 255]
    c.preview = preview
    out = c.composite()
    # multiply 128/255 over white checker cell -> 128
    assert out[4, 4, 0] == 128
    # outside the preview: base unchanged
    np.testing.assert_array_equal(out[0, 0, :3], [255, 255, 255])
    c.preview = None
    np.testing.assert_array_equal(c.composite(), fixtures.test_checkerboard(16, 16))


def test_preview_eraser_reduces_alpha():
    c = Canvas.from_image(fixtures.solid(8, 8, (10, 20, 30, 255)))
    preview = np.zeros((8, 8, 4), np.uint8)
    preview[2:4, 2:4, 3] = 255
    c.preview = preview
    c.preview_is_eraser = True
    out = c.composite()
    assert out[2, 2, 3] == 0
    assert out[0, 0, 3] == 255


def test_preview_replaces_layer():
    c = Canvas.from_image(fixtures.solid(8, 8, (1, 2, 3, 255)))
    c.preview = fixtures.solid(8, 8, (9, 9, 9, 255))
    c.preview_replaces_layer = True
    out = c.composite()
    np.testing.assert_array_equal(out[0, 0], [9, 9, 9, 255])
    np.testing.assert_array_equal(c.layers[0].pixels[0, 0], [1, 2, 3, 255])


# -- layer alignment (transform.rs:648-745) ------------------------------------


def test_align_layer_to_anchor():
    from paintfe_tpu.ops.canvas_ops import align_layer_to_anchor

    c = Canvas.new(32, 24)
    px = np.zeros((24, 32, 4), np.uint8)
    px[10:14, 5:9] = [255, 0, 0, 255]  # 4x4 red square at (5,10)
    c.layers[0].pixels = px
    assert align_layer_to_anchor(c, 0, (2, 2))  # bottom-right
    out = np.asarray(c.layers[0].pixels)
    assert (out[20:24, 28:32] == [255, 0, 0, 255]).all()
    assert out[10, 5, 3] == 0  # moved away
    assert align_layer_to_anchor(c, 0, (1, 1))  # center
    out = np.asarray(c.layers[0].pixels)
    assert out[11, 15, 3] == 255  # ((24-4)//2, (32-4)//2) = (10..14, 14..18)
    # empty layer: no-op
    c2 = Canvas.new(8, 8)
    assert not align_layer_to_anchor(c2, 0, (0, 0))


def test_translate_image_clipped():
    from paintfe_tpu.ops.canvas_ops import translate_image_clipped

    img = np.zeros((4, 4, 4), np.uint8)
    img[0, 0] = [9, 9, 9, 255]
    out = translate_image_clipped(img, 2, 1)
    assert (out[1, 2] == [9, 9, 9, 255]).all() and out[0, 0, 3] == 0
    gone = translate_image_clipped(img, -1, 0)
    assert (gone[..., 3] == 0).all()


def test_composite_dirty_rect_matches_full():
    import jax

    from paintfe_tpu.core.device import DeviceLayerCache, composite_device, composite_dirty_rect

    rng = np.random.default_rng(9)
    c = Canvas.new(96, 80)
    c.layers = []
    for i in range(3):
        layer = Layer.new(f"L{i}", 96, 80)
        layer.pixels = rng.integers(0, 256, (80, 96, 4), np.uint8)
        layer.opacity = [1.0, 0.7, 0.5][i]
        layer.blend_mode = BlendMode(i * 5)
        c.layers.append(layer)
    cache = DeviceLayerCache()
    full = composite_device(c, cache)

    # edit a region of the middle layer, then dirty-update
    px = np.asarray(c.layers[1].pixels).copy()
    px[20:33, 40:57] = rng.integers(0, 256, (13, 17, 4), np.uint8)
    c.layers[1].pixels = px  # new object -> cache re-uploads on demand
    updated = composite_dirty_rect(c, cache, full, (40, 20, 56, 32))
    expected = composite_device(c, cache)
    np.testing.assert_array_equal(np.asarray(updated), np.asarray(expected))
    # degenerate rect is a no-op
    same = composite_dirty_rect(c, cache, updated, (50, 50, 10, 10))
    np.testing.assert_array_equal(np.asarray(same), np.asarray(updated))


def _full_feature_canvas(rng):
    """Canvas exercising every composite feature: conceal masks, an
    adjustment layer mid-stack, a brush preview on the active layer, and a
    fully-transparent 64px tile (the adjustment active-tile discipline)."""
    from paintfe_tpu.core import deep

    c = Canvas.new(128, 128)
    c.layers = []
    base = Layer.new("base", 128, 128)
    base.pixels = rng.integers(0, 256, (128, 128, 4), np.uint8)
    base.pixels[64:, 64:] = 0  # one transparent 64x64 tile in every layer
    c.layers.append(base)

    masked = Layer.new("masked", 128, 128)
    masked.pixels = rng.integers(0, 256, (128, 128, 4), np.uint8)
    masked.pixels[64:, 64:] = 0
    masked.opacity = 0.8
    masked.blend_mode = BlendMode.MULTIPLY
    masked.mask = rng.integers(0, 256, (128, 128), np.uint8)
    c.layers.append(masked)

    adj = Layer.new("invert", 128, 128)
    adj.content = "adjustment"
    adj.adjustment = deep.AdjustmentLayerData(kind=deep.AdjustmentKind.INVERT)
    adj.opacity = 0.6
    c.layers.append(adj)

    top = Layer.new("top", 128, 128)
    top.pixels = rng.integers(0, 256, (128, 128, 4), np.uint8)
    top.pixels[64:, 64:] = 0
    c.layers.append(top)

    c.active_layer_index = 3
    pv = np.zeros((128, 128, 4), np.uint8)
    pv[10:40, 10:40] = rng.integers(0, 256, (30, 30, 4), np.uint8)
    c.preview = pv
    return c


def test_composite_device_full_feature_parity():
    """Device composite must be bit-equal to Canvas.composite with masks,
    preview, and adjustment layers in play (round-4 review finding: the
    device path used to drop all three)."""
    from paintfe_tpu.core.device import DeviceLayerCache, composite_device

    rng = np.random.default_rng(41)
    c = _full_feature_canvas(rng)
    cache = DeviceLayerCache()
    dev = composite_device(c, cache)
    host = c.composite()
    np.testing.assert_array_equal(np.asarray(dev), host)
    # the transparent tile stays (0,0,0,0) despite the invert adjustment
    assert (np.asarray(dev)[70:128, 70:128] == 0).all()


def test_composite_dirty_rect_full_feature_parity():
    from paintfe_tpu.core.device import (
        DeviceLayerCache, composite_device, composite_dirty_rect)

    rng = np.random.default_rng(43)
    c = _full_feature_canvas(rng)
    cache = DeviceLayerCache()
    full = composite_device(c, cache)

    # edit a window of the masked layer (crossing the transparent tile)
    px = c.layers[1].pixels.copy()
    px[30:90, 50:110] = rng.integers(0, 256, (60, 60, 4), np.uint8)
    px[64:, 64:] = 0
    c.layers[1].pixels = px
    updated = composite_dirty_rect(c, cache, full, (50, 30, 109, 89))
    expected = composite_device(c, cache)
    np.testing.assert_array_equal(np.asarray(updated), np.asarray(expected))

    # move the preview: the dirty path must pre-blend the window slices
    pv = np.zeros((128, 128, 4), np.uint8)
    pv[60:100, 20:60] = rng.integers(0, 256, (40, 40, 4), np.uint8)
    c.preview = pv
    updated2 = composite_dirty_rect(c, cache, updated, (10, 10, 109, 109))
    expected2 = composite_device(c, cache)
    np.testing.assert_array_equal(np.asarray(updated2), np.asarray(expected2))


def test_os_clipboard_bridge_roundtrip(tmp_path, monkeypatch):
    """Plumbing test with stub wl-copy/wl-paste tools backed by a file."""
    from paintfe_tpu.ops import clipboard as cb

    store = tmp_path / "clip.bin"
    wl_copy = tmp_path / "wl-copy"
    wl_copy.write_text(f"#!/bin/sh\ncat > '{store}'\n")
    wl_copy.chmod(0o755)
    wl_paste = tmp_path / "wl-paste"
    wl_paste.write_text(f"#!/bin/sh\ncat '{store}'\n")
    wl_paste.chmod(0o755)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    assert cb.os_clipboard_available()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 13, 4), np.uint8)
    clip = Clipboard()
    clip.image = img.copy()
    assert clip.copy_to_os()

    other = Clipboard()
    assert other.paste_from_os()
    assert np.array_equal(other.image, img)


def test_os_clipboard_bridge_unavailable(tmp_path, monkeypatch):
    from paintfe_tpu.ops import clipboard as cb

    monkeypatch.setenv("PATH", str(tmp_path))  # empty dir: no tools
    assert not cb.os_clipboard_available()
    assert cb.os_paste_image() is None
    clip = Clipboard()
    clip.image = np.zeros((4, 4, 4), np.uint8)
    assert not clip.copy_to_os()


def test_clipboard_empty_selection_keeps_content():
    """copy with an all-zero selection returns without clobbering the
    clipboard (clipboard.rs:660-662)."""
    c = canvas64()
    cb = Clipboard()
    cb.copy(c)
    assert cb.image is not None
    c.selection = np.zeros((64, 64), np.uint8)  # nothing selected
    cb.copy(c)
    assert cb.image is not None  # previous content intact


def test_align_center_truncates_like_rust():
    """Centering content LARGER than the target bounds by an odd amount:
    Rust i32 (-3)/2 = -1 (trunc) vs Python (-3)//2 = -2 (floor)."""
    c = Canvas.new(10, 10)
    c.layers = [Layer.new("L", 10, 10)]
    c.layers[0].pixels[2:5, 0:10] = [9, 9, 9, 255]  # content bbox 10 wide
    co.align_layer_to_anchor(c, 0, anchor=(1, 1), target_bounds=(2, 2, 8, 8))
    # tw=7, bw=10 -> offset trunc((7-10)/2) = -1: content min lands at x=1
    out = c.layers[0].pixels
    cols = np.where((out[..., 3] > 0).any(axis=0))[0]
    assert cols.min() == 1, cols


def test_contract_erodes_nonzero_with_zero_neighbor():
    """contract (adjustments.rs:1546-1586): any NONZERO pixel with a ==0
    pixel in its disc erodes; partial values never count as unselected."""
    m = np.full((9, 9), 255, np.uint8)
    m[4, 4] = 100  # partial, NOT zero: must not erode neighbors
    out = sel.contract(m, 1)
    np.testing.assert_array_equal(out, m)  # no zeros anywhere -> unchanged
    m2 = np.full((9, 9), 255, np.uint8)
    m2[4, 4] = 0
    m2[2, 2] = 80  # feathered pixel adjacent to nothing zero
    out2 = sel.contract(m2, 1)
    assert out2[4, 3] == 0 and out2[3, 4] == 0  # neighbors of the hole erode
    assert out2[2, 2] == 80                     # feathered value survives
    m3 = np.zeros((9, 9), np.uint8)
    m3[4, 4] = 60
    m3[4, 5] = 0
    assert sel.contract(m3, 1)[4, 4] == 0       # feathered + zero neighbor


def test_fill_delete_blend_on_partial_selection():
    """Feathered selections blend (canvas_state_impl.rs:1515-1578):
    fill lerps old->color by sel/255; delete keeps RGB, scales alpha."""
    px = np.full((4, 4, 4), 200, np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    mask[0, 0] = 255
    mask[1, 1] = 128
    filled = sel.fill_selected(px, mask, (0, 0, 0, 255))
    np.testing.assert_array_equal(filled[0, 0], [0, 0, 0, 255])
    # 200*(1-128/255) + 0*t = 99.6 -> 100; alpha 200*(127/255)+255*t -> 228
    np.testing.assert_array_equal(filled[1, 1, :3], [100, 100, 100])
    assert filled[1, 1, 3] == 228
    np.testing.assert_array_equal(filled[2, 2], px[2, 2])
    deleted = sel.delete_selected(px, mask)
    np.testing.assert_array_equal(deleted[0, 0], [0, 0, 0, 0])
    np.testing.assert_array_equal(deleted[1, 1, :3], [200, 200, 200])  # RGB kept
    assert deleted[1, 1, 3] == 100  # round(200 * 127/255)


def test_liquify_brush_offcanvas_is_noop():
    """A liquify drag leaving the canvas must be an empty window, not a
    wrapped negative slice crash (transform.rs:1063-1081 loops are empty)."""
    from paintfe_tpu.ops.transform import DisplacementField

    fld = DisplacementField(100, 100)
    fld.apply_push(-50.0, 50.0, 1.0, 0.0, 10.0, 1.0)  # used to raise
    fld.apply_twirl(50.0, -50.0, 10.0, 1.0)
    assert (fld.data == 0).all()


def test_rotate_arbitrary_rotates_masks_too():
    from paintfe_tpu.ops import canvas_transform as ct

    c = Canvas.new(32, 32, background=(50, 50, 50, 255))
    c.layers[0].mask = np.zeros((32, 32), np.uint8)
    c.layers[0].mask[:, :16] = 255  # conceal left half
    ct.rotate_canvas_arbitrary(c, 90.0)
    m = c.layers[0].mask
    # after ~90° the concealed half is horizontal, not vertical
    assert (m[:14, 8:24] > 200).mean() > 0.9 or (m[18:, 8:24] > 200).mean() > 0.9
    assert abs(float((m > 127).mean()) - 0.5) < 0.1
