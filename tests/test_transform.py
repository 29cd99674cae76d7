"""Geometric transforms vs reference goldens (mirror of visual_transforms.rs
+ transform_ops.rs)."""

import numpy as np

from paintfe_tpu.core import fixtures
from paintfe_tpu.ops import transform as tf

from common import assert_golden


def img_64x48():
    return fixtures.test_gradient(64, 48)


def gradient_32():
    # transform_ops.rs:25-33: r = x*8 (u8 wrap), g = y*8, b = 128, a = 255
    x = (np.arange(32, dtype=np.uint32) * 8 % 256).astype(np.uint8)
    img = np.empty((32, 32, 4), np.uint8)
    img[..., 0] = x[None, :]
    img[..., 1] = x[:, None]
    img[..., 2] = 128
    img[..., 3] = 255
    return img


# -- flips / rotates ---------------------------------------------------------


def test_flip_canvas_h():
    assert_golden("transforms", "flip_canvas_h", tf.flip_horizontal(img_64x48()))


def test_flip_canvas_v():
    assert_golden("transforms", "flip_canvas_v", tf.flip_vertical(img_64x48()))


def test_flip_roundtrip():
    img = img_64x48()
    np.testing.assert_array_equal(tf.flip_horizontal(tf.flip_horizontal(img)), img)
    np.testing.assert_array_equal(tf.flip_vertical(tf.flip_vertical(img)), img)


def test_rotate_90cw():
    out = tf.rotate_90cw(img_64x48())
    assert out.shape[:2] == (64, 48)
    assert_golden("transforms", "rotate_90cw", out)


def test_rotate_90ccw():
    out = tf.rotate_90ccw(img_64x48())
    assert out.shape[:2] == (64, 48)
    assert_golden("transforms", "rotate_90ccw", out)


def test_rotate_180():
    assert_golden("transforms", "rotate_180", tf.rotate_180(img_64x48()))


def test_rotate_identities():
    img = img_64x48()
    out = img
    for _ in range(4):
        out = tf.rotate_90cw(out)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(tf.rotate_90ccw(tf.rotate_90cw(img)), img)
    np.testing.assert_array_equal(tf.rotate_180(tf.rotate_180(img)), img)


def test_flip_layer():
    assert_golden("transforms", "flip_layer_h", tf.flip_horizontal(img_64x48()))
    assert_golden("transforms", "flip_layer_v", tf.flip_vertical(img_64x48()))


# -- resize ------------------------------------------------------------------


def test_resize_2x_nearest():
    assert_golden("transforms", "resize_2x_nearest", tf.resize(img_64x48(), 128, 96, "nearest"))


def test_resize_half_bilinear():
    assert_golden("transforms", "resize_half_bilinear", tf.resize(img_64x48(), 32, 24, "bilinear"))


def test_resize_half_lanczos():
    assert_golden("transforms", "resize_half_lanczos", tf.resize(img_64x48(), 32, 24, "lanczos3"))


def test_resize_canvas_center():
    out = tf.resize_canvas(img_64x48(), 96, 80, (1, 1), (0, 0, 0, 0))
    assert_golden("transforms", "resize_canvas_center", out)


def test_resize_canvas_topleft():
    out = tf.resize_canvas(img_64x48(), 80, 64, (0, 0), (255, 0, 0, 255))
    assert_golden("transforms", "resize_canvas_topleft", out)


def test_flatten_single():
    from paintfe_tpu.core.canvas import Canvas

    canvas = Canvas.from_image(img_64x48())
    assert_golden("transforms", "flatten_single", canvas.composite())


# -- affine ------------------------------------------------------------------


def test_affine_rotate_45():
    # visual_transforms.rs passes 45deg *in radians* into the degrees
    # parameter — replicate the quirk for golden parity.
    rot = float(np.float32(45.0) * (np.float32(np.pi) / np.float32(180.0)))
    out = tf.apply_affine(img_64x48(), rotation_z=rot)
    assert_golden("transforms", "affine_rotate_45", out)


def test_affine_rotate_90():
    rot = float(np.float32(np.pi / 2))  # FRAC_PI_2 passed as "degrees"
    out = tf.apply_affine(fixtures.test_gradient(32, 32), rotation_z=rot)
    # 2/1024 edge pixels differ by 1 from a trig-chain f32 ulp cascade;
    # tolerance knob mirrors the reference harness (GOLDEN_TOLERANCE).
    assert_golden("transform", "affine_rotate_90", out, tolerance=1)


def test_affine_scale_half():
    out = tf.apply_affine(fixtures.test_gradient(32, 32), scale=0.5)
    assert_golden("transform", "affine_scale_half", out)


def test_affine_identity():
    img = img_64x48()
    out = np.asarray(tf.apply_affine(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


# -- displacement field ------------------------------------------------------


def test_displacement_identity():
    src = gradient_32()
    field = tf.DisplacementField(32, 32)
    np.testing.assert_array_equal(np.asarray(tf.warp_displacement(src, field)), src)


def test_displacement_translate():
    src = gradient_32()
    field = tf.DisplacementField(32, 32)
    field.data[..., 0] += 5.0
    out = np.asarray(tf.warp_displacement(src, field))
    np.testing.assert_array_equal(out[16, 10], src[16, 5])


def test_displacement_radial_push():
    src = gradient_32()
    field = tf.DisplacementField(32, 32)
    field.apply_push(16.0, 16.0, 3.0, 0.0, 10.0, 0.8)
    assert_golden("transform", "displacement_radial_push", tf.warp_displacement(src, field))


def test_displacement_swirl():
    src = gradient_32()
    field = tf.DisplacementField(32, 32)
    f = np.float32
    xs = np.arange(32, dtype=f) - f(16.0)
    ys = np.arange(32, dtype=f) - f(16.0)
    dx = xs[None, :] * np.ones((32, 1), f)
    dy = ys[:, None] * np.ones((1, 32), f)
    r = np.maximum(np.sqrt(dx * dx + dy * dy, dtype=f), f(0.001))
    strength = np.maximum(f(1.0) - r / f(16.0), f(0.0))
    field.data[..., 0] = -dy * strength * f(0.5)
    field.data[..., 1] = dx * strength * f(0.5)
    assert_golden("transform", "displacement_swirl", tf.warp_displacement(src, field))


# -- Catmull-Rom mesh warp ---------------------------------------------------


def test_catmull_rom_weights_endpoints():
    w0 = [float(np.asarray(v)) for v in tf.catmull_rom_weights(0.0)]
    assert np.allclose(w0, [0.0, 1.0, 0.0, 0.0], atol=1e-6)
    w1 = [float(np.asarray(v)) for v in tf.catmull_rom_weights(1.0)]
    assert np.allclose(w1, [0.0, 0.0, 1.0, 0.0], atol=1e-6)


def test_catmull_rom_partition_of_unity():
    for t in np.linspace(0.0, 1.0, 11):
        ws = [float(np.asarray(v)) for v in tf.catmull_rom_weights(float(t))]
        assert abs(sum(ws) - 1.0) < 1e-5


def test_mesh_warp_identity():
    src = gradient_32()
    grid = tf.uniform_grid(2, 2, 32.0, 32.0)
    out = np.asarray(tf.warp_mesh_catmull_rom(src, grid, grid, 2, 2))
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 2


def test_mesh_identity_displacement_near_zero():
    grid = tf.uniform_grid(2, 2, 32.0, 32.0)
    disp = tf.generate_displacement_from_mesh(grid, grid, 2, 2, 32, 32)
    assert np.abs(disp).max() < 1.0


def test_mesh_fast_matches_full():
    grid = tf.uniform_grid(2, 2, 32.0, 32.0)
    deformed = grid.copy()
    deformed[4] = [20.0, 20.0]
    full = tf.generate_displacement_from_mesh(grid, deformed, 2, 2, 32, 32)
    fast = tf.generate_displacement_from_mesh(grid, deformed, 2, 2, 32, 32, fast=True)
    assert np.abs(full - fast).max() < 2.0


def test_mesh_warp_deformed():
    src = gradient_32()
    grid = tf.uniform_grid(2, 2, 32.0, 32.0)
    deformed = grid.copy()
    deformed[4] = [20.0, 20.0]
    out = tf.warp_mesh_catmull_rom(src, grid, deformed, 2, 2)
    assert_golden("transform", "mesh_warp_deformed", out)
