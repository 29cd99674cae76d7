"""CLI + IO round-trip tests (mirror of io_roundtrip.rs + CLI semantics)."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

from paintfe_tpu import cli
from paintfe_tpu.core import fixtures
from paintfe_tpu.core.blend import BlendMode
from paintfe_tpu.core.canvas import Canvas, Layer
from paintfe_tpu.io import codecs, pfe

from common import assert_golden, load_png


def test_png_roundtrip(tmp_path):
    img = fixtures.test_gradient(64, 64)
    p = tmp_path / "x.png"
    codecs.save_image(img, p, "png")
    np.testing.assert_array_equal(codecs.load_image(p), img)


@pytest.mark.parametrize("fmt,tol", [("png", 0), ("bmp", 0), ("tga", 0),
                                     ("tiff", 0), ("webp", 0), ("jpeg", 26)])
def test_format_roundtrip(tmp_path, fmt, tol):
    img = fixtures.test_gradient(64, 64)
    p = tmp_path / f"x.{codecs.format_extension(fmt)}"
    codecs.save_image(img, p, fmt)
    back = codecs.load_image(p)
    if fmt in ("jpeg", "bmp"):
        img = img.copy()
        img[..., 3] = 255  # formats without alpha
    d = np.abs(back.astype(int) - img.astype(int))
    if fmt in ("jpeg", "bmp"):
        d = d[..., :3]
    assert d.max() <= tol


def test_tiff_compression_modes(tmp_path):
    img = fixtures.test_gradient(64, 64)
    for mode in ("none", "lzw", "deflate"):
        p = tmp_path / f"t_{mode}.tiff"
        codecs.save_image(img, p, "tiff", tiff_compression=mode)
        np.testing.assert_array_equal(codecs.load_image(p), img)


def test_animation_roundtrip(tmp_path):
    frames = [fixtures.solid(16, 16, (255, 0, 0, 255)),
              fixtures.solid(16, 16, (0, 255, 0, 255))]
    p = tmp_path / "anim.gif"
    codecs.save_animation(frames, p, "gif", fps=10)
    back, delays = codecs.load_frames(p)
    assert len(back) == 2
    assert codecs.detect_animation(p)
    assert delays[0] == 100  # 10 fps -> 10cs -> 100ms


def test_apng_animation(tmp_path):
    frames = [fixtures.solid(8, 8, (255, 0, 0, 255)),
              fixtures.solid(8, 8, (0, 0, 255, 255))]
    p = tmp_path / "anim.png"
    codecs.save_animation(frames, p, "apng", fps=5)
    back, _ = codecs.load_frames(p)
    assert len(back) == 2
    np.testing.assert_array_equal(back[1], frames[1])


def test_pfe_multilayer_roundtrip(tmp_path):
    canvas = Canvas.from_image(fixtures.test_checkerboard(70, 50))
    top = Layer(name="top", pixels=fixtures.blend_test_foreground(70, 50))
    top.blend_mode = BlendMode.MULTIPLY
    top.opacity = 0.7
    canvas.layers.append(top)
    p = tmp_path / "proj.pfe"
    pfe.save_pfe(canvas, str(p))
    back = pfe.load_pfe(str(p))
    assert back.width == 70 and back.height == 50
    assert len(back.layers) == 2
    assert back.layers[1].blend_mode == BlendMode.MULTIPLY
    assert abs(back.layers[1].opacity - 0.7) < 1e-6
    np.testing.assert_array_equal(back.layers[0].pixels, canvas.layers[0].pixels)
    np.testing.assert_array_equal(back.layers[1].pixels, canvas.layers[1].pixels)


def test_pfe_sparse_chunks(tmp_path):
    # fully-transparent tiles are not serialized and read back as zeros
    img = np.zeros((128, 128, 4), np.uint8)
    img[0:10, 0:10] = [255, 0, 0, 255]
    canvas = Canvas.from_image(img)
    p = tmp_path / "sparse.pfe"
    pfe.save_pfe(canvas, str(p))
    back = pfe.load_pfe(str(p))
    np.testing.assert_array_equal(back.layers[0].pixels, img)


# -- CLI ---------------------------------------------------------------------


def _write_png(tmp_path, name, img):
    p = tmp_path / name
    codecs.save_image(img, p, "png")
    return p


def test_cli_convert(tmp_path):
    src = _write_png(tmp_path, "in.png", fixtures.test_gradient(32, 32))
    out = tmp_path / "out.jpg"
    rc = cli.main(["-i", str(src), "-o", str(out)])
    assert rc == 0
    assert out.exists()


def test_cli_script_matches_goldens(tmp_path):
    """The SURVEY minimum end-to-end slice: desaturate + brightness_contrast
    via the CLI must match the scripting goldens."""
    src = _write_png(tmp_path, "in.png", fixtures.test_gradient(64, 64))
    script = tmp_path / "s.rhai"
    script.write_text("apply_desaturate();")
    out = tmp_path / "out.png"
    rc = cli.main(["-i", str(src), "-s", str(script), "-o", str(out)])
    assert rc == 0
    assert_golden("scripting", "apply_desaturate", load_png(out))

    script.write_text("apply_brightness_contrast(20.0, 10.0);")
    rc = cli.main(["-i", str(src), "-s", str(script), "-o", str(out)])
    assert rc == 0
    assert_golden("scripting", "apply_brightness_contrast", load_png(out))


def test_cli_batch_glob_keep_going(tmp_path):
    _write_png(tmp_path, "a.png", fixtures.test_gradient(16, 16))
    _write_png(tmp_path, "b.png", fixtures.test_gradient(16, 16))
    bad = tmp_path / "c.png"
    bad.write_bytes(b"not a png")
    outdir = tmp_path / "out"
    rc = cli.main(["-i", str(tmp_path / "*.png"), "--output-dir", str(outdir),
                   "-f", "png"])
    assert rc == 1  # keep-going, but exit 1 on any failure
    assert (outdir / "a.png").exists()
    assert (outdir / "b.png").exists()


def test_cli_multi_input_requires_output_dir(tmp_path):
    a = _write_png(tmp_path, "a.png", fixtures.test_gradient(8, 8))
    b = _write_png(tmp_path, "b.png", fixtures.test_gradient(8, 8))
    rc = cli.main(["-i", str(a), str(b), "-o", str(tmp_path / "x.png")])
    assert rc == 1


def test_cli_collision_safe_output(tmp_path):
    src = _write_png(tmp_path, "img.png", fixtures.test_gradient(8, 8))
    rc = cli.main(["-i", str(src), "-f", "png"])
    assert rc == 0
    assert (tmp_path / "img_out.png").exists()


def test_cli_canvas_op_resize(tmp_path):
    src = _write_png(tmp_path, "in.png", fixtures.test_gradient(64, 64))
    script = tmp_path / "s.rhai"
    script.write_text('resize_image(32, 32, "bilinear");')
    out = tmp_path / "out.png"
    rc = cli.main(["-i", str(src), "-s", str(script), "-o", str(out)])
    assert rc == 0
    assert load_png(out).shape == (32, 32, 4)


def test_cli_sharded_batch(tmp_path):
    for i in range(5):
        _write_png(tmp_path, f"img{i}.png", fixtures.test_gradient(32, 32))
    script = tmp_path / "s.rhai"
    script.write_text("apply_invert();\napply_brightness_contrast(10.0, 5.0);")
    outdir = tmp_path / "out"
    rc = cli.main(["-i", str(tmp_path / "img*.png"), "-s", str(script),
                   "--output-dir", str(outdir), "--shard", "-v"])
    assert rc == 0
    # sharded result must equal the per-image interpreter result
    outdir2 = tmp_path / "out2"
    rc = cli.main(["-i", str(tmp_path / "img*.png"), "-s", str(script),
                   "--output-dir", str(outdir2)])
    assert rc == 0
    for i in range(5):
        np.testing.assert_array_equal(
            load_png(outdir / f"img{i}.png"), load_png(outdir2 / f"img{i}.png")
        )


# -- native .pdn decoding (pdn.rs:40-160 reference expectations) ---------------

PDN_FIXTURE = pathlib.Path("/root/reference/tests/fixtures/pdn/layers-opacity-additive.pdn")


@pytest.mark.skipif(not PDN_FIXTURE.exists(), reason="reference pdn fixture not mounted")
def test_pdn_native_decode_matches_reference_expectations():
    from paintfe_tpu.core.blend import BlendMode
    from paintfe_tpu.io.pdn import load_pdn

    c = load_pdn(PDN_FIXTURE)
    # the reference's own fixture test (pdn.rs:212-233)
    assert (c.width, c.height) == (800, 600)
    assert len(c.layers) == 2
    assert c.layers[0].name == "Background" and c.layers[0].visible
    assert c.layers[0].opacity == 1.0
    assert c.layers[0].blend_mode == BlendMode.NORMAL
    assert c.layers[1].name == "Layer 2" and c.layers[1].visible
    assert abs(c.layers[1].opacity - 161.0 / 255.0) < 1e-7
    assert c.layers[1].blend_mode == BlendMode.ADDITIVE
    # pixel payload: red background, green additive layer (BGRA -> RGBA swap)
    np.testing.assert_array_equal(np.asarray(c.layers[0].pixels)[0, 0], [255, 0, 0, 255])
    np.testing.assert_array_equal(np.asarray(c.layers[1].pixels)[0, 0], [0, 255, 0, 255])


def test_pdn_malformed_rejected(tmp_path):
    from paintfe_tpu.io.pdn import PdnError, load_pdn

    bad = tmp_path / "bad.pdn"
    bad.write_bytes(b"not a Paint.NET project")
    with pytest.raises(PdnError):
        load_pdn(bad)


@pytest.mark.skipif(not PDN_FIXTURE.exists(), reason="reference pdn fixture not mounted")
def test_cli_pdn_input_flattens(tmp_path):
    from paintfe_tpu.cli import main
    from paintfe_tpu.io import codecs

    rc = main(["-i", str(PDN_FIXTURE), "-o", str(tmp_path / "out.png"), "-f", "png"])
    assert rc == 0
    img = codecs.load_image(tmp_path / "out.png")
    assert img.shape == (600, 800, 4)
    # red background + additive green at opacity 161 -> yellow-ish
    assert img[0, 0, 0] == 255 and img[0, 0, 1] > 100


def test_cli_profile_prints_stage_timers(tmp_path, capsys):
    from paintfe_tpu.cli import main
    from paintfe_tpu.io import codecs

    img = np.asarray(fixtures.test_gradient(16, 16))
    src = tmp_path / "p.png"
    codecs.save_image(img, src, "png")
    rc = main(["-i", str(src), "-o", str(tmp_path / "o.png"), "--profile"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "load:" in out and "encode:" in out


@pytest.mark.skipif(not PDN_FIXTURE.exists(), reason="reference pdn fixture not mounted")
def test_pdn_truncated_deferred_payload_is_pdnerror(tmp_path):
    """Corruption deep in the deferred-payload walk (struct.error,
    gzip errors, reshape mismatches) must surface as PdnError so load_pdn's
    host fallback / the CLI's keep-going error path can catch it."""
    from paintfe_tpu.io.pdn import PdnError, load_pdn_native

    blob = PDN_FIXTURE.read_bytes()
    bad = tmp_path / "trunc.pdn"
    bad.write_bytes(blob[: len(blob) - 100])
    with pytest.raises(PdnError):
        load_pdn_native(bad)


@pytest.mark.skipif(not PDN_FIXTURE.exists(), reason="reference pdn fixture not mounted")
def test_project_open_routes_pdn(tmp_path):
    from paintfe_tpu.core.project import Project

    proj = Project.open(PDN_FIXTURE)
    assert (proj.canvas.width, proj.canvas.height) == (800, 600)
    assert len(proj.canvas.layers) == 2


def test_cli_corrupt_pdn_keeps_going(tmp_path):
    """A corrupt .pdn in the batch reports an error and the remaining
    inputs still process (cli.rs:155-216 keep-going; PdnError used to
    escape the per-file handler and crash the batch)."""
    from PIL import Image

    from paintfe_tpu.cli import main

    good = tmp_path / "good.png"
    Image.fromarray(np.full((8, 8, 4), 50, np.uint8), "RGBA").save(good)
    bad = tmp_path / "bad.pdn"
    bad.write_bytes(b"PDN3" + b"\x00" * 64)
    outdir = tmp_path / "out"
    rc = main(["-i", str(bad), str(good), "--output-dir", str(outdir),
               "-f", "png"])
    assert rc == 1                       # failure reported...
    assert (outdir / "good.png").exists()  # ...but the batch kept going


def test_cli_script_resize_with_deep_input(tmp_path):
    """A 16-bit input plus a canvas-resizing script must export cleanly:
    the stale deep buffer (old element count) used to crash the deep
    export path's reshape."""
    from paintfe_tpu.cli import main
    from paintfe_tpu.io import deep_export as de

    u16 = np.random.default_rng(12).integers(0, 65536, (16, 16, 4), np.uint16)
    src = tmp_path / "deep.png"
    de.write_png16(src, 16, 16, u16)
    fx = tmp_path / "fx.rhai"
    fx.write_text("resize_canvas(24, 24);")
    outdir = tmp_path / "out"
    rc = main(["-i", str(src), "-s", str(fx), "--output-dir", str(outdir),
               "-f", "png"])
    assert rc == 0
    out = codecs.load_image(outdir / "deep.png")
    assert out.shape == (24, 24, 4)


def test_cli_animate_canonicalizes_like_single(tmp_path):
    """--animate commits script results through the same path as run_one
    (canonicalize_tiles included) so frames match single-image output."""
    from PIL import Image

    from paintfe_tpu.cli import main
    from paintfe_tpu.io import codecs as co

    # fully-transparent image whose RGB is nonzero: the layer-commit
    # invariant zeroes RGB of transparent 64px tiles
    img = np.zeros((64, 64, 4), np.uint8)
    img[..., 0] = 77  # alpha stays 0
    src = tmp_path / "t.png"
    Image.fromarray(img, "RGBA").save(src)
    fx = tmp_path / "fx.rhai"
    fx.write_text("apply_brightness_contrast(1.0, 0.0);")

    single_out = tmp_path / "single.png"
    assert main(["-i", str(src), "-s", str(fx), "-o", str(single_out),
                 "-f", "png"]) == 0
    anim_out = tmp_path / "anim.png"
    assert main(["-i", str(src), "-s", str(fx), "--animate", str(anim_out),
                 "--fps", "5"]) == 0
    frames, _delays = co.load_frames(anim_out)
    single = co.load_image(single_out)
    np.testing.assert_array_equal(frames[0][..., 3], single[..., 3])
