"""Async script execution + CLI --animate + per-band HSL."""

import threading
import time

import numpy as np

from paintfe_tpu import cli
from paintfe_tpu.core import fixtures
from paintfe_tpu.io import codecs
from paintfe_tpu.ops import adjustments as adj
from paintfe_tpu.scripting import ScriptError, execute_script_async


def drain(q, timeout=10.0):
    out = []
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            msg = q.get(timeout=0.2)
        except Exception:
            continue
        out.append(msg)
        if msg.kind in ("completed", "error"):
            return out
    raise TimeoutError("no terminal message")


def test_async_streams_console_and_completes():
    img = fixtures.test_gradient(32, 32)
    thread, q = execute_script_async(
        """
        print_line("starting");
        progress(0.5);
        apply_invert();
        print_line("done");
        """,
        img, 32, 32,
    )
    msgs = drain(q)
    kinds = [m.kind for m in msgs]
    assert "console" in kinds and "progress" in kinds
    assert kinds[-1] == "completed"
    pixels, w, h, console, _ops, _elapsed_ms = msgs[-1].payload
    assert console == ["starting", "done"]
    np.testing.assert_array_equal(
        np.asarray(pixels)[..., 0], 255 - img[..., 0]
    )
    thread.join(timeout=5)


def test_async_error_message():
    img = fixtures.test_gradient(8, 8)
    _t, q = execute_script_async("let x = 1 / 0;", img, 8, 8)
    msgs = drain(q)
    assert msgs[-1].kind == "error"
    assert isinstance(msgs[-1].payload, ScriptError)


def test_async_cancellation():
    img = fixtures.test_gradient(8, 8)
    cancel = threading.Event()
    cancel.set()  # cancel before it starts looping
    _t, q = execute_script_async(
        "let i = 0; while true { i += 1; }", img, 8, 8, cancel_event=cancel
    )
    msgs = drain(q, timeout=30.0)
    assert msgs[-1].kind == "error"
    assert "cancel" in msgs[-1].payload.message.lower()


def test_cli_animate(tmp_path):
    for i in range(4):
        codecs.save_image(
            fixtures.solid(16, 16, (i * 60, 0, 0, 255)), tmp_path / f"f{i}.png", "png"
        )
    out = tmp_path / "anim.gif"
    rc = cli.main(["-i", str(tmp_path / "f*.png"), "--animate", str(out),
                   "--fps", "5"])
    assert rc == 0
    frames, delays = codecs.load_frames(out)
    assert len(frames) == 4
    assert delays[0] == 200  # 5 fps -> 20cs -> 200ms


def test_cli_animate_with_script(tmp_path):
    for i in range(3):
        img = fixtures.test_gradient(16, 16)
        img[0, 0] = [i * 40, 0, 0, 255]  # distinct frames (APNG dedupes)
        codecs.save_image(img, tmp_path / f"g{i}.png", "png")
    script = tmp_path / "s.rhai"
    script.write_text("apply_invert();")
    out = tmp_path / "anim.png"  # APNG
    rc = cli.main(["-i", str(tmp_path / "g*.png"), "-s", str(script),
                   "--animate", str(out)])
    assert rc == 0
    frames, _ = codecs.load_frames(out)
    assert len(frames) == 3
    expected = fixtures.test_gradient(16, 16)
    expected[0, 0] = [0, 0, 0, 255]
    np.testing.assert_array_equal(frames[0][..., 0], 255 - expected[..., 0])


def test_cli_sharded_animate_matches_serial(tmp_path):
    """The BASELINE "sharded batch + per-frame animated export" target at
    CPU-mesh scale: 72 images (a scaled 1k stand-in crossing the 64-image
    bucket flush) through a Rhai op chain on the 8-device mesh, exported
    as one animation — byte-identical to the serial --animate path, with
    keep-going semantics for a corrupt member."""
    for i in range(72):
        img = fixtures.test_gradient(24, 32)
        # a big distinct patch per frame: the sepia chain quantizes small
        # differences away and PIL merges identical consecutive frames
        img[0:8, 0:8] = [(i * 37) % 256, (i * 91) % 256, (i * 53) % 256, 255]
        codecs.save_image(img, tmp_path / f"m{i:03d}.png", "png")
    script = tmp_path / "s.rhai"
    script.write_text("apply_brightness_contrast(12.0, 18.0);\n"
                      "apply_sepia(0.4);")

    serial = tmp_path / "serial.png"
    sharded = tmp_path / "sharded.png"
    rc = cli.main(["-i", str(tmp_path / "m*.png"), "-s", str(script),
                   "--animate", str(serial), "--fps", "12"])
    assert rc == 0
    rc = cli.main(["-i", str(tmp_path / "m*.png"), "-s", str(script),
                   "--shard", "--animate", str(sharded), "--fps", "12"])
    assert rc == 0
    assert serial.read_bytes() == sharded.read_bytes()
    frames, _ = codecs.load_frames(sharded)
    assert len(frames) == 72

    # keep-going: one corrupt member drops its frame, exit code 1, the
    # other 72 frames still export in order
    (tmp_path / "m036a.png").write_bytes(b"not a png")
    broken = tmp_path / "broken.png"
    rc = cli.main(["-i", str(tmp_path / "m*.png"), "-s", str(script),
                   "--shard", "--animate", str(broken), "--fps", "12"])
    assert rc == 1
    frames2, _ = codecs.load_frames(broken)
    assert len(frames2) == 72
    for a, b in zip(frames, frames2):
        np.testing.assert_array_equal(a, b)


def test_sharded_animate_per_pixel_fallback(tmp_path):
    """Scripts the vectorizer can't trace still animate under --shard via
    the per-image path, identical to serial."""
    for i in range(3):
        img = fixtures.test_gradient(12, 16)
        img[0, 0] = [i * 50, 0, 0, 255]
        codecs.save_image(img, tmp_path / f"p{i}.png", "png")
    script = tmp_path / "s.rhai"
    script.write_text(
        "for_each_pixel(|x, y, r, g, b, a| [b, g, r, a]);")
    serial = tmp_path / "serial.gif"
    sharded = tmp_path / "sharded.gif"
    assert cli.main(["-i", str(tmp_path / "p*.png"), "-s", str(script),
                     "--animate", str(serial)]) == 0
    assert cli.main(["-i", str(tmp_path / "p*.png"), "-s", str(script),
                     "--shard", "--animate", str(sharded)]) == 0
    assert serial.read_bytes() == sharded.read_bytes()


def test_per_band_hsl_identity_and_selectivity():
    img = fixtures.color_bands(64, 8)
    zeros = np.zeros(6, np.float32)
    out = np.asarray(adj.hue_saturation_per_band(img, 0.0, 0.0, 0.0, zeros, zeros, zeros))
    np.testing.assert_array_equal(out, img)
    reds = zeros.copy()
    reds[0] = 90.0
    out = np.asarray(adj.hue_saturation_per_band(img, 0.0, 0.0, 0.0, reds, zeros, zeros))
    assert not (out[:, 2] == img[:, 2]).all()  # red band shifted
    np.testing.assert_array_equal(out[:, 12], img[:, 12])  # green band untouched


def test_async_completed_carries_elapsed_ms():
    from paintfe_tpu.core import fixtures
    from paintfe_tpu.scripting.engine import execute_script_async

    img = np.asarray(fixtures.test_gradient(8, 8))
    thread, q = execute_script_async("apply_invert();", img, 8, 8)
    thread.join(timeout=30)
    last = None
    while not q.empty():
        last = q.get()
    assert last.kind == "completed"
    *_, elapsed_ms = last.payload
    assert isinstance(elapsed_ms, int) and elapsed_ms >= 0


# ---------------------------------------------------------------------------
# Animated-encode parity (io.rs:2774-2940): delays, loop flag, frame count,
# GIF palette clamping, dimension validation.
# ---------------------------------------------------------------------------

def _frames(n=3, w=16, h=12, colors=None):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        if colors is not None:
            # few-color frames so palette size is observable
            idx = rng.integers(0, len(colors), (h, w))
            fr = np.asarray(colors, np.uint8)[idx]
        else:
            fr = rng.integers(0, 256, (h, w, 4), np.uint8)
        fr[..., 3] = 255
        out.append(fr)
    return out


def test_gif_delay_formula():
    # max(round(100/fps), 1) centiseconds (io.rs:2789)
    assert codecs.gif_delay_cs(10.0) == 10
    assert codecs.gif_delay_cs(24.0) == 4      # round(4.1666)
    assert codecs.gif_delay_cs(7.0) == 14      # round(14.285)
    assert codecs.gif_delay_cs(1000.0) == 1    # clamp to >= 1
    assert codecs.gif_delay_cs(0.5) == 200


def test_apng_delay_formula():
    # round(1000/fps) clamped to [1, 65535] (io.rs:2837)
    assert codecs.apng_delay_ms(10.0) == 100
    assert codecs.apng_delay_ms(3.0) == 333
    assert codecs.apng_delay_ms(100000.0) == 1
    assert codecs.apng_delay_ms(0.01) == 65535


def test_webp_delay_formula():
    # fps floored at 1.0 before the divide (io.rs:2921)
    assert codecs.webp_delay_ms(10.0) == 100
    assert codecs.webp_delay_ms(0.5) == 1000   # NOT 2000: fps.max(1.0)
    assert codecs.webp_delay_ms(40.0) == 25


def test_gif_roundtrip_frames_delays_loop(tmp_path):
    from PIL import Image

    p = str(tmp_path / "anim.gif")
    codecs.save_animation(_frames(4), p, "gif", fps=24.0)
    with Image.open(p) as im:
        assert im.n_frames == 4
        assert im.info.get("loop", None) == 0  # infinite repeat
        for i in range(im.n_frames):
            im.seek(i)
            # 24 fps -> 4 cs -> 40 ms on every frame
            assert im.info["duration"] == 40


def test_gif_palette_max_colors(tmp_path):
    from PIL import Image

    colors = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255),
              (255, 255, 0, 255), (0, 255, 255, 255), (255, 0, 255, 255),
              (255, 255, 255, 255), (0, 0, 0, 255)]
    p = str(tmp_path / "pal.gif")
    codecs.save_animation(_frames(2, colors=colors), p, "gif", fps=10,
                          max_colors=4)
    with Image.open(p) as im:
        # adaptive quantization respects the clamp (distinct indices used)
        for i in range(im.n_frames):
            im.seek(i)
            assert len(im.getcolors(maxcolors=256)) <= 4
    # clamp lower bound: 2 colors minimum (io.rs:2794)
    p2 = str(tmp_path / "pal2.gif")
    codecs.save_animation(_frames(2, colors=colors), p2, "gif", fps=10,
                          max_colors=0)
    with Image.open(p2) as im:
        assert len(im.getcolors(maxcolors=256)) <= 2


def test_apng_roundtrip_frames_delays_loop(tmp_path):
    from PIL import Image

    p = str(tmp_path / "anim.png")
    codecs.save_animation(_frames(3), p, "apng", fps=5.0)
    with Image.open(p) as im:
        assert im.n_frames == 3
        assert im.info.get("loop", None) == 0
        for i in range(im.n_frames):
            im.seek(i)
            assert im.info["duration"] == 200.0


def test_webp_roundtrip_frames_loop(tmp_path):
    from PIL import Image

    p = str(tmp_path / "anim.webp")
    codecs.save_animation(_frames(3), p, "webp", fps=10.0)
    with Image.open(p) as im:
        assert im.n_frames == 3
        assert im.info.get("loop", None) == 0
        # (PIL's WebP decoder does not surface per-frame durations; the
        # delay formula itself is covered by test_webp_delay_formula)


def test_animation_errors(tmp_path):
    import pytest

    with pytest.raises(codecs.CodecError):
        codecs.save_animation([], str(tmp_path / "x.gif"), "gif")
    bad = [np.zeros((8, 8, 4), np.uint8), np.zeros((9, 8, 4), np.uint8)]
    with pytest.raises(codecs.CodecError):
        codecs.save_animation(bad, str(tmp_path / "y.gif"), "gif")
    with pytest.raises(codecs.CodecError):
        codecs.save_animation(_frames(1), str(tmp_path / "z.xyz"), "xyz")


def test_load_frames_matches_saved_animation(tmp_path):
    # decode side: frame count + per-frame delays survive the round trip
    p = str(tmp_path / "rt.gif")
    frames = _frames(3, colors=[(255, 0, 0, 255), (0, 0, 255, 255)])
    codecs.save_animation(frames, p, "gif", fps=10)
    decoded, delays = codecs.load_frames(p)
    assert len(decoded) == 3
    assert all(d == 100 for d in delays)
    assert all(fr.shape == frames[0].shape for fr in decoded)


def test_save_animation_errors_are_codec_errors(tmp_path):
    """PIL/OS failures surface as CodecError (the CLI's keep-going handler
    catches only the documented type); tiny fps saturates at the u16 GIF
    delay instead of a struct.error."""
    import numpy as np
    import pytest

    from paintfe_tpu.io import codecs

    frames = [np.zeros((8, 8, 4), np.uint8)] * 2
    with pytest.raises(codecs.CodecError):
        codecs.save_animation(frames, tmp_path / "nodir" / "x.gif", "gif")
    assert codecs.gif_delay_cs(0.001) == 65535  # saturates, encodes fine
    codecs.save_animation(frames, tmp_path / "slow.gif", "gif", fps=0.001)


def test_animated_webp_lossless_roundtrip(tmp_path):
    """The reference's animated WebP defaults to LOSSLESS per frame —
    pixels must round-trip exactly (quality-90 VP8 degraded them)."""
    import numpy as np

    from paintfe_tpu.io import codecs

    rng = np.random.default_rng(3)
    frames = [np.asarray(rng.integers(0, 256, (16, 16, 4), np.uint8))
              for _ in range(3)]
    p = tmp_path / "a.webp"
    codecs.save_animation(frames, p, "webp", fps=10.0)
    back, delays = codecs.load_frames(p)
    assert len(back) == 3
    for a, b in zip(frames, back):
        # libwebp lossless may rewrite RGB under alpha==0 (exact=0, same
        # as the reference's encoder); visible content must be exact
        vis = a[..., 3] > 0
        np.testing.assert_array_equal(a[vis], b[vis])
        np.testing.assert_array_equal(a[..., 3], b[..., 3])


def test_bmp_preserves_alpha(tmp_path):
    import numpy as np

    from paintfe_tpu.io import codecs

    img = np.zeros((8, 8, 4), np.uint8)
    img[...] = [200, 10, 10, 128]
    p = tmp_path / "a.bmp"
    codecs.save_image(img, p, "bmp")
    back = codecs.load_image(p)
    np.testing.assert_array_equal(back, img)


def test_gif_zero_delay_clamps_to_10ms(tmp_path):
    """MIN_FRAME_DELAY_MS=10 (io.rs:2293): zero-GCE GIFs must not reload
    as 0/100ms delays."""
    import numpy as np
    from PIL import Image

    from paintfe_tpu.io import codecs

    frames = [Image.fromarray(np.full((4, 4, 4), 60 * i, np.uint8), "RGBA")
              .convert("P") for i in range(1, 3)]
    p = tmp_path / "z.gif"
    frames[0].save(p, format="GIF", save_all=True, append_images=frames[1:],
                   duration=0, loop=0)
    _fr, delays = codecs.load_frames(p)
    assert all(d == 10 for d in delays)


def test_ico_keeps_exact_size(tmp_path):
    import numpy as np

    from paintfe_tpu.io import codecs

    img = np.zeros((100, 100, 4), np.uint8)
    img[..., 3] = 255
    p = tmp_path / "a.ico"
    codecs.save_image(img, p, "ico")
    back = codecs.load_image(p)
    assert back.shape == (100, 100, 4)  # no silent downscale to 64x64
