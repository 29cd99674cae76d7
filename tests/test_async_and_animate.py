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
