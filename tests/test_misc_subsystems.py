"""Mirror mode, soft proof, PDN mapping, plugin host, AI gate."""

import json
import os
import stat
import sys

import numpy as np
import pytest

from paintfe_tpu.core import fixtures
from paintfe_tpu.core.blend import BlendMode
from paintfe_tpu.core.mirror import MirrorMode, rgb_to_cmyk, soft_proof_cmyk
from paintfe_tpu.io import pdn
from paintfe_tpu.ops import ai
from paintfe_tpu.ops.plugins import PluginHost, PluginError, TrustList


def test_mirror_positions():
    assert MirrorMode.NONE.mirror_positions(3, 4, 10, 10) == [(3, 4)]
    assert MirrorMode.HORIZONTAL.mirror_positions(3, 4, 10, 10) == [(3, 4), (6.0, 4)]
    assert MirrorMode.VERTICAL.mirror_positions(3, 4, 10, 10) == [(3, 4), (3, 5.0)]
    q = MirrorMode.QUARTERS.mirror_positions(0, 0, 10, 10)
    assert (9.0, 9.0) in q and len(q) == 4
    assert MirrorMode.NONE.next() == MirrorMode.HORIZONTAL
    assert MirrorMode.QUARTERS.next() == MirrorMode.NONE


def test_soft_proof_gamut_compression():
    # The proof is NOT an identity round trip (soft_proof.rs): vivid
    # saturated colors desaturate (GCR + gamut compression) and
    # highlights mute slightly (paper-white K lift).
    img = fixtures.color_bands(64, 8)
    out = soft_proof_cmyk(img)
    assert out.shape == img.shape
    # pure white picks up the 3% paper-white darkening only
    white = np.array([[[255, 255, 255, 255]]], np.uint8)
    pw = soft_proof_cmyk(white)[0, 0]
    assert tuple(pw[:3]) == (247, 247, 247) and pw[3] == 255
    # vivid blue is out of CMYK gamut: gamut compression backs off the
    # C+M inks (R/G lift to 30) and paper white mutes the peak channel
    blue = np.array([[[0, 0, 255, 255]]], np.uint8)
    assert tuple(soft_proof_cmyk(blue)[0, 0]) == (30, 30, 247, 255)
    # pure black and alpha-0 pixels pass through unchanged
    black = np.array([[[0, 0, 0, 255]]], np.uint8)
    assert tuple(soft_proof_cmyk(black)[0, 0]) == (0, 0, 0, 255)
    clear = np.array([[[200, 50, 90, 0]]], np.uint8)
    assert tuple(soft_proof_cmyk(clear)[0, 0]) == (200, 50, 90, 0)
    cmyk = rgb_to_cmyk(img[0, -1, 0:3])  # black band
    assert cmyk[3] > 0.99  # black -> full K


def test_layer_clone_does_not_alias_payloads():
    # Undo snapshots use Layer.clone(); editing the live layer's deep
    # buffer / adjustment params / text blocks must not mutate snapshots.
    from paintfe_tpu.core import deep
    from paintfe_tpu.core.canvas import Layer

    layer = Layer.new("l", 8, 8)
    layer.deep_pixels = deep.DeepRgbaBuffer.from_rgba8(
        layer.pixels, deep.PixelFormat.RGBA_F32)
    layer.adjustment = deep.AdjustmentLayerData(
        kind=deep.AdjustmentKind.EXPOSURE, ev=1.0)
    snap = layer.clone()
    layer.deep_pixels.data[:] = 0.5
    layer.adjustment.ev = -2.0
    assert float(snap.deep_pixels.data.ravel()[0]) == 0.0
    assert snap.adjustment.ev == 1.0


def test_pdn_blend_mode_mapping():
    assert pdn.map_blend_mode("Multiply") == BlendMode.MULTIPLY
    assert pdn.map_blend_mode("Xor") == BlendMode.XOR
    assert pdn.map_blend_mode("SomethingNew") == BlendMode.NORMAL


def test_pdn_header_parse(tmp_path):
    xml = b'<pdnImage width="320" height="240"><layers><layer name="bg" visible="true"></layer></layers></pdnImage>'
    data = b"PDN3" + bytes([len(xml) & 0xFF, (len(xml) >> 8) & 0xFF, (len(xml) >> 16) & 0xFF]) + xml
    p = tmp_path / "doc.pdn"
    p.write_bytes(data)
    hdr = pdn.read_header(p)
    assert hdr["width"] == 320 and hdr["height"] == 240
    assert hdr["layers"][0]["name"] == "bg"
    with pytest.raises(pdn.PdnError):
        pdn.load_pdn(p)  # no PAINTFE_PDN_HOST configured


def test_pdn_rejects_non_pdn(tmp_path):
    p = tmp_path / "x.pdn"
    p.write_bytes(b"NOPE")
    with pytest.raises(pdn.PdnError):
        pdn.read_header(p)


PLUGIN_SRC = '''#!/usr/bin/env python3
import sys, json, base64
for line in sys.stdin:
    req = json.loads(line)
    if req["cmd"] == "describe":
        print(json.dumps({"name": "demo", "effects": [{"id": "invert", "name": "Invert"}]}), flush=True)
    elif req["cmd"] == "render":
        raw = bytearray(base64.b64decode(req["pixels_b64"]))
        for i in range(0, len(raw), 4):
            raw[i] = 255 - raw[i]
            raw[i+1] = 255 - raw[i+1]
            raw[i+2] = 255 - raw[i+2]
        print(json.dumps({"ok": True, "pixels_b64": base64.b64encode(bytes(raw)).decode()}), flush=True)
'''


def _write_plugin(tmp_path):
    p = tmp_path / "demo_plugin.py"
    p.write_text(PLUGIN_SRC)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return p


def test_plugin_host_describe_render(tmp_path):
    exe = _write_plugin(tmp_path)
    host = PluginHost(exe)
    try:
        desc = host.describe()
        assert desc["effects"][0]["id"] == "invert"
        img = fixtures.test_gradient(16, 16)
        out = host.render("invert", img)
        np.testing.assert_array_equal(out[..., 0], 255 - img[..., 0])
        np.testing.assert_array_equal(out[..., 3], img[..., 3])
    finally:
        host.close()


def test_plugin_trust_list(tmp_path):
    exe = _write_plugin(tmp_path)
    trust = TrustList(tmp_path / "trust.txt")
    with pytest.raises(PluginError):
        PluginHost(exe, trust=trust)  # untrusted
    trust.trust(exe)
    host = PluginHost(exe, trust=TrustList(tmp_path / "trust.txt"))
    host.close()


def test_ai_gated():
    if ai.available():  # pragma: no cover - env-dependent
        return
    with pytest.raises(ai.AiUnavailable):
        ai.BackgroundRemover("/nonexistent.onnx")


# -- Project document wrapper (project.rs:10-98) -------------------------------


def test_project_untitled_and_dirty_title():
    from paintfe_tpu.core.project import Project

    p = Project.new_untitled(3, 32, 24)
    assert p.name == "Untitled-3" and p.title == "Untitled-3"
    assert (p.canvas.width, p.canvas.height) == (32, 24)
    p.mark_dirty()
    assert p.title == "Untitled-3*"


def test_project_open_save_roundtrip(tmp_path):
    from paintfe_tpu.core import fixtures
    from paintfe_tpu.core.project import Project
    from paintfe_tpu.io import codecs

    img = np.asarray(fixtures.test_gradient(16, 16))
    src = tmp_path / "doc.png"
    codecs.save_image(img, src, "png")
    p = Project.open(src)
    assert p.name == "doc" and not p.was_animated
    out = tmp_path / "doc.pfe"
    p.save(out)
    assert not p.is_dirty and p.path == out
    p2 = Project.open(out)
    np.testing.assert_array_equal(np.asarray(p2.canvas.layers[0].pixels), img)


def test_project_open_animated(tmp_path):
    from paintfe_tpu.core import fixtures
    from paintfe_tpu.core.project import Project
    from paintfe_tpu.io import codecs

    frames = [np.asarray(fixtures.solid(8, 8, (c, 0, 0, 255))) for c in (50, 150, 250)]
    gif = tmp_path / "anim.gif"
    codecs.save_animation(frames, gif, "gif", fps=5.0)
    p = Project.open(gif)
    assert p.was_animated and len(p.canvas.layers) == 3
    assert abs(p.animation_fps - 5.0) < 0.6  # centisecond rounding


def test_print_image_writes_temp_png(tmp_path, monkeypatch):
    import tempfile

    from paintfe_tpu.core import fixtures
    from paintfe_tpu.io import codecs
    from paintfe_tpu.utils.printing import print_image

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    img = np.asarray(fixtures.test_gradient(8, 8))
    path = print_image(img)
    assert path.name == "paintfe_print.png"
    np.testing.assert_array_equal(codecs.load_image(path), img)


def test_project_open_preserves_deep_payload(tmp_path):
    """Project.open must keep 16-bit payloads like the CLI loader does
    (io.rs:588-640); PIL-only loading silently flattens to 8 bits."""
    from paintfe_tpu.core.project import Project
    from paintfe_tpu.io import deep_export as de

    u16 = np.random.default_rng(8).integers(0, 65536, (8, 8, 4), np.uint16)
    src = tmp_path / "deep.png"
    de.write_png16(src, 8, 8, u16)
    proj = Project.open(src)
    layer = proj.canvas.layers[0]
    assert layer.deep_pixels is not None
    np.testing.assert_array_equal(layer.deep_pixels.data.reshape(8, 8, 4), u16)
    # and a re-save keeps the full depth
    out = tmp_path / "deep_out.tiff"
    proj.save(out)
    np.testing.assert_array_equal(de.read_tiff_deep(out), u16)


def test_plugin_unresponsive_times_out(tmp_path):
    """A plugin that accepts the request but never answers must be killed
    and surface as PluginError (round-4 review: the timeout was dead code
    and readline blocked forever)."""
    import stat as _stat
    import time

    p = tmp_path / "hang_plugin.py"
    p.write_text("#!/usr/bin/env python3\nimport time\ntime.sleep(600)\n")
    p.chmod(p.stat().st_mode | _stat.S_IEXEC)
    host = PluginHost(p, timeout=1.0)
    t0 = time.monotonic()
    with pytest.raises(PluginError, match="unresponsive"):
        host.describe()
    assert time.monotonic() - t0 < 10.0
    host.close()
