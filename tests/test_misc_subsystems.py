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


def test_soft_proof_roundtrip_near_identity():
    img = fixtures.color_bands(64, 8)
    out = soft_proof_cmyk(img)
    assert out.shape == img.shape
    d = np.abs(out[..., 0:3].astype(int) - img[..., 0:3].astype(int))
    assert d.max() <= 2  # pure primaries survive the CMYK trip
    cmyk = rgb_to_cmyk(img[0, -1, 0:3])  # black band
    assert cmyk[3] > 0.99  # black -> full K


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
