"""Regression tests for the round-5 IO/core review findings.

Each test pins a verified failure mode: the TIFF LZW early-change tail
desync, Adam7 16-bit PNGs, corrupt PFE enum tags, planar/mixed-depth
foreign TIFFs, the 256-Mpix import clamp, and settings shape validation.
"""

import struct
import zlib

import numpy as np
import pytest

from paintfe_tpu.io import deep_export as de


def _boundary_payloads():
    """Replay the fuzz recipe that found the LZW early-change failures
    (rng(0), n in [200, 2000), full-range bytes): trials 911 and 2830
    land the decoder table on exactly 2^w - 1 at the final data code."""
    rng = np.random.default_rng(0)
    keep = {911, 2830, 0, 100, 2000}
    out = []
    for trial in range(3000):
        n = int(rng.integers(200, 2000))
        payload = rng.integers(0, 256, n).astype(np.uint8)
        if trial in keep:
            out.append(bytes(payload))
    return out


def test_lzw_early_change_tail_roundtrip():
    """A stream whose final data code lands the table on 2^w - 1 entries
    ends with an EOI at the pre-bump width; the bounded decode (libtiff's
    expected-size contract) must round-trip exactly, and the unbounded
    decode must still yield the payload as a prefix."""
    for payload in _boundary_payloads():
        enc = de._lzw_encode(payload)
        dec = de._lzw_decode(enc, len(payload))
        assert dec == payload
        free = de._lzw_decode(enc)
        assert free[:len(payload)] == payload  # at most trailing junk


def test_tiff_lzw_roundtrip_at_boundary(tmp_path):
    """End to end: write_tiff16 with LZW at a boundary-hitting size must
    read back exactly (the pre-fix reader crashed on reshape for ~0.05%
    of random images and silently fell back to 8-bit)."""
    rng = np.random.default_rng(911)
    for _ in range(6):
        h, w = int(rng.integers(5, 40)), int(rng.integers(5, 40))
        px = rng.integers(0, 65536, (h, w, 4)).astype(np.uint16)
        p = tmp_path / "t.tiff"
        de.write_tiff16(p, w, h, px, compression="lzw")
        back = de.read_tiff_deep(p)
        assert back.dtype == np.uint16
        np.testing.assert_array_equal(back, px)


def test_interlaced_png16_rejected(tmp_path):
    """Adam7 16-bit PNGs would decode scrambled through the sequential
    defilter; read_png16 must refuse and load_deep_image must fall back
    (None) instead of importing garbage as the deep buffer."""
    w = h = 8
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 6, 0, 0, 1)  # interlace=1
    raw = bytes((h * (w * 8 + 1)) + 64)  # enough bytes either way

    def chunk(tag, payload):
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload))

    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    p = tmp_path / "i.png"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="interlaced"):
        de.read_png16(p)
    assert de.load_deep_image(p) is None


def test_corrupt_pfe_enum_tags_raise_pfe_error(tmp_path):
    """Out-of-range bincode enum tags in a V3 .pfe must surface as
    PfeError (caught by the CLI's keep-going handler), not IndexError."""
    from paintfe_tpu.core.canvas import Canvas
    from paintfe_tpu.core.deep import DeepRgbaBuffer, PixelFormat
    from paintfe_tpu.io import pfe

    c = Canvas.new(4, 4, (10, 20, 30, 255))
    c.layers[0].pixel_format = PixelFormat.RGBA_U16
    c.layers[0].deep_pixels = DeepRgbaBuffer(
        PixelFormat.RGBA_U16, np.zeros(4 * 4 * 4, np.uint16))
    p = tmp_path / "x.pfe"
    pfe.save_pfe(c, p)
    blob = bytearray(p.read_bytes())
    # the deep-buffer record is [fmt tag u32 = 1 (RGBA_U16)][count u64 =
    # 64]; that 12-byte signature locates the enum tag unambiguously
    sig = struct.pack("<I", 1) + struct.pack("<Q", 4 * 4 * 4)
    idx = bytes(blob).find(sig, 8)
    assert idx != -1
    blob[idx:idx + 4] = struct.pack("<I", 99)
    p.write_bytes(bytes(blob))
    with pytest.raises(pfe.PfeError):
        pfe.load_pfe(str(p))


def test_planar_and_mixed_depth_tiffs_rejected(tmp_path):
    """Foreign TIFFs with PlanarConfiguration=2 or mixed BitsPerSample
    would silently scramble; the deep reader must refuse them so
    load_deep_image falls back to the flat codec."""
    def write_min_tiff(path, extra_tags):
        w = h = 4
        payload = np.zeros(h * w * 4, "<u2").tobytes()
        tags = {256: (3, [w]), 257: (3, [h]), 258: (3, [16, 16, 16, 16]),
                259: (3, [1]), 277: (3, [4]), 278: (3, [h]),
                279: (4, [len(payload)])}
        tags.update(extra_tags)
        n = len(tags) + 1  # + strip offset tag
        data_start = 8 + 2 + (n * 12) + 4
        extra = bytearray()
        entries = []
        for tag in sorted(tags):
            typ, vals = tags[tag]
            fmt = {3: "H", 4: "I"}[typ]
            enc = struct.pack(f"<{len(vals)}{fmt}", *vals)
            if len(enc) <= 4:
                entries.append((tag, typ, len(vals), enc.ljust(4, b"\0")))
            else:
                entries.append((tag, typ, len(vals),
                                struct.pack("<I", data_start + len(extra))))
                extra += enc
        entries.append((273, 4, 1,
                        struct.pack("<I", data_start + len(extra))))
        out = b"II*\0" + struct.pack("<I", 8) + struct.pack("<H", n)
        for tag, typ, cnt, val in sorted(entries):
            out += struct.pack("<HHI", tag, typ, cnt) + val
        out += struct.pack("<I", 0) + bytes(extra) + payload
        path.write_bytes(out)

    p1 = tmp_path / "planar.tiff"
    write_min_tiff(p1, {284: (3, [2])})
    with pytest.raises(ValueError, match="planar"):
        de.read_tiff_deep(p1)

    p2 = tmp_path / "mixed.tiff"
    write_min_tiff(p2, {258: (3, [16, 16, 16, 8])})
    with pytest.raises(ValueError, match="mixed"):
        de.read_tiff_deep(p2)


def test_from_image_clamps_oversized(monkeypatch, capsys):
    import paintfe_tpu.core.canvas as canvas_mod

    monkeypatch.setattr(canvas_mod, "MAX_PIXELS", 5000)
    img = np.zeros((100, 100, 4), np.uint8)
    c = canvas_mod.Canvas.from_image(img)
    assert (c.width, c.height) == (1, 1)
    assert "clamped" in capsys.readouterr().err


def test_settings_shape_validation(tmp_path):
    from paintfe_tpu.utils.settings import AppSettings

    p = tmp_path / "settings.json"
    p.write_text('{"default_background": [255, 255, 255], '
                 '"max_recent_files": 2.5, "autosave_interval_minutes": 7}')
    s = AppSettings.load(p)
    d = AppSettings()
    assert s.default_background == d.default_background  # 3-tuple rejected
    assert s.max_recent_files == d.max_recent_files      # float rejected
    assert s.autosave_interval_minutes == 7              # valid int kept
