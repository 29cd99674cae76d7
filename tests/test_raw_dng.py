"""Minimal DNG ingestion: synthesized uncompressed DNG fixtures.

The writer below builds byte-exact little-endian TIFF/DNG containers so
the reader is tested against an independent serialization, not its own.
"""

import struct

import numpy as np
import pytest

from paintfe_tpu.io import codecs, raw


def _entry(tag, typ, count, value, data_blocks, data_offset):
    """Build a 12-byte IFD entry; large values get appended to data_blocks."""
    sizes = {1: 1, 3: 2, 4: 4, 5: 8, 11: 4}
    fmt = {1: "B", 3: "H", 4: "I"}
    size = sizes[typ]
    total = size * count
    if typ == 5:  # rational pairs
        payload = b"".join(struct.pack("<II", n, d) for n, d in value)
    elif typ == 11:
        payload = struct.pack(f"<{count}f", *value)
    else:
        payload = struct.pack(f"<{count}{fmt[typ]}", *value)
    if total <= 4:
        return struct.pack("<HHI", tag, typ, count) + payload.ljust(4, b"\0"), data_offset
    entry = struct.pack("<HHII", tag, typ, count, data_offset)
    data_blocks.append(payload)
    return entry, data_offset + len(payload)


def write_dng(path, samples: np.ndarray, photometric: int, extra_tags=None,
              bits=16, black=0, white=None):
    """Single-IFD little-endian uncompressed DNG."""
    h, w = samples.shape[:2]
    spp = 1 if samples.ndim == 2 else samples.shape[2]
    white = white if white is not None else 2 ** bits - 1
    dt = np.uint16 if bits == 16 else np.uint8
    strip = np.ascontiguousarray(samples.astype(dt)).tobytes()

    tags = [
        (254, 4, 1, [0]),                     # NewSubfileType: full raw
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, spp, [bits] * spp),
        (259, 3, 1, [1]),                     # uncompressed
        (262, 3, 1, [photometric]),
        (277, 3, 1, [spp]),
        (278, 4, 1, [h]),
        (50706, 1, 4, [1, 4, 0, 0]),          # DNGVersion
        (50714, 3, 1, [black]),               # BlackLevel
        (50717, 3, 1, [white]),               # WhiteLevel
    ]
    tags.extend(extra_tags or [])
    # strip offset/count appended after layout is known
    n = len(tags) + 2
    header = 8
    ifd_size = 2 + n * 12 + 4
    data_offset = header + ifd_size
    blocks = []
    entries = []
    tags.append((273, 4, 1, None))  # placeholder StripOffsets
    tags.append((279, 4, 1, [len(strip)]))
    tags.sort(key=lambda t: t[0])

    # first pass to find where out-of-line data lands; strip goes last
    strip_tag_index = [i for i, t in enumerate(tags) if t[0] == 273][0]
    # compute data blocks for all but strip, then strip offset
    tmp_blocks = []
    off = data_offset
    rendered = []
    for i, (tag, typ, count, value) in enumerate(tags):
        if tag == 273:
            rendered.append(None)  # fill later
            continue
        e, off = _entry(tag, typ, count, value, tmp_blocks, off)
        rendered.append(e)
    strip_offset = off
    rendered[strip_tag_index] = struct.pack("<HHII", 273, 4, 1, strip_offset)

    with open(path, "wb") as fh:
        fh.write(b"II" + struct.pack("<HI", 42, 8))
        fh.write(struct.pack("<H", n))
        for e in rendered:
            fh.write(e)
        fh.write(struct.pack("<I", 0))
        for b in tmp_blocks:
            fh.write(b)
        fh.write(strip)


def _srgb(linear):
    linear = np.clip(linear, 0.0, 1.0).astype(np.float32)
    lo = linear * np.float32(12.92)
    hi = np.float32(1.055) * np.power(linear, np.float32(1 / 2.4)) - np.float32(0.055)
    return np.where(linear <= np.float32(0.0031308), lo, hi)


def test_linear_rgb_dng_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    lin = rng.integers(0, 65536, (12, 17, 3)).astype(np.uint16)
    p = tmp_path / "lin.dng"
    write_dng(p, lin, photometric=34892)
    out = codecs.load_image(p)
    assert out.shape == (12, 17, 4)
    assert out.dtype == np.uint8
    expect = np.clip(np.floor(_srgb(lin / np.float32(65535.0)) * 255.0 + 0.5),
                     0, 255).astype(np.uint8)
    assert np.array_equal(out[..., :3], expect)
    assert (out[..., 3] == 255).all()


def test_linear_gray_black_white_levels(tmp_path):
    # black=1000, white=3000 -> mid value 2000 normalizes to 0.5
    g = np.full((6, 8), 2000, np.uint16)
    p = tmp_path / "gray.dng"
    write_dng(p, g, photometric=1, black=1000, white=3000)
    out = codecs.load_image(p)
    v = np.clip(np.floor(_srgb(np.float32(0.5)) * 255.0 + 0.5), 0, 255)
    assert (out[..., 0] == int(v)).all()
    assert (out[..., 1] == int(v)).all()


def test_cfa_rggb_constant_field(tmp_path):
    # constant gray CFA with unit white balance -> constant gray output
    h, w = 16, 24
    mosaic = np.full((h, w), 30000, np.uint16)
    extra = [
        (33421, 3, 2, [2, 2]),                # CFARepeatPatternDim
        (33422, 1, 4, [0, 1, 1, 2]),          # RGGB
        (50728, 5, 3, [(1, 1), (1, 1), (1, 1)]),  # AsShotNeutral = 1,1,1
    ]
    p = tmp_path / "cfa.dng"
    write_dng(p, mosaic, photometric=32803, extra_tags=extra)
    out = codecs.load_image(p)
    assert out.shape == (h, w, 4)
    expect = int(np.clip(np.floor(
        _srgb(np.float32(30000.0 / 65535.0)) * 255.0 + 0.5), 0, 255))
    # interior must be exactly the constant (demosaic of a constant field)
    assert (np.abs(out[2:-2, 2:-2, :3].astype(int) - expect) <= 1).all()


def test_cfa_white_balance(tmp_path):
    # AsShotNeutral (0.5, 1, 0.8) -> red gain 2.0, blue gain 1.25
    h, w = 12, 12
    mosaic = np.full((h, w), 10000, np.uint16)
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [0, 1, 1, 2]),
        (50728, 5, 3, [(1, 2), (1, 1), (4, 5)]),
    ]
    p = tmp_path / "wb.dng"
    write_dng(p, mosaic, photometric=32803, extra_tags=extra)
    out = codecs.load_image(p).astype(np.float32)
    inner = out[3:-3, 3:-3]
    # gains: red 2.0, blue 1.25, green 1.0 -> red > blue > green
    assert inner[..., 0].mean() > inner[..., 2].mean() > inner[..., 1].mean()


def test_unsupported_paths_clear_errors(tmp_path):
    # compressed DNG
    lin = np.zeros((4, 4, 3), np.uint16)
    p = tmp_path / "comp.dng"
    write_dng(p, lin, photometric=34892)
    blob = bytearray(p.read_bytes())
    # flip the Compression entry value from 1 to 7 (lossless JPEG)
    idx = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[idx + 8] = 7
    p2 = tmp_path / "ljpeg.dng"
    p2.write_bytes(bytes(blob))
    with pytest.raises(codecs.CodecError, match="lossless-JPEG"):
        codecs.load_image(p2)
    # proprietary RAW still gives the targeted message
    cr2 = tmp_path / "x.cr2"
    cr2.write_bytes(b"II*\0")
    with pytest.raises(codecs.CodecError, match="raw decoder"):
        codecs.load_image(cr2)
    # a TIFF without DNGVersion is rejected by the DNG reader
    with pytest.raises(raw.RawError, match="DNGVersion"):
        import PIL.Image as I

        t = tmp_path / "plain.tiff"
        I.fromarray(np.zeros((4, 4, 3), np.uint8)).save(t, format="TIFF")
        raw.load_dng(t)


def test_malformed_dng_raises_rawerror(tmp_path):
    """Truncated/corrupt containers surface as RawError -> CodecError, so
    the CLI's keep-going semantics apply instead of a crash."""
    lin = np.zeros((4, 4, 3), np.uint16)
    p = tmp_path / "ok.dng"
    write_dng(p, lin, photometric=34892)
    blob = p.read_bytes()
    # truncate mid-IFD
    p2 = tmp_path / "trunc.dng"
    p2.write_bytes(blob[:16])
    with pytest.raises(raw.RawError):
        raw.load_dng(p2)
    with pytest.raises(codecs.CodecError):
        codecs.load_image(p2)
    # garbage body with a valid TIFF magic
    p3 = tmp_path / "garbage.dng"
    p3.write_bytes(b"II*\0" + b"\xff" * 64)
    with pytest.raises((raw.RawError,)):
        raw.load_dng(p3)


def test_dng_parser_fuzz_never_crashes(tmp_path):
    """Random mutations of a valid DNG either decode or raise RawError —
    never an unhandled exception (keep-going contract)."""
    rng = np.random.default_rng(99)
    lin = rng.integers(0, 65536, (6, 9, 3)).astype(np.uint16)
    p = tmp_path / "base.dng"
    write_dng(p, lin, photometric=34892)
    base = bytearray(p.read_bytes())
    for trial in range(60):
        blob = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            pos = int(rng.integers(0, len(blob)))
            blob[pos] = int(rng.integers(0, 256))
        if rng.random() < 0.3:
            blob = blob[: int(rng.integers(4, len(blob)))]
        q = tmp_path / f"fuzz{trial}.dng"
        q.write_bytes(bytes(blob))
        try:
            out = raw.load_dng(q)
            assert out.dtype == np.uint8 and out.ndim == 3
        except raw.RawError:
            pass  # the only acceptable failure mode
