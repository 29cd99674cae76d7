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
    sizes = {1: 1, 3: 2, 4: 4, 5: 8, 10: 8, 11: 4}
    fmt = {1: "B", 3: "H", 4: "I"}
    size = sizes[typ]
    total = size * count
    if typ in (5, 10):  # (signed) rational pairs
        pair_fmt = "<II" if typ == 5 else "<ii"
        payload = b"".join(struct.pack(pair_fmt, n, d) for n, d in value)
    elif typ == 11:
        payload = struct.pack(f"<{count}f", *value)
    else:
        payload = struct.pack(f"<{count}{fmt[typ]}", *value)
    if total <= 4:
        return struct.pack("<HHI", tag, typ, count) + payload.ljust(4, b"\0"), data_offset
    entry = struct.pack("<HHII", tag, typ, count, data_offset)
    data_blocks.append(payload)
    return entry, data_offset + len(payload)


def _f32_to_fp24_bits(vals: np.ndarray) -> np.ndarray:
    """Test-side fp24 encoder (1 sign / 7 exp bias-63 / 16 mantissa).
    Assumes every value is exactly fp24-representable (the tests build
    their fixtures that way), so decode must be bit-exact."""
    u = vals.astype(np.float32).view(np.uint32)
    sign = (u >> 31) & 1
    exp32 = (u >> 23) & 0xFF
    mant = (u >> 7) & 0xFFFF
    out = np.where(exp32 == 0, sign << 23,                       # +-0
                   (sign << 23) | ((exp32 - 64) << 16) | mant)
    out = np.where(exp32 == 0xFF, (sign << 23) | (0x7F << 16) | mant, out)
    return out.astype(np.uint32)


def _fp_row_bytes(row: np.ndarray, fp_bits: int, predictor: int,
                  spp: int) -> bytes:
    """One row of float samples -> stored bytes.  With an fp predictor the
    row becomes big-endian byte PLANES (MSB plane first) delta-coded at
    byte stride spp*(1|2|4); predictor 1 keeps plain little-endian IEEE
    samples (the writer emits II containers)."""
    flat = row.reshape(-1).astype(np.float32)
    if fp_bits == 32:
        be = flat.astype(">f4").view(np.uint8).reshape(-1, 4)
    elif fp_bits == 16:
        be = flat.astype(">f2").view(np.uint8).reshape(-1, 2)
    else:
        u = _f32_to_fp24_bits(flat)
        be = np.stack([(u >> 16) & 0xFF, (u >> 8) & 0xFF, u & 0xFF],
                      axis=-1).astype(np.uint8)
    if predictor == 1:
        return np.ascontiguousarray(be[:, ::-1]).tobytes()  # LE container
    stride = spp * {3: 1, 34894: 2, 34895: 4}[predictor]
    planes = be.T.reshape(-1).astype(np.uint8)  # MSB plane first
    diffed = planes.copy()
    diffed[stride:] = planes[stride:] - planes[:-stride]
    return diffed.tobytes()


def write_dng(path, samples: np.ndarray, photometric: int, extra_tags=None,
              bits=16, black=0, white=None, compression=1, tile=None,
              ljpeg_components=2, predictor=1, fp_bits=None):
    """Single-IFD little-endian DNG.

    compression=1 writes uncompressed strips; compression=7 encodes each
    segment with the test-side lossless-JPEG encoder (ljpeg_writer.py);
    compression=5/8 writes TIFF LZW / deflate (optionally with TIFF
    Predictor 2 horizontal differencing).
    tile=(tw, tl) switches from one strip to a TileWidth/TileLength grid.
    fp_bits=16/24/32 writes SampleFormat=3 floating-point samples from
    float32 input (predictor 1, 3 fp, or 34894/34895 fp X2/X4).
    """
    import zlib

    from tests.ljpeg_writer import encode_ljpeg

    h, w = samples.shape[:2]
    spp = 1 if samples.ndim == 2 else samples.shape[2]
    if fp_bits is not None:
        bits = fp_bits
        white = white if white is not None else 0  # sentinel: omit tag
    white = white if white is not None else 2 ** bits - 1
    dt = np.uint16 if bits == 16 else np.uint8

    def encode_segment(seg: np.ndarray) -> bytes:
        if compression == 34892:  # DNG lossy JPEG: PIL is the encoder
            import io as _io

            from PIL import Image

            mode = {1: "L", 3: "YCbCr"}[spp]  # YCbCr mode: raw components
            buf = _io.BytesIO()
            Image.fromarray(seg.astype(np.uint8), mode).save(
                buf, "JPEG", quality=95, subsampling=0)
            return buf.getvalue()
        if fp_bits is not None:
            payload = b"".join(_fp_row_bytes(seg[yy], fp_bits, predictor, spp)
                               for yy in range(seg.shape[0]))
            if compression == 8:
                return zlib.compress(payload)
            if compression == 5:
                from paintfe_tpu.io.deep_export import _lzw_encode
                return _lzw_encode(payload)
            return payload
        if compression == 1:
            return np.ascontiguousarray(seg.astype(dt)).tobytes()
        if compression in (5, 8):
            arr = seg.astype(dt).reshape(seg.shape[0], -1, spp)
            if predictor == 2:
                diffed = arr.copy()
                diffed[:, 1:] = arr[:, 1:] - arr[:, :-1]  # modular (uint wrap)
                arr = diffed
            payload = np.ascontiguousarray(
                arr.reshape(seg.shape[0], -1).astype("<u2" if bits == 16 else "u1")
            ).tobytes()
            if compression == 8:
                return zlib.compress(payload)
            from paintfe_tpu.io.deep_export import _lzw_encode

            return _lzw_encode(payload)
        flat = seg.reshape(seg.shape[0], -1)  # (rows, cols*spp)
        nc = ljpeg_components if flat.shape[1] % ljpeg_components == 0 else 1
        return encode_ljpeg(
            flat.reshape(flat.shape[0], flat.shape[1] // nc, nc).astype(
                np.uint16),
            precision=bits, predictor=1)

    segments = []
    if tile is None:
        segments.append(encode_segment(samples))
    else:
        tw, tl = tile
        padded = np.zeros(
            ((h + tl - 1) // tl * tl, (w + tw - 1) // tw * tw)
            + samples.shape[2:], samples.dtype)
        padded[:h, :w] = samples
        for ty in range(0, padded.shape[0], tl):
            for tx in range(0, padded.shape[1], tw):
                segments.append(encode_segment(padded[ty:ty + tl, tx:tx + tw]))

    nseg = len(segments)
    tags = [
        (254, 4, 1, [0]),                     # NewSubfileType: full raw
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, spp, [bits] * spp),
        (259, 3, 1, [compression]),
        (262, 3, 1, [photometric]),
        (277, 3, 1, [spp]),
        (50706, 1, 4, [1, 4, 0, 0]),          # DNGVersion
    ]
    if fp_bits is not None:
        tags.append((339, 3, spp, [3] * spp))  # SampleFormat: IEEE fp
        if white:                              # fp default white is 1.0
            tags.append((50717, 3, 1, [white]))
    else:
        tags.append((50717, 3, 1, [white]))   # WhiteLevel
    if not any(t[0] == 50714 for t in (extra_tags or [])) and \
            not (fp_bits is not None and black == 0):
        tags.append((50714, 3, 1, [black]))   # BlackLevel
    if predictor != 1:
        tags.append((317, 3, 1, [predictor]))
    if tile is None:
        tags.append((278, 4, 1, [h]))         # RowsPerStrip
        off_tag, cnt_tag = 273, 279
    else:
        tags.append((322, 4, 1, [tile[0]]))
        tags.append((323, 4, 1, [tile[1]]))
        off_tag, cnt_tag = 324, 325
    tags.extend(extra_tags or [])
    tags.append((off_tag, 4, nseg, None))     # placeholder offsets
    tags.append((cnt_tag, 4, nseg, [len(s) for s in segments]))
    tags.sort(key=lambda t: t[0])

    n = len(tags)
    header = 8
    ifd_size = 2 + n * 12 + 4
    data_offset = header + ifd_size
    off_tag_index = [i for i, t in enumerate(tags) if t[0] == off_tag][0]
    # lay out all out-of-line value blocks first, reserving room for the
    # offsets array itself when nseg > 1; segment data goes last
    tmp_blocks = []
    off = data_offset
    rendered = []
    for tag, typ, count, value in tags:
        if tag == off_tag:
            rendered.append(None)
            if nseg > 1:  # the offsets array lives out-of-line
                tmp_blocks.append(None)  # placeholder block
                off += 4 * nseg
            continue
        e, off = _entry(tag, typ, count, value, tmp_blocks, off)
        rendered.append(e)
    seg_offsets = []
    pos = off
    for s in segments:
        seg_offsets.append(pos)
        pos += len(s)
    if nseg == 1:
        rendered[off_tag_index] = struct.pack(
            "<HHII", off_tag, 4, 1, seg_offsets[0])
    else:
        arr_off = [i for i, b in enumerate(tmp_blocks) if b is None][0]
        payload = struct.pack(f"<{nseg}I", *seg_offsets)
        # recompute where the placeholder landed
        loc = data_offset + sum(len(b) for b in tmp_blocks[:arr_off])
        tmp_blocks[arr_off] = payload
        rendered[off_tag_index] = struct.pack("<HHII", off_tag, 4, nseg, loc)

    with open(path, "wb") as fh:
        fh.write(b"II" + struct.pack("<HI", 42, 8))
        fh.write(struct.pack("<H", n))
        for e in rendered:
            fh.write(e)
        fh.write(struct.pack("<I", 0))
        for b in tmp_blocks:
            fh.write(b)
        for s in segments:
            fh.write(s)


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


def test_ljpeg_dng_matches_uncompressed(tmp_path):
    """A lossless-JPEG DNG (Compression=7) must decode bit-identically to
    the same samples stored uncompressed."""
    rng = np.random.default_rng(7)
    mosaic = rng.integers(0, 1 << 16, (18, 26)).astype(np.uint16)
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [0, 1, 1, 2]),
        (50728, 5, 3, [(1, 2), (1, 1), (2, 3)]),
    ]
    p1 = tmp_path / "plain.dng"
    p2 = tmp_path / "lj.dng"
    write_dng(p1, mosaic, photometric=32803, extra_tags=extra)
    write_dng(p2, mosaic, photometric=32803, extra_tags=extra, compression=7)
    assert np.array_equal(raw.load_dng(p1), raw.load_dng(p2))


def test_ljpeg_dng_multi_strip(tmp_path):
    """Multiple strips, each an independent LJPEG stream."""
    from tests.ljpeg_writer import encode_ljpeg

    rng = np.random.default_rng(8)
    lin = rng.integers(0, 1 << 16, (12, 10, 3)).astype(np.uint16)
    p1 = tmp_path / "plain.dng"
    write_dng(p1, lin, photometric=34892)
    # hand-build the 3-strip variant: rows 0-3 / 4-7 / 8-11
    p2 = tmp_path / "strips.dng"
    strips = [encode_ljpeg(lin[y:y + 4].reshape(4, 15, 2), 16) for y in (0, 4, 8)]
    _write_multistrip_dng(p2, strips, w=10, h=12, spp=3, rows_per_strip=4)
    assert np.array_equal(raw.load_dng(p1), raw.load_dng(p2))


@pytest.mark.parametrize("predictor", [1, 4, 7])
def test_ljpeg_restart_intervals_roundtrip(predictor):
    """Row-aligned restart markers (DRI = k*W) decode bit-identically to
    the restart-free stream (per-interval 1-D reprediction per T.81)."""
    from tests.ljpeg_writer import encode_ljpeg

    rng = np.random.default_rng(9)
    samples = rng.integers(0, 1 << 14, (11, 8)).astype(np.uint16)
    plain, _ = raw.ljpeg_decode_full(encode_ljpeg(samples, 14,
                                                  predictor=predictor))
    rst, prec = raw.ljpeg_decode_full(
        encode_ljpeg(samples, 14, predictor=predictor, restart_rows=3))
    assert prec == 14
    assert np.array_equal(plain, rst)
    assert np.array_equal(rst, samples)


def test_ljpeg_midrow_restart_rejected():
    """A DRI that is not a multiple of the MCUs per row (mid-row restart)
    is a decoder-divergent T.81 corner no verified encoder exercises —
    rejected as unsupported rather than decoded divergently."""
    from tests.ljpeg_writer import encode_ljpeg

    rng = np.random.default_rng(10)
    samples = rng.integers(0, 1 << 12, (8, 6)).astype(np.uint16)
    stream = bytearray(encode_ljpeg(samples, 12, restart_rows=2))
    i = stream.find(b"\xff\xdd")
    assert i > 0
    stream[i + 4:i + 6] = (7).to_bytes(2, "big")  # 7 % 6 != 0
    with pytest.raises(raw.RawError, match="mid-row restart"):
        raw.ljpeg_decode_full(bytes(stream))


def _write_multistrip_dng(path, strips, w, h, spp, rows_per_strip):
    tags = [
        (254, 4, 1, [0]),
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, spp, [16] * spp),
        (259, 3, 1, [7]),
        (262, 3, 1, [34892]),
        (277, 3, 1, [spp]),
        (278, 4, 1, [rows_per_strip]),
        (50706, 1, 4, [1, 4, 0, 0]),
        (50714, 3, 1, [0]),
        (50717, 3, 1, [65535]),
        (273, 4, len(strips), None),
        (279, 4, len(strips), [len(s) for s in strips]),
    ]
    tags.sort(key=lambda t: t[0])
    n = len(tags)
    data_offset = 8 + 2 + n * 12 + 4
    tmp_blocks = []
    rendered = []
    off = data_offset
    oti = [i for i, t in enumerate(tags) if t[0] == 273][0]
    for tag, typ, count, value in tags:
        if tag == 273:
            rendered.append(None)
            if len(strips) > 1:
                tmp_blocks.append(None)
                off += 4 * len(strips)
            continue
        e, off = _entry(tag, typ, count, value, tmp_blocks, off)
        rendered.append(e)
    offs = []
    pos = off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if len(strips) == 1:
        rendered[oti] = struct.pack("<HHII", 273, 4, 1, offs[0])
    else:
        ph = [i for i, b in enumerate(tmp_blocks) if b is None][0]
        loc = data_offset + sum(len(b) for b in tmp_blocks[:ph])
        tmp_blocks[ph] = struct.pack(f"<{len(strips)}I", *offs)
        rendered[oti] = struct.pack("<HHII", 273, 4, len(strips), loc)
    with open(path, "wb") as fh:
        fh.write(b"II" + struct.pack("<HI", 42, 8))
        fh.write(struct.pack("<H", n))
        for e in rendered:
            fh.write(e)
        fh.write(struct.pack("<I", 0))
        for b in tmp_blocks:
            fh.write(b)
        for s in strips:
            fh.write(s)


@pytest.mark.parametrize("compression", [1, 7])
def test_tiled_dng_matches_strip(tmp_path, compression):
    """Tiled layout (TileWidth/TileLength), incl. edge-tile cropping,
    decodes identically to the single-strip layout."""
    rng = np.random.default_rng(9)
    mosaic = rng.integers(0, 1 << 16, (22, 30)).astype(np.uint16)
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [0, 1, 1, 2]),
    ]
    p1 = tmp_path / "strip.dng"
    p2 = tmp_path / "tiled.dng"
    write_dng(p1, mosaic, photometric=32803, extra_tags=extra)
    # 16x8 tiles -> 2x3 grid with cropped right/bottom edges
    write_dng(p2, mosaic, photometric=32803, extra_tags=extra,
              compression=compression, tile=(16, 8))
    assert np.array_equal(raw.load_dng(p1), raw.load_dng(p2))


@pytest.mark.parametrize("compression", [5, 8])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("tiled", [False, True])
def test_lzw_deflate_dng_matches_uncompressed(tmp_path, compression,
                                              predictor, tiled):
    """Compression=5 (LZW) / =8 (deflate), with and without TIFF
    Predictor 2, strip- and tile-organised, decode bit-identically to the
    uncompressed layout.  deflate is validated against stdlib zlib (an
    independent oracle); LZW against the TIFF-flavor encoder deep_export
    round-trips against PIL."""
    rng = np.random.default_rng(31 + compression + predictor)
    mosaic = rng.integers(0, 1 << 16, (20, 28)).astype(np.uint16)
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [0, 1, 1, 2]),
    ]
    p1 = tmp_path / "plain.dng"
    p2 = tmp_path / "comp.dng"
    write_dng(p1, mosaic, photometric=32803, extra_tags=extra)
    write_dng(p2, mosaic, photometric=32803, extra_tags=extra,
              compression=compression, predictor=predictor,
              tile=(16, 8) if tiled else None)
    assert np.array_equal(raw.load_dng(p1), raw.load_dng(p2))


def test_deflate_dng_linear_rgb(tmp_path):
    """Predictor-2 deflate on a 3-sample linear DNG: per-channel
    differencing must be undone channel-wise, not byte-wise."""
    rng = np.random.default_rng(17)
    lin = rng.integers(0, 1 << 16, (10, 14, 3)).astype(np.uint16)
    p1 = tmp_path / "plain.dng"
    p2 = tmp_path / "z.dng"
    write_dng(p1, lin, photometric=34892)
    write_dng(p2, lin, photometric=34892, compression=8, predictor=2)
    assert np.array_equal(raw.load_dng(p1), raw.load_dng(p2))


def test_per_plane_black_levels(tmp_path):
    """BlackLevel count=4 + BlackLevelRepeatDim 2x2 (common on real
    cameras) subtracts per CFA position."""
    h, w = 8, 8
    blacks = np.array([[100, 200], [300, 400]], np.uint16)
    ys, xs = np.mgrid[0:h, 0:w]
    # value = per-site black + 10000 -> normalized value is constant
    mosaic = (blacks[ys % 2, xs % 2] + 10000).astype(np.uint16)
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [1, 0, 2, 1]),          # GRBG
        (50713, 3, 2, [2, 2]),                # BlackLevelRepeatDim
        (50714, 3, 4, [100, 200, 300, 400]),
    ]
    p = tmp_path / "pb.dng"
    write_dng(p, mosaic, photometric=32803, extra_tags=extra, white=30000)
    out = raw.load_dng(p)
    v = 10000.0 / (30000.0 - 400.0)
    expect = int(np.clip(np.floor(_srgb(np.float32(v)) * 255.0 + 0.5), 0, 255))
    assert (np.abs(out[2:-2, 2:-2, :3].astype(int) - expect) <= 1).all()


def test_mismatched_black_repeat_raises(tmp_path):
    mosaic = np.full((8, 8), 500, np.uint16)
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [0, 1, 1, 2]),
        (50714, 3, 4, [1, 2, 3, 4]),          # count 4, no repeat dim
    ]
    p = tmp_path / "bad.dng"
    write_dng(p, mosaic, photometric=32803, extra_tags=extra)
    with pytest.raises(raw.RawError, match="BlackLevelRepeatDim"):
        raw.load_dng(p)


def test_active_area_crop(tmp_path):
    """ActiveArea crops masked borders before demosaic; the CFA pattern is
    relative to the active-area origin."""
    full = np.zeros((20, 24), np.uint16)
    rng = np.random.default_rng(11)
    inner = rng.integers(5000, 60000, (16, 18)).astype(np.uint16)
    full[3:19, 4:22] = inner
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [0, 1, 1, 2]),
        (50829, 3, 4, [3, 4, 19, 22]),        # top, left, bottom, right
    ]
    p1 = tmp_path / "aa.dng"
    write_dng(p1, full, photometric=32803, extra_tags=extra)
    p2 = tmp_path / "inner.dng"
    write_dng(p2, inner, photometric=32803,
              extra_tags=[(33421, 3, 2, [2, 2]), (33422, 1, 4, [0, 1, 1, 2])])
    a = raw.load_dng(p1)
    b = raw.load_dng(p2)
    assert a.shape == b.shape == (16, 18, 4)
    assert np.array_equal(a, b)


def test_color_matrix_applied(tmp_path):
    """ColorMatrix1 (XYZ->camera) engages the camera->sRGB transform; an
    sRGB-like camera (CM = sRGB->XYZ inverse chain) leaves pixels within
    rounding of the no-matrix decode."""
    rng = np.random.default_rng(12)
    lin = rng.integers(0, 1 << 16, (10, 14, 3)).astype(np.uint16)
    p0 = tmp_path / "nomatrix.dng"
    write_dng(p0, lin, photometric=34892)
    base = raw.load_dng(p0)
    # camera == sRGB: cam_from_srgb = I, so CM = inv(M_srgb2xyz) row-scaled.
    m = np.linalg.inv(np.array(
        [[0.4124564, 0.3575761, 0.1804375],
         [0.2126729, 0.7151522, 0.0721750],
         [0.0193339, 0.1191920, 0.9503041]]))
    cm = [(int(round(v * 10000)), 10000) for v in m.flatten()]
    p1 = tmp_path / "matrix.dng"
    write_dng(p1, lin, photometric=34892,
              extra_tags=[(50721, 10, 9, cm)])
    out = raw.load_dng(p1)
    assert np.abs(out.astype(int) - base.astype(int)).max() <= 1
    # a red-scaling camera matrix must change the red channel
    m2 = m.copy()
    m2[:, 0] *= 2.0  # camera red responds 2x -> inverse halves red
    cm2 = [(int(round(v * 10000)), 10000) for v in m2.flatten()]
    p2 = tmp_path / "matrix2.dng"
    write_dng(p2, lin, photometric=34892, extra_tags=[(50721, 10, 9, cm2)])
    out2 = raw.load_dng(p2)
    assert not np.array_equal(out2, base)


def test_unsupported_paths_clear_errors(tmp_path):
    # unsupported compression scheme (99)
    lin = np.zeros((4, 4, 3), np.uint16)
    p = tmp_path / "comp.dng"
    write_dng(p, lin, photometric=34892)
    blob = bytearray(p.read_bytes())
    idx = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[idx + 8] = 99
    p2 = tmp_path / "unknown.dng"
    p2.write_bytes(bytes(blob))
    with pytest.raises(codecs.CodecError, match="compression 99"):
        codecs.load_image(p2)
    # compression flipped to 8 with uncompressed payload -> clean error
    blob[idx + 8] = 8
    p2b = tmp_path / "baddeflate.dng"
    p2b.write_bytes(bytes(blob))
    with pytest.raises(codecs.CodecError, match="corrupt compressed"):
        codecs.load_image(p2b)
    # Compression=7 whose payload is not actually an LJPEG stream
    blob[idx + 8] = 7
    p3 = tmp_path / "badljpeg.dng"
    p3.write_bytes(bytes(blob))
    with pytest.raises(codecs.CodecError, match="lossless-JPEG"):
        codecs.load_image(p3)
    # proprietary RAW families without native decoders keep the targeted
    # message (CR2/NEF/ARW/PEF/SRW/ORF/RW2 now decode natively; see
    # test_raw_camera.py and test_raw_families.py)
    cr3 = tmp_path / "x.cr3"
    cr3.write_bytes(b"\0\0\0\x18ftypcrx ")
    with pytest.raises(codecs.CodecError, match="raw decoder"):
        codecs.load_image(cr3)
    # truncated members of the native families surface as CodecError too
    arw = tmp_path / "x.arw"
    arw.write_bytes(b"II*\0")
    with pytest.raises(codecs.CodecError, match="malformed ARW"):
        codecs.load_image(arw)
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


def test_ljpeg_dng_fuzz_never_crashes(tmp_path):
    """Mutations of a lossless-JPEG DNG hit the native decoder's error
    paths (bad markers, truncated entropy data, bogus Huffman tables) and
    must surface as RawError, never a crash or unhandled exception."""
    rng = np.random.default_rng(123)
    mosaic = rng.integers(0, 1 << 16, (10, 12)).astype(np.uint16)
    p = tmp_path / "base.dng"
    write_dng(p, mosaic, photometric=32803, compression=7,
              extra_tags=[(33421, 3, 2, [2, 2]), (33422, 1, 4, [0, 1, 1, 2])])
    base = bytearray(p.read_bytes())
    for trial in range(80):
        blob = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(0, len(blob)))
            blob[pos] = int(rng.integers(0, 256))
        if rng.random() < 0.3:
            blob = blob[: int(rng.integers(4, len(blob)))]
        q = tmp_path / f"ljfuzz{trial}.dng"
        q.write_bytes(bytes(blob))
        try:
            out = raw.load_dng(q)
            assert out.dtype == np.uint8 and out.ndim == 3
        except raw.RawError:
            pass  # the only acceptable failure mode


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


# -- floating-point DNG (round-4: SampleFormat=3, fp16/24/32) ----------------
# Public DNG spec ch.3 "Floating Point Data": byte-plane fp predictors
# (TIFF Predictor 3 and the DNG 1.4 X2/X4 variants), deflate/LZW strips or
# tiles.  The writer above is an independent test-side serializer, so each
# case validates the reader against the spec, not against itself.


def _fp_fixture(bits, shape, seed):
    """Random values EXACTLY representable at the target precision, as f32
    (so predictor/compression round trips must be bit-exact)."""
    rng = np.random.default_rng(seed)
    if bits == 32:
        return rng.random(shape, dtype=np.float32)
    if bits == 16:
        return rng.random(shape, dtype=np.float32).astype(np.float16).astype(np.float32)
    # fp24: quantize f32 by dropping 7 mantissa bits
    u = rng.random(shape, dtype=np.float32).view(np.uint32) & np.uint32(0xFFFFFF80)
    return u.view(np.float32)


@pytest.mark.parametrize("bits", [16, 24, 32])
@pytest.mark.parametrize("predictor", [1, 3, 34894])
@pytest.mark.parametrize("compression", [1, 8])
def test_fp_dng_gray_grid(tmp_path, bits, predictor, compression):
    vals = _fp_fixture(bits, (9, 14), seed=bits + predictor)
    p = tmp_path / "fp.dng"
    write_dng(p, vals, photometric=1, fp_bits=bits, predictor=predictor,
              compression=compression)
    out = codecs.load_image(p)
    expect = np.clip(np.floor(_srgb(vals) * 255.0 + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(out[..., 0], expect)
    assert np.array_equal(out[..., 1], expect)
    assert (out[..., 3] == 255).all()


def test_fp_dng_linear_rgb_deflate_pred3(tmp_path):
    vals = _fp_fixture(32, (7, 11, 3), seed=3)
    p = tmp_path / "fprgb.dng"
    write_dng(p, vals, photometric=34892, fp_bits=32, predictor=3,
              compression=8)
    out = codecs.load_image(p)
    expect = np.clip(np.floor(_srgb(vals) * 255.0 + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(out[..., :3], expect)


def test_fp_dng_tiled_lzw(tmp_path):
    vals = _fp_fixture(16, (10, 13), seed=4)
    p = tmp_path / "fptile.dng"
    write_dng(p, vals, photometric=1, fp_bits=16, predictor=3,
              compression=5, tile=(8, 4))
    out = codecs.load_image(p)
    expect = np.clip(np.floor(_srgb(vals) * 255.0 + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(out[..., 0], expect)


def test_fp_dng_cfa_x2_predictor(tmp_path):
    # fp CFA mosaic with the X2 byte-stride predictor (alternating-channel
    # columns): constant field -> constant interior after demosaic
    mosaic = np.full((12, 16), np.float32(0.25))
    extra = [
        (33421, 3, 2, [2, 2]),
        (33422, 1, 4, [0, 1, 1, 2]),
        (50728, 5, 3, [(1, 1), (1, 1), (1, 1)]),
    ]
    p = tmp_path / "fpcfa.dng"
    write_dng(p, mosaic, photometric=32803, fp_bits=32, predictor=34894,
              compression=8, extra_tags=extra)
    out = codecs.load_image(p)
    expect = int(np.clip(np.floor(_srgb(np.float32(0.25)) * 255.0 + 0.5),
                         0, 255))
    assert (np.abs(out[2:-2, 2:-2, :3].astype(int) - expect) <= 1).all()


def test_fp_dng_white_level_scaling(tmp_path):
    # WhiteLevel=4 on fp data: 1.0 -> 0.25 after normalization
    vals = np.full((5, 6), np.float32(1.0))
    p = tmp_path / "fpwhite.dng"
    write_dng(p, vals, photometric=1, fp_bits=32, predictor=3,
              compression=8, white=4)
    out = codecs.load_image(p)
    expect = int(np.clip(np.floor(_srgb(np.float32(0.25)) * 255.0 + 0.5),
                         0, 255))
    assert (out[..., 0] == expect).all()


def test_fp24_special_values_exact():
    # Hand-built fp24 bit patterns -> exact f32 (sign/exp/mant/zero/inf)
    from paintfe_tpu.io.raw import _fp24_bits_to_f32

    cases = {
        0x000000: 0.0,
        0x800000: -0.0,
        0x3F8000: 1.5,          # exp=63 (2^0), mant 0x8000 -> 1.5
        0x3F0000: 1.0,
        0xBF0000: -1.0,
        0x400000: 2.0,          # exp=64 -> 2^1
        0x3E0000: 0.5,
        0x7F0000: np.inf,
        0xFF0000: -np.inf,
    }
    got = _fp24_bits_to_f32(np.array(list(cases), np.uint32))
    np.testing.assert_array_equal(got, np.array(list(cases.values()), np.float32))
    # denormal: mant * 2^-78
    d = _fp24_bits_to_f32(np.array([0x000001], np.uint32))
    assert d[0] == np.float32(2.0 ** -78)


def test_fp_dng_unsupported_bits_rejected(tmp_path):
    vals = _fp_fixture(32, (4, 4), seed=5)
    p = tmp_path / "fpbad.dng"
    write_dng(p, vals, photometric=1, fp_bits=32, predictor=3, compression=8)
    blob = bytearray(p.read_bytes())
    # patch BitsPerSample 32 -> 64 (tag 258, type 3): find the IFD entry
    i = blob.find(bytes.fromhex("0201") + b"\x03\x00")  # tag 258 LE + SHORT
    assert i > 0
    blob[i + 8:i + 10] = (64).to_bytes(2, "little")
    p2 = tmp_path / "fpbad2.dng"
    p2.write_bytes(bytes(blob))
    with pytest.raises(raw.RawError, match="floating-point"):
        raw.load_dng(p2)


# -- lossy-JPEG DNG (round-4: Compression=34892, baseline DCT) ---------------
# The entropy/DCT decoder is native C++ (native/jpegdct.cpp), from the
# public T.81 spec; PIL/libjpeg is the INDEPENDENT oracle.  A compliant
# IDCT may differ from libjpeg's islow integer IDCT by at most 1 per
# sample (T.81 Annex A accuracy bound) — the sample-level tests assert
# that envelope, and the DNG-level tests assert exact plumbing on top of
# the decoder's own samples.

import io as _io

from PIL import Image


def _pil_jpeg(arr, mode, **save_kw):
    buf = _io.BytesIO()
    Image.fromarray(arr, mode).save(buf, "JPEG", **save_kw)
    return buf.getvalue()


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_jpegdct_gray_matches_pil(quality):
    x = np.linspace(0, 2 * np.pi, 64)
    img = ((np.sin(x)[None, :] * np.cos(x)[:, None]) * 100 + 128).astype(np.uint8)
    stream = _pil_jpeg(img, "L", quality=quality)
    ours = raw.jpegdct_decode(stream)
    pil = np.asarray(Image.open(_io.BytesIO(stream)))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_jpegdct_noise_odd_dims_matches_pil():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    stream = _pil_jpeg(noise, "L", quality=92)
    ours = raw.jpegdct_decode(stream)
    pil = np.asarray(Image.open(_io.BytesIO(stream)))
    assert ours.shape == (37, 53)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_jpegdct_color_444_matches_pil_raw_components():
    # PIL draft("YCbCr") decodes WITHOUT the YCbCr->RGB conversion, so it
    # oracles our raw-component contract directly.
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    stream = _pil_jpeg(rgb, "RGB", quality=90, subsampling=0)
    ours = raw.jpegdct_decode(stream).reshape(40, 48, 3)
    im = Image.open(_io.BytesIO(stream))
    im.draft("YCbCr", im.size)
    assert im.mode == "YCbCr"
    pil = np.asarray(im)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_jpegdct_restart_markers_match_pil():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    stream = _pil_jpeg(img, "L", quality=90, restart_marker_rows=1)
    assert b"\xff\xdd" in stream and b"\xff\xd0" in stream
    ours = raw.jpegdct_decode(stream)
    pil = np.asarray(Image.open(_io.BytesIO(stream)))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_jpegdct_progressive_rejected():
    img = np.zeros((16, 16), np.uint8)
    stream = _pil_jpeg(img, "L", quality=90, progressive=True)
    with pytest.raises(raw.RawError, match="unsupported JPEG feature"):
        raw.jpegdct_decode(stream)


def test_jpegdct_subsampled_rejected():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    stream = _pil_jpeg(rgb, "RGB", quality=90, subsampling=2)  # 4:2:0
    with pytest.raises(raw.RawError, match="unsupported JPEG feature"):
        raw.jpegdct_decode(stream)


def test_lossy_dng_gray_plumbing_exact(tmp_path):
    # DNG-level check: the 34892 path must equal an uncompressed 8-bit DNG
    # built from the decoder's own samples (decoder accuracy is separately
    # PIL-oracled above; this isolates the container plumbing).
    x = np.linspace(0, 2 * np.pi, 48)
    img = ((np.sin(x)[None, :] * np.cos(x * 0.7)[:, None]) * 90 + 128).astype(np.uint8)
    p1 = tmp_path / "lossy.dng"
    write_dng(p1, img, photometric=1, bits=8, compression=34892)
    decoded = raw.jpegdct_decode(_pil_jpeg(img, "L", quality=95, subsampling=0))
    p2 = tmp_path / "plain.dng"
    write_dng(p2, decoded, photometric=1, bits=8)
    assert np.array_equal(raw.load_dng(p1), raw.load_dng(p2))


def test_lossy_dng_linear_3ch_tiled(tmp_path):
    rng = np.random.default_rng(5)
    base = rng.integers(60, 196, (24, 32, 3)).astype(np.uint8)
    p = tmp_path / "lossy3.dng"
    write_dng(p, base, photometric=34892, bits=8, compression=34892,
              tile=(16, 8))
    out = codecs.load_image(p)
    assert out.shape == (24, 32, 4)
    # components survive the lossy round trip to within JPEG error; the
    # output is sRGB-encoded so allow the slope-amplified tolerance
    lin = base.astype(np.float32) / 255.0
    expect = np.clip(np.floor(_srgb(lin) * 255.0 + 0.5), 0, 255)
    assert np.abs(out[..., :3].astype(int) - expect.astype(int)).mean() < 6


def test_per_sample_black_white_preserving(tmp_path):
    """Per-sample BlackLevel on linear RGB must scale by the LARGEST black
    level so sensor-saturated pixels stay white (the min() it used to use
    left high-black channels short of 1.0 -> cyan whites)."""
    h, w = 8, 8
    img = np.full((h, w, 3), 4095, np.uint16)  # saturated everywhere
    extra = [(50714, 3, 3, [256, 0, 0])]       # per-sample BlackLevel
    p = tmp_path / "ps.dng"
    write_dng(p, img, photometric=34892, extra_tags=extra, white=4095)
    out = raw.load_dng(p)
    assert (out[..., :3] == 255).all(), "saturated input must stay white"
