"""Canon CR2 and Nikon NEF ingestion against synthesized containers.

The writers below build byte-exact little-endian TIFF containers with the
real structural quirks of each format (CR2's chained IFDs + absolute-offset
Canon MakerNote + vertical slices; NEF's CFA SubIFD with MSB-first packed
12/14-bit strips), so the readers are tested against independent forward
serializations — same philosophy as test_raw_dng.write_dng.
"""

import struct

import numpy as np
import pytest

from paintfe_tpu.io import codecs, raw
from tests.ljpeg_writer import encode_ljpeg


# ---------------------------------------------------------------------------
# generic little-endian TIFF renderer: multiple chained IFDs, cross-IFD
# pointer tags, out-of-line data blobs
# ---------------------------------------------------------------------------

def _render_tiff(ifds, blobs, magic_extra=b""):
    """ifds: list of (spec, next_index) where spec maps tag ->
    (typ, count, value); value may be ("ifd", i) / ("blob", i)
    placeholders resolved to absolute offsets; next_index (or None) sets
    the IFD's chained-next pointer.  Returns bytes."""
    specs, chain = zip(*ifds)
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 10: 8}
    header = 8 + len(magic_extra)

    # first pass: IFD offsets
    ifd_offsets = []
    pos = header
    for spec in specs:
        ifd_offsets.append(pos)
        pos += 2 + len(spec) * 12 + 4
    # out-of-line entry payloads next, then blobs
    payload_area = pos

    def encode_value(typ, count, value):
        if typ == 2:
            return value.encode().ljust(count, b"\0")
        if typ == 7:
            return bytes(value)
        if typ in (5, 10):
            f = "<II" if typ == 5 else "<ii"
            return b"".join(struct.pack(f, n, d) for n, d in value)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return struct.pack(f"<{count}{fmt}", *value)

    # resolve placeholders once blob offsets are known; two passes over
    # payloads (their sizes don't depend on resolved values)
    payload_sizes = []
    for spec in specs:
        for tag in sorted(spec):
            typ, count, value = spec[tag]
            total = sizes[typ] * count
            payload_sizes.append(total if total > 4 else 0)
    blob_start = payload_area + sum(payload_sizes)
    blob_offsets = []
    pos = blob_start
    for b in blobs:
        blob_offsets.append(pos)
        pos += len(b)

    def resolve(value):
        if isinstance(value, tuple) and len(value) == 2 and value[0] == "ifd":
            return [ifd_offsets[value[1]]]
        if isinstance(value, tuple) and len(value) == 2 and value[0] == "blob":
            return [blob_offsets[value[1]]]
        return value

    out = bytearray(b"II" + struct.pack("<HI", 42, header if specs else 0))
    out += magic_extra
    payload_pos = payload_area
    payloads = bytearray()
    for i, spec in enumerate(specs):
        out += struct.pack("<H", len(spec))
        for tag in sorted(spec):
            typ, count, value = spec[tag]
            data = encode_value(typ, count, resolve(value))
            if len(data) <= 4:
                out += struct.pack("<HHI", tag, typ, count) + data.ljust(4, b"\0")
            else:
                out += struct.pack("<HHII", tag, typ, count, payload_pos)
                payloads += data
                payload_pos += len(data)
        nxt = ifd_offsets[chain[i]] if chain[i] is not None else 0
        out += struct.pack("<I", nxt)
    out += payloads
    for b in blobs:
        out += b
    return bytes(out)


# ---------------------------------------------------------------------------
# CR2
# ---------------------------------------------------------------------------

def write_cr2(path, mosaic: np.ndarray, slices=None, sensor_info=None,
              wb_rggb=None, precision=14, colordata_count=1273):
    """Synthesize a CR2: IFD0 (Make + ExifIFD->MakerNote), raw IFD with a
    sliced lossless-JPEG stream (Compression=6, tag 0xc640)."""
    h, w = mosaic.shape
    if slices:
        n, wa, wb_ = slices
        widths = [wa] * n + [wb_]
        assert sum(widths) == w
        parts = []
        x0 = 0
        for sw in widths:
            parts.append(mosaic[:, x0:x0 + sw].reshape(-1))
            x0 += sw
        stream_samples = np.concatenate(parts).reshape(h, w)
    else:
        stream_samples = mosaic
    # encode as a 2-component frame (the Canon layout)
    lj = encode_ljpeg(stream_samples.reshape(h, w // 2, 2), precision)

    # Default ColorData6 layout (count 1273): WB_RGGBLevelsAsShot at
    # short-offset 63 — the decoder keys the layout on the element count,
    # so the count must be a recognized generation, not an arbitrary length
    colordata = [0] * colordata_count
    if wb_rggb:
        colordata[63:67] = list(wb_rggb)
    mn_spec = {
        0x00E0: (3, 17, list(sensor_info) if sensor_info else [17, w, h] + [0] * 14),
        0x4001: (3, len(colordata), colordata),
    }
    ifd0_spec = {
        271: (2, 6, "Canon"),
        34665: (4, 1, ("ifd", 1)),
    }
    raw_spec = {
        256: (4, 1, [w]),
        257: (4, 1, [h]),
        259: (3, 1, [6]),
        273: (4, 1, ("blob", 0)),
        279: (4, 1, [len(lj)]),
    }
    if slices:
        raw_spec[0xC640] = (3, 3, [slices[0], slices[1], slices[2]])

    # The Canon MakerNote is an IFD whose internal payload offsets are
    # absolute file offsets.  Embed the rendered MakerNote bytes as the
    # type-7 payload of Exif tag 0x927C; render twice so its internal
    # offsets match wherever the payload actually lands (layout is stable
    # because sizes don't change between passes).
    def render(mn_blob):
        exif = {0x927C: (7, len(mn_blob), list(mn_blob))}
        # chain: IFD0.next -> raw IFD (index 2); Exif reached by tag only
        return _render_tiff(
            [(ifd0_spec, 2), (exif, None), (raw_spec, None)],
            [lj],
            magic_extra=b"CR\x02\x00",
        )

    dummy_mn = _render_mn(mn_spec, 0)
    blob1 = render(dummy_mn)
    mn_off = blob1.find(dummy_mn)
    assert mn_off > 0
    final = render(_render_mn(mn_spec, mn_off))
    assert len(final) == len(blob1)
    with open(path, "wb") as fh:
        fh.write(final)


def _render_mn(spec, base_off):
    """Render a standalone IFD whose out-of-line payloads use absolute
    offsets assuming the IFD starts at `base_off` (Canon convention)."""
    out = bytearray(struct.pack("<H", len(spec)))
    payload_pos = base_off + 2 + len(spec) * 12 + 4
    payloads = bytearray()
    for tag in sorted(spec):
        typ, count, value = spec[tag]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        data = struct.pack(f"<{count}{fmt}", *value)
        if len(data) <= 4:
            out += struct.pack("<HHI", tag, typ, count) + data.ljust(4, b"\0")
        else:
            out += struct.pack("<HHII", tag, typ, count, payload_pos)
            payloads += data
            payload_pos += len(data)
    out += struct.pack("<I", 0)
    out += payloads
    return bytes(out)


def test_cr2_constant_field(tmp_path):
    h, w = 16, 24
    mosaic = np.full((h, w), 8000, np.uint16)
    p = tmp_path / "c.cr2"
    write_cr2(p, mosaic)
    out = codecs.load_image(p)
    assert out.shape == (h, w, 4)
    lin = 8000.0 / 16383.0
    expect = int(np.clip(np.floor(_srgb_scalar(lin) * 255 + 0.5), 0, 255))
    assert (np.abs(out[2:-2, 2:-2, :3].astype(int) - expect) <= 1).all()


def test_cr2_slices_reassemble(tmp_path):
    """Sliced and unsliced encodings of the same sensor decode equal."""
    rng = np.random.default_rng(21)
    h, w = 12, 30
    mosaic = rng.integers(0, 1 << 14, (h, w)).astype(np.uint16)
    p1 = tmp_path / "flat.cr2"
    p2 = tmp_path / "sliced.cr2"
    write_cr2(p1, mosaic)
    write_cr2(p2, mosaic, slices=(2, 10, 10))  # 2 slices of 10 + final 10
    a = raw.load_cr2(p1)
    b = raw.load_cr2(p2)
    assert np.array_equal(a, b)


def test_cr2_sensor_crop_and_black(tmp_path):
    """SensorInfo borders crop the active area and the masked left border
    sets the black level."""
    h, w = 20, 32
    full = np.full((h, w), 1000, np.uint16)   # masked region = black 1000
    full[2:18, 8:30] = 9000                   # active area
    # SensorInfo: [count, w, h, ?, ?, left, top, right, bottom, ...]
    si = [17, w, h, 0, 0, 8, 2, 29, 17] + [0] * 8
    p = tmp_path / "crop.cr2"
    write_cr2(p, full, sensor_info=si)
    out = raw.load_cr2(p)
    assert out.shape == (16, 22, 4)
    lin = (9000.0 - 1000.0) / (16383.0 - 1000.0)
    expect = int(np.clip(np.floor(_srgb_scalar(lin) * 255 + 0.5), 0, 255))
    assert (np.abs(out[2:-2, 2:-2, :3].astype(int) - expect) <= 1).all()


def test_cr2_as_shot_white_balance(tmp_path):
    """ColorData RGGB levels at offset 63 produce green-normalized gains:
    R level 2048 vs G 1024 -> red doubled relative to green."""
    h, w = 16, 16
    mosaic = np.full((h, w), 1500, np.uint16)  # headroom: 1500*2 < 4095
    p = tmp_path / "wb.cr2"
    write_cr2(p, mosaic, wb_rggb=(2048, 1024, 1024, 1536))
    out = codecs.load_image(p).astype(np.float32)
    inner = out[3:-3, 3:-3]
    assert inner[..., 0].mean() > inner[..., 2].mean() > inner[..., 1].mean()


def test_cr2_unknown_colordata_count_falls_back_to_unit_gains(tmp_path):
    """An unrecognized ColorData generation must NOT be probed for
    plausible-looking shorts: unit gains (neutral output) instead of a
    silent color cast."""
    h, w = 16, 16
    mosaic = np.full((h, w), 1500, np.uint16)
    p = tmp_path / "wbx.cr2"
    write_cr2(p, mosaic, wb_rggb=(2048, 1024, 1024, 1536), colordata_count=70)
    out = codecs.load_image(p).astype(np.float32)
    inner = out[3:-3, 3:-3]
    assert abs(inner[..., 0].mean() - inner[..., 1].mean()) < 1.0
    assert abs(inner[..., 2].mean() - inner[..., 1].mean()) < 1.0


def test_cr2_garbage_raises_codec_error(tmp_path):
    p = tmp_path / "x.cr2"
    p.write_bytes(b"II*\0" + b"\0" * 16)
    with pytest.raises(codecs.CodecError, match="CR magic"):
        codecs.load_image(p)


# ---------------------------------------------------------------------------
# NEF
# ---------------------------------------------------------------------------

def write_nef(path, mosaic: np.ndarray, bits=12, compression=1, wb_rb=None,
              wb_in_later_ifd=False):
    """Synthesize a NEF: IFD0 with Make + SubIFD holding the packed CFA;
    wb_rb=(R, B, G1, G2) adds a Nikon MakerNote ("Nikon\\0" header +
    embedded TIFF, offsets relative to the embedded header) with tag
    0x000c WB_RBLevels."""
    h, w = mosaic.shape
    if bits == 16:
        payload = mosaic.astype("<u2").tobytes()
    else:
        payload = _pack_bits_msb(mosaic.reshape(-1), bits)
    sub_spec = {
        254: (4, 1, [0]),
        256: (4, 1, [w]),
        257: (4, 1, [h]),
        258: (3, 1, [bits]),
        259: (3, 1, [compression]),
        262: (3, 1, [32803]),
        273: (4, 1, ("blob", 0)),
        277: (3, 1, [1]),
        279: (4, 1, [len(payload)]),
        33421: (3, 2, [2, 2]),
        33422: (1, 4, [1, 0, 2, 1]),  # GRBG (Nikon norm)
    }
    ifd0_spec = {
        254: (4, 1, [1]),  # thumbnail subfile
        271: (2, 18, "NIKON CORPORATION"),
        330: (4, 1, ("ifd", 1)),
    }
    ifds = [(ifd0_spec, None), (sub_spec, None)]
    if wb_rb is not None:
        # embedded self-contained TIFF: offsets relative to its own start
        mn_tiff = _render_tiff(
            [({0x000C: (5, 4, [(int(v * 100), 100) for v in wb_rb])}, None)],
            [])
        mn = b"Nikon\x00\x02\x10\x00\x00" + mn_tiff
        exif_spec = {0x927C: (7, len(mn), list(mn))}
        if wb_in_later_ifd:
            # IFD0's ExifIFD carries NO MakerNote; the raw SubIFD points at
            # the real one — the decoder must keep scanning past the dud
            ifd0_spec[34665] = (4, 1, ("ifd", 2))
            sub_spec[34665] = (4, 1, ("ifd", 3))
            ifds.append(({0x9000: (7, 4, list(b"0230"))}, None))
            ifds.append((exif_spec, None))
        else:
            ifd0_spec[34665] = (4, 1, ("ifd", 2))
            ifds.append((exif_spec, None))
    blob = _render_tiff(ifds, [payload])
    with open(path, "wb") as fh:
        fh.write(blob)


def _pack_bits_msb(samples: np.ndarray, bits: int) -> bytes:
    """MSB-first continuous bitstream (independent re-implementation)."""
    out = bytearray()
    acc = 0
    n = 0
    for v in samples:
        acc = (acc << bits) | int(v)
        n += bits
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("bits", [12, 14, 16])
def test_nef_packed_roundtrip(tmp_path, bits):
    rng = np.random.default_rng(31)
    h, w = 14, 18
    mosaic = rng.integers(0, 1 << bits, (h, w)).astype(np.uint16)
    p = tmp_path / f"p{bits}.nef"
    write_nef(p, mosaic, bits=bits)
    out = codecs.load_image(p)
    assert out.shape == (h, w, 4)
    # green sites pass through exactly: GRBG -> (0,0) and (1,1) are green
    white = float((1 << bits) - 1)
    g_sites = mosaic[0:h:2, 0:w:2] / white
    expect = np.clip(np.floor(_srgb_vec(g_sites) * 255 + 0.5), 0, 255)
    assert np.array_equal(out[0:h:2, 0:w:2, 1].astype(np.float64), expect)


def test_nef_as_shot_white_balance(tmp_path):
    """MakerNote 0x000c WB_RBLevels (R=2, B=1.5, G=1) shift the channel
    means: red > blue > green on a neutral mosaic."""
    mosaic = np.full((16, 16), 1200, np.uint16)  # headroom: 1200*2 < 4095
    p = tmp_path / "wb.nef"
    write_nef(p, mosaic, bits=12, wb_rb=(2.0, 1.5, 1.0, 1.0))
    out = codecs.load_image(p).astype(np.float32)
    inner = out[3:-3, 3:-3]
    assert inner[..., 0].mean() > inner[..., 2].mean() > inner[..., 1].mean()


def test_nef_wb_in_later_ifd(tmp_path):
    """A first ExifIFD without a Nikon MakerNote must not end the search:
    the WB in a later IFD's MakerNote is still found."""
    mosaic = np.full((16, 16), 1200, np.uint16)
    p = tmp_path / "wb2.nef"
    write_nef(p, mosaic, bits=12, wb_rb=(2.0, 1.5, 1.0, 1.0),
              wb_in_later_ifd=True)
    out = codecs.load_image(p).astype(np.float32)
    inner = out[3:-3, 3:-3]
    assert inner[..., 0].mean() > inner[..., 2].mean() > inner[..., 1].mean()


def test_nef_compressed_clear_error(tmp_path):
    mosaic = np.zeros((8, 8), np.uint16)
    p = tmp_path / "c.nef"
    write_nef(p, mosaic, bits=12, compression=34713)
    with pytest.raises(codecs.CodecError, match="Nikon-compressed"):
        codecs.load_image(p)


def test_camera_fuzz_never_crashes(tmp_path):
    """Mutations of CR2/NEF containers either decode or raise RawError."""
    rng = np.random.default_rng(77)
    mosaic = rng.integers(0, 1 << 14, (10, 12)).astype(np.uint16)
    c = tmp_path / "b.cr2"
    write_cr2(c, mosaic, slices=(1, 6, 6))
    n = tmp_path / "b.nef"
    write_nef(n, mosaic, bits=12)
    for base_path, loader in ((c, raw.load_cr2), (n, raw.load_nef)):
        base = bytearray(base_path.read_bytes())
        for trial in range(40):
            blob = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
            if rng.random() < 0.3:
                blob = blob[: int(rng.integers(4, len(blob)))]
            q = tmp_path / "fuzz.bin"
            q.write_bytes(bytes(blob))
            try:
                out = loader(q)
                assert out.dtype == np.uint8 and out.ndim == 3
            except raw.RawError:
                pass


def _srgb_scalar(v: float) -> float:
    return v * 12.92 if v <= 0.0031308 else 1.055 * v ** (1 / 2.4) - 0.055


def _srgb_vec(v: np.ndarray) -> np.ndarray:
    v = np.clip(v.astype(np.float32), 0, 1)
    lo = v * np.float32(12.92)
    hi = np.float32(1.055) * np.power(v, np.float32(1 / 2.4)) - np.float32(0.055)
    return np.where(v <= np.float32(0.0031308), lo, hi)


def test_cr2_dark_14bit_uses_sof3_precision():
    """A dark 14-bit CR2 whose samples all fit in 12 bits must normalize
    against the SOF3 precision (16383), not a value-derived guess — the
    old heuristic rendered such frames ~4x too bright."""
    h, w = 12, 16
    mosaic = np.full((h, w), 1000, np.uint16)  # <= 4095 everywhere
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "dark.cr2"
        write_cr2(p, mosaic, precision=14)
        out = raw.load_cr2(p)
    lin = 1000.0 / 16383.0
    expect = int(np.clip(np.floor(_srgb_scalar(lin) * 255 + 0.5), 0, 255))
    assert (np.abs(out[2:-2, 2:-2, :3].astype(int) - expect) <= 1).all()


def test_nef_odd_sample_count_minimal_payload(tmp_path):
    """Odd w*h packs into ceil(count*12/8) bytes — half a byte-triple
    short; the unpack must accept the minimal payload."""
    rng = np.random.default_rng(41)
    mosaic = rng.integers(0, 1 << 12, (9, 9)).astype(np.uint16)  # 81 samples
    p = tmp_path / "odd.nef"
    write_nef(p, mosaic, bits=12)
    out = codecs.load_image(p)
    assert out.shape == (9, 9, 4)
    white = 4095.0
    g = mosaic[0:9:2, 0:9:2] / white
    expect = np.clip(np.floor(_srgb_vec(g) * 255 + 0.5), 0, 255)
    assert np.array_equal(out[0:9:2, 0:9:2, 1].astype(np.float64), expect)
