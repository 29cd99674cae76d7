"""ARW / PEF / SRW / ORF / RW2 ingestion against synthesized containers.

Round-5 extension of the RAW scope rule: the TIFF-container uncompressed
and packed variants of these families ARE verifiable here because a
test-side encoder can forward-serialize their documented layouts — the
same philosophy as test_raw_camera's CR2/NEF writers and the LJPEG fuzz.
Proprietary entropy codings (Sony ARW2 curve, Pentax huffman, Panasonic
sync-coded bitstream) keep targeted errors, asserted below.
"""

import struct

import numpy as np
import pytest

from paintfe_tpu.io import codecs, raw
from tests.ljpeg_writer import encode_ljpeg
from tests.test_raw_camera import _pack_bits_msb, _render_tiff, _srgb_vec


def write_tiffep(path, mosaic: np.ndarray, bits=16, compression=1,
                 pattern=(0, 1, 1, 2), magic=None, neutral=None,
                 black=None, white=None, make="SONY"):
    """Synthesize a TIFF/EP CFA raw (the ARW/PEF/SRW/ORF shared shape):
    IFD0 with Make + a SubIFD holding the CFA strips.  `magic` overrides
    the TIFF version halfword (ORF's 'RO'/'SR')."""
    h, w = mosaic.shape
    if compression == 7:
        payload = encode_ljpeg(mosaic, bits)
    elif bits == 16:
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
        33422: (1, 4, list(pattern)),
    }
    if black is not None:
        sub_spec[50714] = (3, 1, [int(black)])
    if white is not None:
        sub_spec[50717] = (3, 1, [int(white)])
    if neutral is not None:
        sub_spec[50728] = (5, 3, [(int(v * 1000), 1000) for v in neutral])
    ifd0_spec = {
        254: (4, 1, [1]),
        271: (2, len(make) + 1, make),
        330: (4, 1, ("ifd", 1)),
    }
    blob = bytearray(_render_tiff([(ifd0_spec, None), (sub_spec, None)],
                                  [payload]))
    if magic is not None:
        struct.pack_into("<H", blob, 2, magic)
    with open(path, "wb") as fh:
        fh.write(bytes(blob))


def write_rw2(path, mosaic: np.ndarray, bits=12, cfa=1, borders=None,
              black=(0, 0, 0), red_bal=256, blue_bal=256, truncate=False):
    """Synthesize a Panasonic RW2: magic 85, sensor dims/borders, CFA
    enum, per-color blacks, balances x256, raw u16 data at tag 0x0118."""
    h, w = mosaic.shape
    top, left, bottom, right = borders or (0, 0, h, w)
    payload = mosaic.astype("<u2").tobytes()
    if truncate:
        payload = payload[: len(payload) // 2]
    spec = {
        0x0002: (3, 1, [w]),
        0x0003: (3, 1, [h]),
        0x0004: (3, 1, [top]),
        0x0005: (3, 1, [left]),
        0x0006: (3, 1, [bottom]),
        0x0007: (3, 1, [right]),
        0x0009: (3, 1, [cfa]),
        0x000A: (3, 1, [bits]),
        0x0011: (3, 1, [red_bal]),
        0x0012: (3, 1, [blue_bal]),
        0x001C: (3, 1, [black[0]]),
        0x001D: (3, 1, [black[1]]),
        0x001E: (3, 1, [black[2]]),
        0x0118: (4, 1, ("blob", 0)),
    }
    blob = bytearray(_render_tiff([(spec, None)], [payload]))
    struct.pack_into("<H", blob, 2, 85)
    with open(path, "wb") as fh:
        fh.write(bytes(blob))


FAMILY_LOADERS = {
    "arw": raw.load_arw, "pef": raw.load_pef,
    "srw": raw.load_srw, "orf": raw.load_orf,
}


@pytest.mark.parametrize("ext,bits", [
    ("arw", 16), ("arw", 14), ("pef", 12), ("pef", 16),
    ("srw", 12), ("srw", 16), ("orf", 12), ("orf", 16),
])
def test_tiffep_uncompressed_roundtrip(tmp_path, ext, bits):
    """Green CFA sites pass through exactly (RGGB: (0,1)/(1,0) green)."""
    rng = np.random.default_rng(hash(ext) % 1000 + bits)
    h, w = 14, 18
    mosaic = rng.integers(0, 1 << bits, (h, w)).astype(np.uint16)
    p = tmp_path / f"x.{ext}"
    magic = 0x4F52 if ext == "orf" else None
    write_tiffep(p, mosaic, bits=bits, magic=magic)
    out = codecs.load_image(p)
    assert out.shape == (h, w, 4)
    white = float((1 << bits) - 1)
    g_sites = mosaic[0:h:2, 1:w:2] / white
    expect = np.clip(np.floor(_srgb_vec(g_sites) * 255 + 0.5), 0, 255)
    assert np.array_equal(out[0:h:2, 1:w:2, 1].astype(np.float64), expect)


def test_orf_sr_magic_variant(tmp_path):
    mosaic = np.full((8, 10), 900, np.uint16)
    p = tmp_path / "sr.orf"
    write_tiffep(p, mosaic, bits=12, magic=0x5253, make="OLYMPUS")
    out = codecs.load_image(p)
    assert out.shape == (8, 10, 4)


def test_arw_lossless_jpeg(tmp_path):
    """Sony's newer lossless mode (Compression=7) reuses the SOF3 decoder
    validated against the independent test-side encoder."""
    rng = np.random.default_rng(5)
    h, w = 12, 16
    mosaic = rng.integers(0, 1 << 14, (h, w)).astype(np.uint16)
    p = tmp_path / "l.arw"
    q = tmp_path / "u.arw"
    write_tiffep(p, mosaic, bits=14, compression=7)
    write_tiffep(q, mosaic, bits=14, compression=1)
    # the LJPEG path must be bit-identical to the uncompressed path
    assert np.array_equal(codecs.load_image(p), codecs.load_image(q))


def test_tiffep_black_white_and_neutral(tmp_path):
    """DNG-style BlackLevel/WhiteLevel tags + AsShotNeutral WB shift the
    decode exactly like the DNG path."""
    mosaic = np.full((16, 16), 1200, np.uint16)
    p = tmp_path / "wb.arw"
    write_tiffep(p, mosaic, bits=12, black=100, white=3000,
                 neutral=(0.5, 1.0, 0.8))  # gains: R=2, B=1.25
    out = codecs.load_image(p).astype(np.float32)
    inner = out[3:-3, 3:-3]
    assert inner[..., 0].mean() > inner[..., 2].mean() > inner[..., 1].mean()
    # and the green sites still follow the documented normalize formula
    g = (1200.0 - 100.0) / (3000.0 - 100.0)
    expect = float(np.clip(np.floor(_srgb_vec(np.array([g])) * 255 + 0.5),
                           0, 255)[0])
    assert float(out[0, 1, 1]) == expect


@pytest.mark.parametrize("ext,comp,msg", [
    ("arw", 32767, "ARW2 curve-compressed"),
    ("pef", 65535, "Pentax-compressed"),
])
def test_proprietary_entropy_targeted_errors(tmp_path, ext, comp, msg):
    mosaic = np.zeros((8, 8), np.uint16)
    p = tmp_path / f"c.{ext}"
    write_tiffep(p, mosaic, bits=12, compression=comp)
    with pytest.raises(codecs.CodecError, match=msg):
        codecs.load_image(p)


def test_orf_short_strip_targeted_error(tmp_path):
    """Olympus mid-strip compression shows as a too-short payload for the
    declared raster: the error must say maker-compressed, not crash."""
    mosaic = np.full((8, 10), 500, np.uint16)
    p = tmp_path / "c.orf"
    write_tiffep(p, mosaic, bits=12, magic=0x4F52)
    blob = bytearray(p.read_bytes())
    # halve the strip byte count so the packed raster can't be satisfied
    short = blob[: len(blob) - 60]
    p.write_bytes(bytes(short))
    with pytest.raises(codecs.CodecError, match="maker-compressed|shorter"):
        codecs.load_image(p)


def test_rw2_basic_decode_and_cfa_enums(tmp_path):
    rng = np.random.default_rng(9)
    h, w = 12, 14
    mosaic = rng.integers(0, 1 << 12, (h, w)).astype(np.uint16)
    for cfa in (1, 2, 3, 4):
        p = tmp_path / f"p{cfa}.rw2"
        write_rw2(p, mosaic, cfa=cfa)
        out = codecs.load_image(p)
        assert out.shape == (h, w, 4)
    # enum 1 = RGGB: green sites at (0,1) pass through exactly
    p = tmp_path / "p1.rw2"
    out = codecs.load_image(p)
    white = float((1 << 12) - 1)
    g = mosaic[0:h:2, 1:w:2] / white
    expect = np.clip(np.floor(_srgb_vec(g) * 255 + 0.5), 0, 255)
    assert np.array_equal(out[0:h:2, 1:w:2, 1].astype(np.float64), expect)


def test_rw2_borders_blacks_balance(tmp_path):
    """Sensor borders crop (with CFA phase carry), per-color blacks
    subtract, and red/blue balances x256 apply."""
    h, w = 16, 20
    mosaic = np.full((h, w), 1000, np.uint16)
    p = tmp_path / "b.rw2"
    write_rw2(p, mosaic, borders=(1, 1, 13, 17), black=(64, 64, 64),
              red_bal=512, blue_bal=320)  # R x2.0, B x1.25
    out = codecs.load_image(p).astype(np.float32)
    assert out.shape == (12, 16, 4)
    inner = out[3:-3, 3:-3]
    assert inner[..., 0].mean() > inner[..., 2].mean() > inner[..., 1].mean()
    # cropped origin is (1,1): enum-1 RGGB phase-rolled makes (0,0) a
    # B site of the original pattern; green expectation at (0,1)
    g = (1000.0 - 64.0) / (4095.0 - 64.0)
    expect = float(np.clip(np.floor(_srgb_vec(np.array([g])) * 255 + 0.5),
                           0, 255)[0])
    assert float(out[1, 0, 1]) == expect


def test_rw2_packed_targeted_error(tmp_path):
    mosaic = np.full((10, 12), 800, np.uint16)
    p = tmp_path / "t.rw2"
    write_rw2(p, mosaic, truncate=True)
    with pytest.raises(codecs.CodecError, match="sync-coded"):
        codecs.load_image(p)


def test_rwl_routes_to_rw2(tmp_path):
    mosaic = np.full((8, 10), 700, np.uint16)
    p = tmp_path / "l.rwl"
    write_rw2(p, mosaic)
    assert codecs.load_image(p).shape == (8, 10, 4)


def test_families_fuzz_never_crash(tmp_path):
    """Byte mutations of every new container either decode or raise
    CodecError/RawError — never an unhandled crash (CLI keep-going)."""
    rng = np.random.default_rng(123)
    mosaic = rng.integers(0, 1 << 12, (10, 12)).astype(np.uint16)
    paths = []
    for ext in ("arw", "pef", "srw"):
        p = tmp_path / f"f.{ext}"
        write_tiffep(p, mosaic, bits=12)
        paths.append(p)
    p = tmp_path / "f.orf"
    write_tiffep(p, mosaic, bits=12, magic=0x4F52)
    paths.append(p)
    p = tmp_path / "f.rw2"
    write_rw2(p, mosaic)
    paths.append(p)
    for base_path in paths:
        base = bytearray(base_path.read_bytes())
        for trial in range(25):
            blob = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                blob[int(rng.integers(0, len(blob)))] = int(
                    rng.integers(0, 256))
            if rng.random() < 0.3:
                blob = blob[: int(rng.integers(8, len(blob)))]
            base_path.write_bytes(bytes(blob))
            try:
                codecs.load_image(base_path)
            except codecs.CodecError:
                pass
        base_path.write_bytes(bytes(base))
        codecs.load_image(base_path)  # the pristine file still decodes
