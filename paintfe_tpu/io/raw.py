"""Minimal RAW camera ingestion: the DNG (TIFF-container) path.

The reference reads ten RAW families through the `rawloader` crate
(src/io.rs:36-80).  That decoder stack doesn't exist in this environment,
so this module implements the common-interchange subset natively: DNG
files whose raw IFD is **uncompressed** (Compression=1), either linear
RGB/gray (PhotometricInterpretation 34892 LinearRaw / 2 RGB / 1 gray) or
a 2x2 CFA mosaic (32803) with bilinear demosaic.  Lossless-JPEG and
tiled DNGs, and the proprietary formats (CR2/CR3/NEF/ARW/ORF/RW2/SRW/
PEF/RAF), raise a clear CodecError naming what's missing.

Pipeline (host-side, numpy): black-level subtract -> white-level
normalize -> (CFA) white balance from AsShotNeutral + bilinear
demosaic -> sRGB encode -> RGBA u8.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

f32 = np.float32

# TIFF tag ids
T_NEW_SUBFILE_TYPE = 254
T_WIDTH = 256
T_HEIGHT = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SPP = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279
T_PLANAR = 284
T_SUB_IFDS = 330
T_CFA_DIM = 33421
T_CFA_PATTERN = 33422
T_DNG_VERSION = 50706
T_BLACK_LEVEL = 50714
T_WHITE_LEVEL = 50717
T_AS_SHOT_NEUTRAL = 50728

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}


class RawError(Exception):
    pass


def _read_values(blob: bytes, end: str, typ: int, count: int,
                 value_field: bytes):
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = value_field[:total]
    else:
        (off,) = struct.unpack(end + "I", value_field)
        data = blob[off:off + total]
    if typ in (1, 6, 7):
        return list(data)
    if typ == 3:
        return list(struct.unpack(end + f"{count}H", data))
    if typ == 8:
        return list(struct.unpack(end + f"{count}h", data))
    if typ in (4, 9):
        return list(struct.unpack(end + f"{count}{'I' if typ == 4 else 'i'}", data))
    if typ in (5, 10):
        fmtc = "I" if typ == 5 else "i"
        raw = struct.unpack(end + f"{2 * count}{fmtc}", data)
        return [raw[2 * i] / raw[2 * i + 1] if raw[2 * i + 1] else 0.0
                for i in range(count)]
    if typ == 11:
        return list(struct.unpack(end + f"{count}f", data))
    if typ == 12:
        return list(struct.unpack(end + f"{count}d", data))
    return None


def _parse_ifd(blob: bytes, end: str, off: int) -> Tuple[Dict[int, list], int]:
    (n_tags,) = struct.unpack(end + "H", blob[off:off + 2])
    tags = {}
    for k in range(n_tags):
        base = off + 2 + k * 12
        tag, typ, count = struct.unpack(end + "HHI", blob[base:base + 8])
        vals = _read_values(blob, end, typ, count, blob[base + 8:base + 12])
        if vals is not None:
            tags[tag] = vals
    (nxt,) = struct.unpack(end + "I", blob[off + 2 + n_tags * 12:
                                           off + 2 + n_tags * 12 + 4])
    return tags, nxt


def _all_ifds(blob: bytes) -> Tuple[str, List[Dict[int, list]]]:
    if blob[:2] == b"II":
        end = "<"
    elif blob[:2] == b"MM":
        end = ">"
    else:
        raise RawError("not a TIFF container")
    (magic,) = struct.unpack(end + "H", blob[2:4])
    if magic != 42:
        raise RawError("not a TIFF container (bad magic)")
    (off,) = struct.unpack(end + "I", blob[4:8])
    ifds: List[Dict[int, list]] = []
    seen = set()
    stack = [off]
    while stack:
        o = stack.pop()
        if not o or o in seen or o + 2 > len(blob):
            continue
        seen.add(o)
        tags, nxt = _parse_ifd(blob, end, o)
        ifds.append(tags)
        if nxt:
            stack.append(nxt)
        for sub in tags.get(T_SUB_IFDS, []):
            stack.append(sub)
    return end, ifds


def _pick_raw_ifd(ifds: List[Dict[int, list]]) -> Dict[int, list]:
    """The raw image: NewSubfileType==0 if tagged, else the largest area."""
    def area(t):
        return t.get(T_WIDTH, [0])[0] * t.get(T_HEIGHT, [0])[0]

    candidates = [t for t in ifds if t.get(T_NEW_SUBFILE_TYPE, [0])[0] == 0
                  and area(t) > 0]
    if not candidates:
        candidates = [t for t in ifds if area(t) > 0]
    if not candidates:
        raise RawError("no image IFD found")
    return max(candidates, key=area)


def _read_samples(blob: bytes, end: str, tags: Dict[int, list]) -> np.ndarray:
    w = tags[T_WIDTH][0]
    h = tags[T_HEIGHT][0]
    bits = tags.get(T_BITS, [16])[0]
    spp = tags.get(T_SPP, [1])[0]
    comp = tags.get(T_COMPRESSION, [1])[0]
    if comp == 7:
        raise RawError("lossless-JPEG-compressed DNG is not supported "
                       "(only Compression=1 uncompressed)")
    if comp != 1:
        raise RawError(f"DNG compression {comp} is not supported "
                       "(only Compression=1 uncompressed)")
    if tags.get(T_PLANAR, [1])[0] != 1:
        raise RawError("planar DNG layout is not supported")
    if bits not in (8, 16):
        raise RawError(f"{bits}-bit DNG samples are not supported")
    offsets = tags.get(T_STRIP_OFFSETS)
    counts = tags.get(T_STRIP_COUNTS)
    if not offsets or not counts:
        raise RawError("tiled DNGs are not supported (no strip offsets)")
    payload = b"".join(blob[o:o + c] for o, c in zip(offsets, counts))
    dt = np.dtype(("<" if end == "<" else ">") + ("u2" if bits == 16 else "u1"))
    need = w * h * spp
    arr = np.frombuffer(payload, dt, count=need).astype(np.float32)
    return arr.reshape(h, w, spp) if spp > 1 else arr.reshape(h, w)


def _srgb_encode(linear: np.ndarray) -> np.ndarray:
    linear = np.clip(linear, 0.0, 1.0)
    lo = linear * f32(12.92)
    hi = f32(1.055) * np.power(linear, f32(1.0 / 2.4)) - f32(0.055)
    return np.where(linear <= f32(0.0031308), lo, hi)


def _demosaic_bilinear(mosaic: np.ndarray, pattern: np.ndarray) -> np.ndarray:
    """[H, W] normalized CFA -> [H, W, 3] via normalized 3x3 interpolation."""
    h, w = mosaic.shape
    ph, pw = pattern.shape
    ys, xs = np.mgrid[0:h, 0:w]
    cfa_idx = pattern[ys % ph, xs % pw]  # 0=R 1=G 2=B
    kernel = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32)

    def conv3(a):
        p = np.pad(a, 1, mode="edge")
        out = np.zeros_like(a)
        for dy in range(3):
            for dx in range(3):
                out += kernel[dy, dx] * p[dy:dy + h, dx:dx + w]
        return out

    planes = []
    for c in range(3):
        mask = (cfa_idx == c).astype(np.float32)
        num = conv3(mosaic * mask)
        den = conv3(mask)
        planes.append(num / np.maximum(den, 1e-9))
    return np.stack(planes, axis=-1)


def load_dng(path) -> np.ndarray:
    """Decode a minimal DNG into RGBA u8 [H, W, 4]."""
    with open(path, "rb") as fh:
        blob = fh.read()
    try:
        return _decode_dng(blob)
    except RawError:
        raise
    except (struct.error, KeyError, ValueError, IndexError) as e:
        # truncated/malformed containers must surface as RawError so the
        # CLI's per-file keep-going handling applies (not a crash)
        raise RawError(f"malformed DNG: {type(e).__name__}: {e}")


def _decode_dng(blob: bytes) -> np.ndarray:
    end, ifds = _all_ifds(blob)
    if not any(T_DNG_VERSION in t for t in ifds):
        # Plain TIFFs also land here via the normal codec; be explicit.
        raise RawError("no DNGVersion tag — not a DNG")
    tags = _pick_raw_ifd(ifds)
    data = _read_samples(blob, end, tags)
    bits = tags.get(T_BITS, [16])[0]
    photometric = tags.get(T_PHOTOMETRIC, [1])[0]

    black = tags.get(T_BLACK_LEVEL, [0.0])
    white = tags.get(T_WHITE_LEVEL, [float(2 ** bits - 1)])
    black0 = f32(black[0])
    white0 = f32(white[0])
    scale = f32(1.0) / np.maximum(white0 - black0, f32(1.0))
    norm = np.clip((data.astype(np.float32) - black0) * scale, 0.0, 1.0)

    if photometric == 32803:  # CFA mosaic
        dim = tags.get(T_CFA_DIM, [2, 2])
        pat = tags.get(T_CFA_PATTERN)
        if pat is None or dim[0] != 2 or dim[1] != 2:
            raise RawError("only 2x2 CFA patterns are supported")
        pattern = np.array(pat, np.int32).reshape(2, 2)
        neutral = tags.get(T_AS_SHOT_NEUTRAL, [1.0, 1.0, 1.0])
        wb = np.array([1.0 / max(n, 1e-6) for n in neutral], np.float32)
        wb = wb / max(wb[1], 1e-6)  # green-normalized camera multipliers
        ys, xs = np.mgrid[0:norm.shape[0], 0:norm.shape[1]]
        gains = wb[pattern[ys % 2, xs % 2]]
        rgb = _demosaic_bilinear(np.clip(norm * gains, 0.0, 1.0), pattern)
    elif photometric == 34892 or photometric == 2:  # LinearRaw / RGB
        if data.ndim != 3 or data.shape[2] < 3:
            raise RawError("linear DNG without 3 samples per pixel")
        rgb = norm[..., :3]
    elif photometric == 1:  # linear grayscale
        rgb = np.repeat(norm[..., None], 3, axis=-1)
    else:
        raise RawError(f"DNG photometric interpretation {photometric} "
                       "is not supported")

    out8 = np.clip(np.floor(_srgb_encode(rgb) * f32(255.0) + f32(0.5)),
                   0, 255).astype(np.uint8)
    h, w = out8.shape[:2]
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[..., :3] = out8
    rgba[..., 3] = 255
    return rgba
