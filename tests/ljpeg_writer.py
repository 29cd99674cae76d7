"""Test-support lossless-JPEG (SOF3) *encoder*.

Forward-direction implementation of ITU-T T.81 process 14, written from
the spec so the native decoder (paintfe_tpu/native/ljpeg.cpp) is tested
against an independent serialization — same role write_dng plays for the
TIFF container in test_raw_dng.py.  Fixed canonical Huffman table over
SSSS categories 0-16, predictors 1-7, point transform, optional restart
intervals, 0xFF byte stuffing.
"""

from __future__ import annotations

import numpy as np

# Code lengths for SSSS symbols 0..16 (canonical, Kraft sum < 1 so the
# all-ones code never occurs).
_CODE_LENGTHS = [2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]


def _build_huffman():
    """Canonical code assignment: (code, length) per SSSS symbol."""
    order = sorted(range(17), key=lambda s: (_CODE_LENGTHS[s], s))
    codes = {}
    code = 0
    prev_len = 0
    for sym in order:
        length = _CODE_LENGTHS[sym]
        code <<= length - prev_len
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


_CODES = _build_huffman()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def pad_to_byte(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-fill


def _dht_segment():
    bits = [0] * 17
    for length in _CODE_LENGTHS:
        bits[length] += 1
    order = sorted(range(17), key=lambda s: (_CODE_LENGTHS[s], s))
    payload = bytes([0x00] + bits[1:] + order)
    return b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_ljpeg(samples: np.ndarray, precision: int, predictor: int = 1,
                 pt: int = 0, restart_rows: int = 0) -> bytes:
    """Encode (H, W) or (H, W, C) uint16 samples as a lossless JPEG.

    `restart_rows` > 0 inserts a restart marker every that-many sample
    rows (DRI = restart_rows * W MCUs).
    """
    arr = np.asarray(samples, np.int64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    assert nc <= 4 and 2 <= precision <= 16
    if pt:
        arr = arr >> pt  # encoder divides; decoder shifts back up

    head = bytearray(b"\xff\xd8")
    head += _dht_segment()
    if restart_rows:
        head += b"\xff\xdd\x00\x04" + (restart_rows * w).to_bytes(2, "big")
    sof = bytearray([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    head += b"\xff\xc3" + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytearray([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    head += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    bw = _BitWriter()
    defval = 1 << (precision - pt - 1)
    recon = np.zeros((h, w, nc), np.int64)
    next_rst = 0
    fresh_row = 0
    for y in range(h):
        if restart_rows and y and y % restart_rows == 0:
            bw.pad_to_byte()
            bw.out += bytes([0xFF, 0xD0 + next_rst])
            next_rst = (next_rst + 1) & 7
            fresh_row = y
        for x in range(w):
            for c in range(nc):
                if y == fresh_row and x == 0:
                    pred = defval
                elif y == fresh_row:
                    pred = recon[y, x - 1, c]
                elif x == 0:
                    pred = recon[y - 1, x, c]
                else:
                    ra = recon[y, x - 1, c]
                    rb = recon[y - 1, x, c]
                    rc = recon[y - 1, x - 1, c]
                    pred = {
                        1: ra, 2: rb, 3: rc,
                        4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                val = int(arr[y, x, c])
                recon[y, x, c] = val  # lossless: decoder reconstructs exactly
                d = (val - int(pred)) & 0xFFFF
                if d == 32768:
                    code, length = _CODES[16]
                    bw.put(code, length)
                    continue
                if d > 32768:
                    d -= 65536
                mag = abs(d)
                ssss = mag.bit_length()
                code, length = _CODES[ssss]
                bw.put(code, length)
                if ssss:
                    extra = d if d > 0 else d + (1 << ssss) - 1
                    bw.put(extra & ((1 << ssss) - 1), ssss)
    bw.pad_to_byte()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"
