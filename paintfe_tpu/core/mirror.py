"""Mirror-symmetry painting + CMYK soft proof.

Behavioral contract: src/canvas/mirror.rs (MirrorMode {None, Horizontal,
Vertical, Quarters}, mirrored stamp positions) and src/canvas/soft_proof.rs
(display-only RGB -> CMYK -> RGB proof).
"""

from __future__ import annotations

import enum
from typing import List, Tuple

import numpy as np

f32 = np.float32


class MirrorMode(enum.Enum):
    NONE = "none"
    HORIZONTAL = "horizontal"
    VERTICAL = "vertical"
    QUARTERS = "quarters"

    def next(self) -> "MirrorMode":
        order = [MirrorMode.NONE, MirrorMode.HORIZONTAL, MirrorMode.VERTICAL,
                 MirrorMode.QUARTERS]
        return order[(order.index(self) + 1) % 4]

    @property
    def is_active(self) -> bool:
        return self != MirrorMode.NONE

    def mirror_positions(self, x: float, y: float, w: int, h: int) -> List[Tuple[float, float]]:
        """Mirrored stamp positions; the original position comes first."""
        wf = float(w) - 1.0
        hf = float(h) - 1.0
        if self == MirrorMode.NONE:
            return [(x, y)]
        if self == MirrorMode.HORIZONTAL:
            return [(x, y), (wf - x, y)]
        if self == MirrorMode.VERTICAL:
            return [(x, y), (x, hf - y)]
        return [(x, y), (wf - x, y), (x, hf - y), (wf - x, hf - y)]


def rgb_to_cmyk(rgb: np.ndarray) -> np.ndarray:
    """RGB u8 [..., 3] -> CMYK f32 [..., 4] in [0, 1]."""
    c = 1.0 - rgb.astype(f32) / f32(255.0)
    k = c.min(axis=-1, keepdims=True)
    safe = np.maximum(1.0 - k, 1e-6)
    cmy = (c - k) / safe
    return np.concatenate([cmy, k], axis=-1).astype(f32)


def cmyk_to_rgb(cmyk: np.ndarray) -> np.ndarray:
    c, m, y, k = cmyk[..., 0], cmyk[..., 1], cmyk[..., 2], cmyk[..., 3]
    r = (1.0 - np.minimum(1.0, c * (1.0 - k) + k)) * 255.0
    g = (1.0 - np.minimum(1.0, m * (1.0 - k) + k)) * 255.0
    b = (1.0 - np.minimum(1.0, y * (1.0 - k) + k)) * 255.0
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def soft_proof_cmyk(img: np.ndarray) -> np.ndarray:
    """Display-only gamut proof: RGB -> CMYK -> RGB round-trip."""
    out = np.asarray(img, np.uint8).copy()
    out[..., 0:3] = cmyk_to_rgb(rgb_to_cmyk(out[..., 0:3]))
    return out
