"""Golden-image assertion harness.

Mirrors the reference's tests/common/mod.rs: compare against the committed
golden PNGs pixel-exactly (or within GOLDEN_TOLERANCE), dump failure
artifacts (actual + red/green diff) to tests/output/.

The golden corpus is the *reference's* tests/golden tree (147 PNGs) — the
parity oracle.  Its location comes from PAINTFE_GOLDEN_DIR, defaulting to
the read-only reference mount.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
from PIL import Image

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
GOLDEN_DIR = pathlib.Path(
    os.environ.get("PAINTFE_GOLDEN_DIR", "/root/reference/tests/golden")
)
OUTPUT_DIR = REPO_ROOT / "tests" / "output"


def golden_tolerance() -> int:
    return int(os.environ.get("GOLDEN_TOLERANCE", "0"))


def load_png(path) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGBA"), np.uint8)


def save_png(path, img: np.ndarray):
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.asarray(img, np.uint8), "RGBA").save(path)


def golden_path(category: str, name: str) -> pathlib.Path:
    return GOLDEN_DIR / category / f"{name}.png"


def diff_image(actual: np.ndarray, expected: np.ndarray) -> np.ndarray:
    h = max(actual.shape[0], expected.shape[0])
    w = max(actual.shape[1], expected.shape[1])
    out = np.zeros((h, w, 4), np.uint8)
    ha, wa = actual.shape[:2]
    he, we = expected.shape[:2]
    hh, ww = min(ha, he), min(wa, we)
    d = np.abs(
        actual[:hh, :ww].astype(np.int16) - expected[:hh, :ww].astype(np.int16)
    ).max(axis=-1)
    out[:hh, :ww, 1] = np.where(d == 0, 64, 0)
    out[:hh, :ww, 0] = np.where(d > 0, np.minimum(64 + d * 3, 255), 0).astype(np.uint8)
    out[:hh, :ww, 3] = 255
    return out


def assert_golden(category: str, name: str, actual, tolerance: int | None = None):
    """Compare `actual` (u8 [H,W,4]) against golden {category}/{name}.png."""
    import pytest

    actual = np.asarray(actual, np.uint8)
    path = golden_path(category, name)
    if os.environ.get("GENERATE_GOLDEN"):
        # Regenerate mode (reference tests/common/mod.rs honors the same
        # env var): write `actual` as the new golden and pass.  Requires a
        # writable PAINTFE_GOLDEN_DIR (the default reference mount is RO).
        save_png(path, actual)
        return
    if not path.exists():
        pytest.skip(f"golden not found: {path}")
    expected = load_png(path)
    tol = golden_tolerance() if tolerance is None else tolerance

    if actual.shape != expected.shape:
        _dump(category, name, actual, expected)
        raise AssertionError(
            f"{category}/{name}: dimensions {actual.shape} vs {expected.shape}"
        )

    d = np.abs(actual.astype(np.int16) - expected.astype(np.int16))
    pixel_max = d.max(axis=-1)
    bad = pixel_max > tol
    if bad.any():
        _dump(category, name, actual, expected)
        n_bad = int(bad.sum())
        total = bad.size
        raise AssertionError(
            f"FAILED {category}/{name}: {n_bad}/{total} pixels "
            f"({100.0 * n_bad / total:.2f}%) differ, max channel diff "
            f"{int(pixel_max.max())}, tolerance {tol}; artifacts in tests/output/"
        )


def _dump(category, name, actual, expected):
    OUTPUT_DIR.mkdir(parents=True, exist_ok=True)
    save_png(OUTPUT_DIR / f"{category}_{name}_actual.png", actual)
    save_png(OUTPUT_DIR / f"{category}_{name}_diff.png", diff_image(actual, expected))
