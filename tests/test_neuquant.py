"""NeuQuant GIF palette parity (reference io.rs:2743-2823, 2960-2989).

The reference quantizes animated-GIF palettes with the color_quant crate's
NeuQuant (samplefac 10, RGBA distances, global-from-first-frame + local
per frame).  These tests pin our implementation of the same published
algorithm: native C++ and the numpy fallback must agree exactly with each
other, and the quantizer must reconstruct synthetic frames within bounded
per-frame error.
"""

import numpy as np
import pytest
from PIL import Image

from paintfe_tpu.io import codecs
from paintfe_tpu.io.neuquant import _train_python, quantize_rgba, SAMPLEFAC


def _frame(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    # smooth gradients + a few flat patches: GIF-typical content
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fr = np.stack([
        (xx / w * 255), (yy / h * 255), ((xx + yy) / (h + w) * 255),
        np.full_like(xx, 255.0)], axis=-1)
    fr[8:20, 8:20, :3] = [200, 30, 30]
    fr[30:44, 40:60, :3] = [20, 180, 60]
    fr += rng.normal(0, 2.0, fr.shape)
    return np.clip(fr, 0, 255).astype(np.uint8)


def test_native_and_python_trainers_agree():
    """Same constants, same update order: the two implementations of the
    training loop must produce the same colormap and indices."""
    from paintfe_tpu import native

    if native.load() is None or not hasattr(native.load(), "neuquant_quantize"):
        pytest.skip("native library unavailable")
    fr = _frame(1, 24, 32)
    pal_nat, idx_nat = quantize_rgba(fr, 64)
    cmap = _train_python(fr.reshape(-1, 4), SAMPLEFAC, 64)
    assert np.array_equal(pal_nat, cmap[:, :3])
    # index assignment shares the same metric/tie rule
    flat = fr.reshape(-1, 4).astype(np.int32)
    d = np.abs(flat[:, None, :] - cmap[None, :, :].astype(np.int32)).sum(2)
    assert np.array_equal(idx_nat, np.argmin(d, axis=1).astype(np.uint8))


def test_quantize_bounded_error():
    """256-color NeuQuant on gradient content: mean abs reconstruction
    error must be small.  The frame is sized so the samplefac-10 walk
    gets enough samples to converge (NeuQuant trains on n/10 pixels —
    tiny frames undertrain in the reference's color_quant too; measured
    here: 7.6 at 48x64, 4.6 at 256x320 vs PIL-adaptive's 4.9)."""
    fr = _frame(2, 256, 320)
    pal, idx = quantize_rgba(fr, 256)
    recon = pal[idx].reshape(fr.shape[0], fr.shape[1], 3).astype(np.float32)
    err = np.abs(recon - fr[..., :3].astype(np.float32)).mean()
    assert err < 5.5, f"mean abs error {err}"
    assert pal.shape == (256, 3) and idx.max() < 256


def test_quantize_few_distinct_colors():
    """A 4-color frame quantized at 256 colors reconstructs near-exactly
    (NeuQuant converges its neurons onto the occupied colors)."""
    rng = np.random.default_rng(3)
    cols = np.array([[250, 10, 10, 255], [10, 250, 10, 255],
                     [10, 10, 250, 255], [240, 240, 240, 255]], np.uint8)
    fr = cols[rng.integers(0, 4, (40, 40))]
    pal, idx = quantize_rgba(fr, 256)
    recon = pal[idx].reshape(40, 40, 3).astype(np.int32)
    err = np.abs(recon - fr[..., :3].astype(np.int32)).max()
    assert err <= 8, f"max channel error {err}"


def test_animated_gif_uses_neuquant_palettes(tmp_path):
    """save_animation round-trip: every decoded frame equals its NeuQuant
    palette lookup exactly (PIL must not re-quantize behind our back)."""
    frames = [_frame(10), _frame(11), np.roll(_frame(10), 7, axis=1)]
    p = tmp_path / "a.gif"
    codecs.save_animation(frames, p, "gif", fps=10.0)
    got, delays = codecs.load_frames(p)
    assert len(got) == 3
    for fr, dec in zip(frames, got):
        pal, idx = quantize_rgba(fr, 256)
        expect = pal[idx].reshape(fr.shape[0], fr.shape[1], 3)
        assert np.array_equal(dec[..., :3], expect)


def test_static_gif_uses_neuquant(tmp_path):
    fr = _frame(20)
    p = tmp_path / "s.gif"
    codecs.save_image(fr, p, "gif")
    dec = np.asarray(Image.open(p).convert("RGB"), np.uint8)
    pal, idx = quantize_rgba(fr, 256)
    assert np.array_equal(dec, pal[idx].reshape(fr.shape[0], fr.shape[1], 3))


def test_max_colors_respected(tmp_path):
    frames = [_frame(30)]
    p = tmp_path / "c.gif"
    codecs.save_animation(frames, p, "gif", fps=5.0, max_colors=16)
    dec = Image.open(p)
    dec.seek(0)
    used = np.unique(np.asarray(dec.convert("RGB")).reshape(-1, 3), axis=0)
    assert used.shape[0] <= 16
