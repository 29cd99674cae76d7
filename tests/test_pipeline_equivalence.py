"""Traced-vs-interpreted script equivalence, per op.

parallel/pipeline.py freezes some host-API defaults into _OP_TABLE
(sharpen radius 1.0, noise type+seed, halftone angle, oil levels...).
This suite makes divergence unrepresentable: every op in the table runs
as a one-op script through BOTH the tracer (trace_script ->
compile_pipeline) and the host interpreter (execute_script_sync), and the
outputs must be bit-identical.  Contract: scripting.rs:822-1165 — the
script API is one surface regardless of execution strategy.
"""

import numpy as np
import pytest

from paintfe_tpu.core import fixtures
from paintfe_tpu.parallel import pipeline
from paintfe_tpu.scripting import execute_script_sync

H = W = 64

# one-op scripts with representative (non-default where possible) params
_SCRIPTS = {
    "apply_blur": "apply_blur(2.0);",
    "apply_box_blur": "apply_box_blur(3);",
    "apply_motion_blur": "apply_motion_blur(45.0, 10.0);",
    "apply_sharpen": "apply_sharpen(0.8);",
    "apply_reduce_noise": "apply_reduce_noise(30.0);",
    "apply_median": "apply_median(2);",
    "apply_invert": "apply_invert();",
    "apply_desaturate": "apply_desaturate();",
    "apply_sepia": "apply_sepia();",
    "apply_sepia_strength": "apply_sepia(0.5);",
    "apply_brightness_contrast": "apply_brightness_contrast(30.0, 20.0);",
    "apply_exposure": "apply_exposure(1.0);",
    "apply_levels": "apply_levels(20.0, 235.0, 1.2);",
    "apply_noise": "apply_noise(25.0, false);",
    "apply_noise_mono": "apply_noise(25.0, true);",
    "apply_pixelate": "apply_pixelate(5);",
    "apply_crystallize": "apply_crystallize(8);",
    "apply_bulge": "apply_bulge(0.5);",
    "apply_twist": "apply_twist(60.0);",
    "apply_glow": "apply_glow(3.0, 0.6);",
    "apply_vignette": "apply_vignette(0.6, 0.8);",
    "apply_halftone": "apply_halftone(6.0);",
    "apply_ink": "apply_ink(50.0, 40.0);",
    "apply_oil_painting": "apply_oil_painting(3);",
    "flip_horizontal": "flip_horizontal();",
    "flip_vertical": "flip_vertical();",
    "rotate_180": "rotate_180();",
}


def test_scripts_cover_whole_op_table():
    """Every _OP_TABLE op has an equivalence case (new ops must add one)."""
    covered = {k.replace("_strength", "").replace("_mono", "")
               for k in _SCRIPTS}
    assert covered == set(pipeline._OP_TABLE)


@pytest.mark.parametrize("case", sorted(_SCRIPTS))
def test_traced_matches_interpreted(case):
    source = _SCRIPTS[case]
    img = np.asarray(fixtures.test_gradient(H, W))

    interpreted, w, h, _console, _ops = execute_script_sync(
        source, img, W, H, None)
    interpreted = np.asarray(interpreted).reshape(h, w, 4)

    ops = pipeline.trace_script(source)
    assert len(ops) == 1
    traced = np.asarray(pipeline.compile_pipeline(ops)(img))

    assert traced.shape == interpreted.shape
    assert np.array_equal(traced, interpreted), (
        f"{case}: traced chain diverged from the host interpreter "
        f"(max delta {np.abs(traced.astype(int) - interpreted.astype(int)).max()})")
