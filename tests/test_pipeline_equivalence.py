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


def test_op_table_covered_by_arg_specs():
    """Every parameterized op in _OP_TABLE has an arg-conversion spec that
    mirrors the host API's validators (int-vs-float divergence guard)."""
    specs = pipeline._build_arg_specs()
    no_args = {"apply_invert", "apply_desaturate", "flip_horizontal",
               "flip_vertical", "rotate_180"}
    assert set(specs) == set(pipeline._OP_TABLE) - no_args


def test_traced_arg_validation_matches_interpreter():
    """apply_median(2.5) errors in the per-image path (_as_int); the traced
    path must reject it identically, not truncate to 2 (r4 review)."""
    from paintfe_tpu.scripting import ScriptError
    from paintfe_tpu.scripting.interp import RhaiRuntimeError

    img = np.asarray(fixtures.test_gradient(16, 16))
    for src in ("apply_median(2.5);", "apply_pixelate(1.5);",
                "apply_box_blur(2.5);", "apply_oil_painting(2.2);",
                "apply_crystallize(3.5);"):
        with pytest.raises(ScriptError):
            execute_script_sync(src, img.copy(), 16, 16, None)
        with pytest.raises(RhaiRuntimeError):
            pipeline.trace_script(src)


def test_dimension_derived_params_trace_per_bucket():
    """width()/height() must not silently read the 1x1 trace dummy: the
    dimension-blind trace bails, and a dims-aware trace records the REAL
    derived parameter (r4 review)."""
    src = "apply_pixelate(width() / 8);"
    with pytest.raises(pipeline.NotVectorizable):
        pipeline.trace_script(src)
    ops = pipeline.trace_script(src, dims=(64, 48))
    assert ops == [pipeline.PipelineOp("apply_pixelate", (8,))]

    # and the per-bucket traced output equals the interpreter's
    img = np.asarray(fixtures.test_gradient(64, 48))  # (w, h) -> [48, 64, 4]
    interpreted, w, h, _c, _o = execute_script_sync(src, img.copy(), 64, 48, None)
    traced = np.asarray(pipeline.compile_pipeline(ops)(img))
    assert np.array_equal(traced, np.asarray(interpreted).reshape(h, w, 4))


def test_sharded_batch_keeps_going_on_bucket_failure(tmp_path, monkeypatch):
    """A failing bucket must fall back per-image instead of aborting the
    whole batch (keep-going semantics; in multi-host mode an abort would
    strand the peers in the exit-agreement collective)."""
    import types

    from PIL import Image

    from paintfe_tpu.parallel import batch as batch_mod

    for i in range(3):
        a = np.full((8, 8, 4), 10 * (i + 1), np.uint8)
        Image.fromarray(a, "RGBA").save(tmp_path / f"in{i}.png")
    outdir = tmp_path / "out"
    outdir.mkdir()

    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")

    monkeypatch.setattr(batch_mod, "run_batch", boom)
    args = types.SimpleNamespace(
        output=None, output_dir=str(outdir), quality=90, webp_lossy=False,
        tiff_compression="none", flatten=False, verbose=False)
    inputs = sorted(tmp_path.glob("in*.png"))
    rc = batch_mod.run_sharded_batch(inputs, args, "png", "apply_invert();")
    assert rc == 0  # per-image fallback succeeded for every file
    for i in range(3):
        out = np.asarray(Image.open(outdir / f"in{i}.png"))
        assert (out[..., 0] == 255 - 10 * (i + 1)).all()


def test_double_buffer_propagates_producer_errors():
    from paintfe_tpu.parallel.prefetch import DoubleBuffer

    def produce(i):
        if i == 1:
            raise RuntimeError("decode failed")
        return i

    items = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for item in DoubleBuffer(produce, 3):
            items.append(item)
    assert items == [0]  # slot 0 delivered; slot 1's failure surfaced


def test_partial_distributed_wiring_is_hard_error(monkeypatch):
    from paintfe_tpu.parallel import distributed

    monkeypatch.setenv("PAINTFE_COORDINATOR", "127.0.0.1:9999")
    monkeypatch.delenv("PAINTFE_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("PAINTFE_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="partial multi-process wiring"):
        distributed.maybe_initialize()
