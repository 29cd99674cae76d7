"""Background-removal pipeline under a fake ONNX session.

onnxruntime is not installed in CI; the injectable session exercises the
whole numeric pipeline anyway (ai.rs:178-447 keeps the reference's OrtApi
surface exercised the same way — these tests are the Python analogue)."""

import numpy as np
import pytest

from paintfe_tpu.ops import ai


class FakeInput:
    name = "input_image"


class FakeSession:
    """Session double: records the feed, returns a canned output."""

    def __init__(self, output_fn):
        self.output_fn = output_fn
        self.last_feed = None

    def get_inputs(self):
        return [FakeInput()]

    def run(self, _outs, feeds):
        self.last_feed = feeds
        x = feeds["input_image"]
        return [self.output_fn(x)]


def _img(h=20, w=30):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 4), np.uint8)
    img[..., 3] = 255
    return img


def test_preprocess_layout_and_normalization():
    sess = FakeSession(lambda x: np.zeros((1, 1, 8, 8), np.float32))
    br = ai.BackgroundRemover(model_kind="u2net", session=sess)
    assert br.size == 320
    img = np.zeros((10, 10, 4), np.uint8)
    img[..., 0] = 255  # pure red
    img[..., 3] = 255
    x = br.preprocess(img)
    assert x.shape == (1, 3, 320, 320)
    # ImageNet normalization: red channel (1-0.485)/0.229, green (0-0.456)/0.224
    assert np.allclose(x[0, 0], (1.0 - 0.485) / 0.229, atol=1e-5)
    assert np.allclose(x[0, 1], (0.0 - 0.456) / 0.224, atol=1e-5)
    assert np.allclose(x[0, 2], (0.0 - 0.406) / 0.225, atol=1e-5)


def test_model_kind_sets_input_size():
    sess = FakeSession(lambda x: np.zeros((1, 1, 4, 4), np.float32))
    for kind, size in (("birefnet", 1024), ("u2net", 320), ("isnet", 1024),
                       ("unknown", 320)):
        br = ai.BackgroundRemover(model_kind=kind, session=sess)
        assert br.size == size


def test_postprocess_sigmoid_applied_to_logits():
    sess = FakeSession(lambda x: None)
    br = ai.BackgroundRemover(session=sess)
    logits = np.array([[[[-20.0, 0.0], [0.0, 20.0]]]], np.float32)
    mask = br.postprocess(logits, 2, 2)
    # sigmoid then min-max: corners ~0 and ~1, center 0.5ish
    assert mask.shape == (2, 2)
    assert mask[0, 0] < 0.01 and mask[1, 1] > 0.99


def test_postprocess_passthrough_for_probabilities():
    sess = FakeSession(lambda x: None)
    br = ai.BackgroundRemover(session=sess)
    probs = np.array([[[[0.25, 0.75], [0.25, 0.75]]]], np.float32)
    mask = br.postprocess(probs, 2, 2)
    # already in [0,1]: NO sigmoid, just min-max to [0,1]
    assert mask[0, 0] == 0.0 and mask[0, 1] == 1.0


def test_postprocess_constant_mask_no_divide_by_zero():
    sess = FakeSession(lambda x: None)
    br = ai.BackgroundRemover(session=sess)
    mask = br.postprocess(np.full((1, 1, 4, 4), 0.5, np.float32), 8, 8)
    # constant in, constant out (within the u8 resize quantization step)
    assert np.all(mask == mask[0, 0])
    assert abs(float(mask[0, 0]) - 0.5) <= 1.0 / 255.0


def test_remove_background_multiplies_alpha():
    # model: salient = left half (probability 1), background = right half
    def out_fn(x):
        m = np.zeros((1, 1, 320, 320), np.float32)
        m[..., :160] = 1.0
        return m

    sess = FakeSession(out_fn)
    br = ai.BackgroundRemover(model_kind="u2net", session=sess)
    img = _img(16, 32)
    out = br.remove_background(img)
    assert out.shape == img.shape
    assert out.dtype == np.uint8
    assert np.array_equal(out[..., :3], img[..., :3])  # RGB untouched
    assert (out[:, :4, 3] == 255).all()    # deep inside salient half
    assert (out[:, -4:, 3] == 0).all()     # deep inside background half
    # the session saw an NCHW float input of the model size
    assert sess.last_feed["input_image"].shape == (1, 3, 320, 320)


def test_remove_background_threshold_binarizes():
    def out_fn(x):
        m = np.linspace(0, 1, 320 * 320, dtype=np.float32).reshape(1, 1, 320, 320)
        return m

    sess = FakeSession(out_fn)
    br = ai.BackgroundRemover(session=sess)
    img = _img(10, 10)
    out = br.remove_background(img, threshold=0.5)
    assert set(np.unique(out[..., 3])).issubset({0, 255})


def test_missing_onnxruntime_is_gated():
    import importlib.util

    if importlib.util.find_spec("onnxruntime") is not None:
        pytest.skip("onnxruntime installed here")
    assert not ai.available()
    with pytest.raises(ai.AiUnavailable, match="onnxruntime"):
        ai.BackgroundRemover(model_path="/nonexistent.onnx")
