"""AI background removal (BiRefNet / U2-Net / IS-Net via ONNX Runtime).

Behavioral contract: src/ops/ai.rs — the reference dlopens onnxruntime and
drives a hand-rolled OrtApi vtable (:178-447) to run saliency models whose
mask becomes the layer's alpha (README.md:106-112).  Here onnxruntime is an
optional Python dependency; absent, a clear gated error explains what to
install.  Pre/post-processing matches the standard recipes for these models
(resize to the model's square input, ImageNet-ish normalization, sigmoid
mask back-scaled and min-max normalized, applied to alpha).

The session is injectable (any object with `run` and `get_inputs`), so the
numeric pipeline runs under CI with a fake session where onnxruntime isn't
installed — mirroring how ai.rs keeps its whole OrtApi surface exercised.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

f32 = np.float32


class AiUnavailable(Exception):
    pass


_MODEL_INPUT_SIZES = {
    "birefnet": 1024,
    "u2net": 320,
    "isnet": 1024,
}


def _require_ort():
    try:
        import onnxruntime  # noqa: F401

        return onnxruntime
    except ImportError as e:
        raise AiUnavailable(
            "background removal needs the onnxruntime package (the reference "
            "dlopens libonnxruntime the same way); install onnxruntime and "
            "provide a BiRefNet/U2-Net/IS-Net .onnx model file"
        ) from e


@dataclasses.dataclass
class BackgroundRemover:
    """Saliency-mask background removal.

    `session` accepts any onnxruntime-InferenceSession-compatible object
    (`get_inputs() -> [obj with .name]`, `run(None, feeds) -> [array]`);
    when None, a real onnxruntime session is constructed from
    `model_path` (raising AiUnavailable if onnxruntime is missing).
    """

    model_path: str = ""
    model_kind: str = "u2net"  # birefnet | u2net | isnet
    session: Optional[Any] = None

    def __post_init__(self):
        if self.session is None:
            ort = _require_ort()
            self.session = ort.InferenceSession(
                self.model_path, providers=["CPUExecutionProvider"]
            )
        self.input_name = self.session.get_inputs()[0].name
        self.size = _MODEL_INPUT_SIZES.get(self.model_kind, 320)

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        """RGBA u8 [H, W, 4] -> normalized NCHW f32 [1, 3, S, S]."""
        from PIL import Image

        rgb = Image.fromarray(np.asarray(img)[..., 0:3], "RGB").resize(
            (self.size, self.size), Image.BILINEAR
        )
        x = np.asarray(rgb, f32) / f32(255.0)
        mean = np.array([0.485, 0.456, 0.406], f32)
        std = np.array([0.229, 0.224, 0.225], f32)
        x = (x - mean) / std
        return x.transpose(2, 0, 1)[None]  # NCHW

    def postprocess(self, out: np.ndarray, h: int, w: int) -> np.ndarray:
        """Raw model output -> f32 saliency mask [H, W] in [0, 1]:
        sigmoid when the output is in logit range, min-max normalize,
        resize back to the source size."""
        from PIL import Image

        mask = np.asarray(out).reshape(out.shape[-2], out.shape[-1]).astype(f32)
        if mask.min() < 0 or mask.max() > 1:
            mask = 1.0 / (1.0 + np.exp(-mask))
        lo, hi = float(mask.min()), float(mask.max())
        if hi > lo:
            mask = (mask - lo) / (hi - lo)
        back = Image.fromarray((mask * 255).astype(np.uint8), "L").resize(
            (w, h), Image.BILINEAR
        )
        return np.asarray(back, f32) / f32(255.0)

    def infer_mask(self, img: np.ndarray) -> np.ndarray:
        """RGBA u8 [H, W, 4] -> f32 saliency mask [H, W] in [0, 1]."""
        h, w = img.shape[:2]
        x = self.preprocess(img)
        out = self.session.run(None, {self.input_name: x})[0]
        return self.postprocess(out, h, w)

    def remove_background(self, img: np.ndarray,
                          threshold: Optional[float] = None) -> np.ndarray:
        """Multiply the alpha channel by the saliency mask."""
        mask = self.infer_mask(img)
        if threshold is not None:
            mask = (mask >= threshold).astype(f32)
        out = np.asarray(img, np.uint8).copy()
        a = out[..., 3].astype(f32) * mask
        out[..., 3] = np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)
        return out


def available() -> bool:
    try:
        _require_ort()
        return True
    except AiUnavailable:
        return False
