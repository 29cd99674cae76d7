"""Internal clipboard: copy / cut / paste of selections and layers.

Behavioral contract: src/ops/clipboard.rs — internal RGBA clipboard with
selection-aware copy (unselected pixels transparent), cut = copy + delete,
paste as new layer.  The OS clipboard bridge (arboard in the reference) is
environment-dependent and intentionally absent here; the internal clipboard
is the data model the GUI bridge would feed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from paintfe_tpu.core.canvas import Canvas, Layer
from paintfe_tpu.core.selection import delete_selected


class Clipboard:
    def __init__(self):
        self.image: Optional[np.ndarray] = None  # u8 [H, W, 4]
        self.origin: Tuple[int, int] = (0, 0)

    def has_content(self) -> bool:
        return self.image is not None

    def copy(self, canvas: Canvas, layer_idx: Optional[int] = None):
        """Copy the active (or given) layer's selected pixels; crops to the
        selection bbox, unselected pixels transparent."""
        idx = canvas.active_layer_index if layer_idx is None else layer_idx
        pixels = canvas.layers[idx].pixels
        if canvas.selection is None:
            self.image = pixels.copy()
            self.origin = (0, 0)
            return
        sel = canvas.selection > 0
        if not sel.any():
            self.image = None
            return
        ys, xs = np.nonzero(sel)
        y0, y1 = int(ys.min()), int(ys.max()) + 1
        x0, x1 = int(xs.min()), int(xs.max()) + 1
        region = pixels[y0:y1, x0:x1].copy()
        region[~sel[y0:y1, x0:x1]] = 0
        self.image = region
        self.origin = (x0, y0)

    def cut(self, canvas: Canvas, layer_idx: Optional[int] = None):
        idx = canvas.active_layer_index if layer_idx is None else layer_idx
        self.copy(canvas, idx)
        canvas.layers[idx].pixels = delete_selected(
            canvas.layers[idx].pixels, canvas.selection
        )

    def paste_as_layer(self, canvas: Canvas, at: Optional[Tuple[int, int]] = None) -> Optional[int]:
        """Paste as a new layer above the active one; returns its index."""
        if self.image is None:
            return None
        px = np.zeros((canvas.height, canvas.width, 4), np.uint8)
        ox, oy = self.origin if at is None else at
        ih, iw = self.image.shape[:2]
        x0, y0 = max(ox, 0), max(oy, 0)
        sx0, sy0 = x0 - ox, y0 - oy
        cw = min(iw - sx0, canvas.width - x0)
        ch = min(ih - sy0, canvas.height - y0)
        if cw > 0 and ch > 0:
            px[y0 : y0 + ch, x0 : x0 + cw] = self.image[sy0 : sy0 + ch, sx0 : sx0 + cw]
        layer = Layer(name="Pasted Layer", pixels=px)
        idx = min(canvas.active_layer_index + 1, len(canvas.layers))
        canvas.layers.insert(idx, layer)
        canvas.active_layer_index = idx
        return idx
