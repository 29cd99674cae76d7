"""Paint.NET .pdn import (read-only).

Behavioral contract: src/pdn.rs — the reference parses .pdn *out of process*
via a C# host (the payload is .NET BinaryFormatter data, pdn.rs:40-160) and
maps Paint.NET blend-mode names onto PaintFE modes (:162-184).

This module parses the container header natively (magic + XML document
header with dimensions + layer names/visibility) and delegates full pixel
decoding to an external helper when configured (PAINTFE_PDN_HOST, the same
architecture as the reference's host).  The helper protocol: invoked as
`host decode <file.pdn> <out_dir>`; it writes layer_NN.png files plus a
layers.json manifest [{name, visible, opacity, blend_mode}].
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

from paintfe_tpu.core.blend import BlendMode
from paintfe_tpu.core.canvas import Canvas, Layer


class PdnError(Exception):
    pass


# Paint.NET blend-mode name -> PaintFE mode (pdn.rs:162-184); unknown -> Normal.
PDN_BLEND_MODES = {
    "Multiply": BlendMode.MULTIPLY,
    "Additive": BlendMode.ADDITIVE,
    "ColorBurn": BlendMode.COLOR_BURN,
    "ColorDodge": BlendMode.COLOR_DODGE,
    "Reflect": BlendMode.REFLECT,
    "Glow": BlendMode.GLOW,
    "Overlay": BlendMode.OVERLAY,
    "Difference": BlendMode.DIFFERENCE,
    "Negation": BlendMode.NEGATION,
    "Lighten": BlendMode.LIGHTEN,
    "Darken": BlendMode.DARKEN,
    "Screen": BlendMode.SCREEN,
    "Xor": BlendMode.XOR,
}


def map_blend_mode(name: str) -> BlendMode:
    return PDN_BLEND_MODES.get(name, BlendMode.NORMAL)


def read_header(path) -> dict:
    """Parse the .pdn magic + XML header (dimensions, layer metadata)."""
    data = pathlib.Path(path).read_bytes()
    if not data.startswith(b"PDN3"):
        raise PdnError("not a Paint.NET file (missing PDN3 magic)")
    # 3-byte little-endian XML header length follows the magic
    n = data[4] | (data[5] << 8) | (data[6] << 16)
    xml = data[7 : 7 + n].decode("utf-8", errors="replace")
    out = {"width": None, "height": None, "layers": []}
    m = re.search(r'width="(\d+)"', xml)
    if m:
        out["width"] = int(m.group(1))
    m = re.search(r'height="(\d+)"', xml)
    if m:
        out["height"] = int(m.group(1))
    for lm in re.finditer(r"<layer\b([^>]*)>", xml):
        attrs = dict(re.findall(r'(\w+)="([^"]*)"', lm.group(1)))
        out["layers"].append(attrs)
    return out


def load_pdn(path) -> Canvas:
    """Import a .pdn document.  Needs an external decode helper
    (PAINTFE_PDN_HOST) for pixel data, like the reference's C# host."""
    header = read_header(path)
    host = os.environ.get("PAINTFE_PDN_HOST")
    if not host:
        raise PdnError(
            ".pdn pixel decoding requires an external helper: set "
            "PAINTFE_PDN_HOST to a decoder executable (the payload is .NET "
            "BinaryFormatter data; the reference uses an out-of-process C# "
            "host for the same reason)"
        )
    from paintfe_tpu.io import codecs

    with tempfile.TemporaryDirectory() as tmp:
        proc = subprocess.run(
            [host, "decode", str(path), tmp], capture_output=True, timeout=120
        )
        if proc.returncode != 0:
            raise PdnError(
                f"pdn host failed ({proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[:400]}"
            )
        manifest_path = pathlib.Path(tmp) / "layers.json"
        if not manifest_path.exists():
            raise PdnError("pdn host produced no layers.json manifest")
        manifest = json.loads(manifest_path.read_text())
        canvas: Optional[Canvas] = None
        for i, entry in enumerate(manifest):
            img = codecs.load_image(pathlib.Path(tmp) / f"layer_{i:02d}.png")
            if canvas is None:
                canvas = Canvas(width=img.shape[1], height=img.shape[0])
            canvas.layers.append(Layer(
                name=entry.get("name", f"Layer {i + 1}"),
                pixels=img,
                visible=bool(entry.get("visible", True)),
                opacity=float(entry.get("opacity", 1.0)),
                blend_mode=map_blend_mode(entry.get("blend_mode", "Normal")),
            ))
        if canvas is None:
            raise PdnError("pdn host produced no layers")
        return canvas
