"""Shape rendering vs goldens (mirror of visual_shapes.rs)."""

import numpy as np
import pytest

from paintfe_tpu.ops.shapes import (
    PlacedShape,
    ShapeFillMode,
    ShapeKind,
    rasterize_to_canvas,
    shape_sdf,
)

from common import assert_golden
from paintfe_tpu.ops import shapes

W = H = 128


def make_shape(kind, fill):
    return PlacedShape(
        cx=64.0, cy=64.0, hw=40.0, hh=40.0, rotation=0.0, kind=kind,
        fill_mode=fill, outline_width=3.0,
        primary_color=(255, 80, 80, 255), secondary_color=(80, 80, 255, 255),
        anti_alias=True, corner_radius=0.0,
    )


OUTLINE_GOLDENS = [
    ("ellipse_outline", ShapeKind.ELLIPSE),
    ("rectangle_outline", ShapeKind.RECTANGLE),
    ("triangle_outline", ShapeKind.TRIANGLE),
    ("pentagon_outline", ShapeKind.PENTAGON),
    ("hexagon_outline", ShapeKind.HEXAGON),
    ("octagon_outline", ShapeKind.OCTAGON),
    ("cross_outline", ShapeKind.CROSS),
    ("heart_outline", ShapeKind.HEART),
    ("star5_outline", ShapeKind.STAR5),
]

FILLED_GOLDENS = [
    ("ellipse_filled", ShapeKind.ELLIPSE),
    ("rectangle_filled", ShapeKind.RECTANGLE),
    ("triangle_filled", ShapeKind.TRIANGLE),
    ("pentagon_filled", ShapeKind.PENTAGON),
    ("hexagon_filled", ShapeKind.HEXAGON),
    ("heart_filled", ShapeKind.HEART),
]


@pytest.mark.parametrize("name,kind", OUTLINE_GOLDENS, ids=[n for n, _ in OUTLINE_GOLDENS])
def test_shape_outline(name, kind):
    result = rasterize_to_canvas(make_shape(kind, ShapeFillMode.OUTLINE), W, H)
    assert_golden("shapes", name, result)


@pytest.mark.parametrize("name,kind", FILLED_GOLDENS, ids=[n for n, _ in FILLED_GOLDENS])
def test_shape_filled(name, kind):
    result = rasterize_to_canvas(make_shape(kind, ShapeFillMode.BOTH), W, H)
    # trig-based SDFs (atan2/parametric heart) differ from Rust libm by 1 ulp
    # on a handful of AA edge pixels; tolerance knob as in the reference harness
    tol = 1 if kind in (ShapeKind.PENTAGON, ShapeKind.HEXAGON, ShapeKind.HEART) else 0
    assert_golden("shapes", name, result, tolerance=tol)


def test_rounded_rect_outline():
    p = make_shape(ShapeKind.ROUNDED_RECT, ShapeFillMode.OUTLINE)
    p.corner_radius = 12.0
    assert_golden("shapes", "rounded_rect_outline", rasterize_to_canvas(p, W, H))


def test_rounded_rect_filled():
    p = make_shape(ShapeKind.ROUNDED_RECT, ShapeFillMode.BOTH)
    p.corner_radius = 12.0
    assert_golden("shapes", "rounded_rect_filled", rasterize_to_canvas(p, W, H))


def test_rectangle_rotated_45():
    p = make_shape(ShapeKind.RECTANGLE, ShapeFillMode.BOTH)
    p.rotation = float(np.float32(np.pi / 4))
    assert_golden("shapes", "rectangle_rotated_45", rasterize_to_canvas(p, W, H))


def test_ellipse_fill_only():
    p = make_shape(ShapeKind.ELLIPSE, ShapeFillMode.FILLED)
    assert_golden("shapes", "ellipse_fill_only", rasterize_to_canvas(p, W, H))


def test_rectangle_no_aa():
    p = make_shape(ShapeKind.RECTANGLE, ShapeFillMode.BOTH)
    p.anti_alias = False
    assert_golden("shapes", "rectangle_no_aa", rasterize_to_canvas(p, W, H))


def test_sdf_signs():
    # center is inside (negative), far corner outside (positive)
    zero = np.zeros(1, np.float32)
    far = np.full(1, 100.0, np.float32)
    inside_probe = {ShapeKind.RIGHT_TRIANGLE: (-20.0, 20.0), ShapeKind.CHECK: (-16.0, 12.0)}
    # The reference's star SDF is sector-edge distance in wedge space and is
    # not negative at the shape center (golden parity keeps the quirk).
    skip = {ShapeKind.STAR5, ShapeKind.STAR6}
    for kind in ShapeKind:
        if kind in skip:
            continue
        ix, iy = inside_probe.get(kind, (0.0, 0.0))
        d_in = shape_sdf(kind, np.full(1, ix, np.float32), np.full(1, iy, np.float32), 40.0, 40.0, 5.0)
        d_out = shape_sdf(kind, far, far, 40.0, 40.0, 5.0)
        assert float(d_in[0]) < 0, kind
        assert float(d_out[0]) > 0, kind


# -- custom SVG-path shapes (shapes.rs:27-122, :1065-1160) ---------------------


def test_custom_shape_parse_and_fill():
    d = "M 0 0 L 100 0 L 100 100 L 0 100 Z M 30 30 L 70 30 L 50 70 Z"
    cs = shapes.parse_custom_shape("notch", "test", d)
    assert cs.bounds == (0.0, 0.0, 100.0, 100.0)
    assert len(cs.polylines) == 2
    ps = shapes.PlacedShape(
        cx=64, cy=64, hw=40, hh=40, fill_mode=shapes.ShapeFillMode.FILLED,
        custom_shape_data=cs, primary_color=(255, 0, 0, 255),
    )
    img = shapes.rasterize_to_canvas(ps, 128, 128)
    # even-odd: the inner triangle is a hole
    np.testing.assert_array_equal(img[64, 64], [0, 0, 0, 0])
    np.testing.assert_array_equal(img[30, 30], [255, 0, 0, 255])
    np.testing.assert_array_equal(img[5, 5], [0, 0, 0, 0])


def test_custom_shape_curves_flatten():
    circ = shapes.parse_custom_shape(
        "c", "t", "M 0 50 A 50 50 0 1 1 100 50 A 50 50 0 1 1 0 50 Z"
    )
    pts = np.asarray(circ.polylines[0])
    r = np.hypot(pts[:, 0] - 50, pts[:, 1] - 50)
    assert np.all(np.abs(r - 50) < 1.0)  # all on the circle within tolerance
    bez = shapes.parse_custom_shape(
        "b", "t", "M 50 0 C 100 0 100 80 50 100 C 0 80 0 0 50 0 Z"
    )
    assert len(bez.polylines[0]) > 10


def test_custom_shape_outline_mode():
    cs = shapes.parse_custom_shape("sq", "t", "M 0 0 H 100 V 100 H 0 Z")
    ps = shapes.PlacedShape(
        cx=64, cy=64, hw=40, hh=40, fill_mode=shapes.ShapeFillMode.OUTLINE,
        outline_width=2.0, custom_shape_data=cs, primary_color=(0, 255, 0, 255),
    )
    img = shapes.rasterize_to_canvas(ps, 128, 128)
    assert img[24, 64, 3] > 0      # on the edge
    assert img[64, 64, 3] == 0     # interior empty in outline mode


def test_extract_svg_path_data():
    svg = '<svg><path fill="r" d="M0 0 L10 0 Z"/><path d=\'M20 20 L30 20\'/></svg>'
    assert shapes.extract_svg_path_data(svg) == "M0 0 L10 0 Z M20 20 L30 20"
    with pytest.raises(shapes.SvgPathError):
        shapes.extract_svg_path_data('<svg><image href="x"/></svg>')
    with pytest.raises(shapes.SvgPathError):
        shapes.extract_svg_path_data("<svg></svg>")
    with pytest.raises(shapes.SvgPathError):
        shapes.parse_custom_shape("x", "t", "M 5 5")  # no drawable geometry


def test_svg_arc_compact_flags():
    """SVG arc flags are single characters that need no separator from the
    next number ('a1 1 0 011 0' = flags 0,1 then x=1 y=0 — standard
    minifier output); a greedy number lexer reads '011' as 11.0."""
    from paintfe_tpu.ops.shapes import parse_svg_path

    assert parse_svg_path("M0 0 a1 1 0 011 0 z") == \
        parse_svg_path("M0 0 a1 1 0 0 1 1 0 z")
    assert parse_svg_path("M10 10 A5 5 0 10-3 4") == \
        parse_svg_path("M10 10 A5 5 0 1 0 -3 4")
