"""Script engine end-to-end tests (mirror of tests/scripting.rs)."""

import numpy as np
import pytest

from paintfe_tpu.core import fixtures
from paintfe_tpu.ops import adjustments as adj
from paintfe_tpu.scripting import ScriptError, execute_script_sync

from common import assert_golden


def run_script(source):
    img = fixtures.test_gradient(64, 64)
    out, w, h, console, _ops = execute_script_sync(source, img, 64, 64, None)
    return np.asarray(out).reshape(h, w, 4), console


def test_width_height():
    _, console = run_script(
        """
        let w = width();
        let h = height();
        print_line(`${w}x${h}`);
        """
    )
    assert console[-1] == "64x64"


def test_set_pixel():
    result, _ = run_script(
        """
        set_pixel(0, 0, 255, 0, 0, 255);
        set_pixel(1, 0, 0, 255, 0, 128);
        """
    )
    np.testing.assert_array_equal(result[0, 0], [255, 0, 0, 255])
    np.testing.assert_array_equal(result[0, 1], [0, 255, 0, 128])


def test_get_pixel_roundtrip():
    result, _ = run_script(
        """
        let r = get_r(0, 0);
        let g = get_g(0, 0);
        let b = get_b(0, 0);
        let a = get_a(0, 0);
        set_pixel(1, 1, r, g, b, a);
        """
    )
    orig = fixtures.test_gradient(64, 64)[0, 0]
    np.testing.assert_array_equal(result[1, 1], orig)


def test_for_each_pixel_invert():
    result, _ = run_script(
        """
        for_each_pixel(|x, y, r, g, b, a| {
            [255 - r, 255 - g, 255 - b, a]
        });
        """
    )
    assert_golden("scripting", "for_each_pixel_invert", result)


def test_map_channels_invert():
    result, _ = run_script(
        """
        map_channels(|r, g, b, a| {
            [255 - r, 255 - g, 255 - b, a]
        });
        """
    )
    assert_golden("scripting", "map_channels_invert", result)


def test_apply_blur():
    result, _ = run_script("apply_blur(2.0);")
    assert_golden("scripting", "apply_blur", result)


def test_apply_invert():
    result, _ = run_script("apply_invert();")
    assert_golden("scripting", "apply_invert", result)


def test_apply_sepia():
    result, _ = run_script("apply_sepia();")
    assert_golden("scripting", "apply_sepia", result)


def test_apply_desaturate():
    result, _ = run_script("apply_desaturate();")
    assert_golden("scripting", "apply_desaturate", result)


def test_apply_brightness_contrast():
    result, _ = run_script("apply_brightness_contrast(20.0, 10.0);")
    assert_golden("scripting", "apply_brightness_contrast", result)


def test_apply_pixelate():
    result, _ = run_script("apply_pixelate(4);")
    assert_golden("scripting", "apply_pixelate", result)


def test_flip_horizontal():
    result, _ = run_script("flip_horizontal();")
    assert_golden("scripting", "flip_horizontal", result)


def test_flip_vertical():
    result, _ = run_script("flip_vertical();")
    assert_golden("scripting", "flip_vertical", result)


def test_flip_roundtrip():
    result, _ = run_script("flip_horizontal();\nflip_horizontal();")
    np.testing.assert_array_equal(result, fixtures.test_gradient(64, 64))


def test_print():
    _, console = run_script(
        """
        print_line("hello world");
        print_line("second line");
        """
    )
    assert any("hello world" in l for l in console)
    assert any("second line" in l for l in console)


def test_clamp():
    _, console = run_script(
        """
        let v = clamp(300, 0, 255);
        print_line(`${v}`);
        """
    )
    assert console[-1] == "255"


def test_syntax_error():
    with pytest.raises(ScriptError):
        run_script("let x = ;")


def test_runtime_error_div_zero():
    with pytest.raises(ScriptError):
        run_script("let x = 1 / 0;")


def test_script_invert_matches_native():
    script_result, _ = run_script("apply_invert();")
    native = np.asarray(adj.invert_colors(fixtures.test_gradient(64, 64)))
    np.testing.assert_array_equal(script_result, native)


def test_select_rect_limits_effect():
    result, _ = run_script(
        """
        select_rect(10, 10, 30, 30);
        fill_selected(255, 0, 0, 255);
        """
    )
    np.testing.assert_array_equal(result[20, 20, :3], [255, 0, 0])
    assert result[5, 5, 0] != 255


def test_select_ellipse():
    result, _ = run_script(
        """
        select_ellipse(32.0, 32.0, 15.0, 15.0);
        fill_selected(255, 0, 255, 255);
        """
    )
    np.testing.assert_array_equal(result[32, 32, :3], [255, 0, 255])
    assert result[0, 0, 0] == 0 and result[0, 0, 1] == 255


def test_clear_selection():
    result, _ = run_script(
        """
        select_rect(0, 0, 10, 10);
        clear_selection();
        fill_selected(0, 0, 255, 255);
        """
    )
    assert result[50, 50, 2] == 255


def test_has_selection():
    _, console = run_script(
        """
        print_line("before: " + has_selection());
        select_rect(0, 0, 10, 10);
        print_line("after: " + has_selection());
        clear_selection();
        print_line("cleared: " + has_selection());
        """
    )
    assert any("before: false" in l for l in console)
    assert any("after: true" in l for l in console)
    assert any("cleared: false" in l for l in console)


def test_invert_selection():
    result, _ = run_script(
        """
        select_rect(10, 10, 54, 54);
        invert_selection();
        fill_selected(255, 0, 255, 255);
        """
    )
    assert result[0, 0, 0] == 255 and result[0, 0, 2] == 255
    assert not (result[32, 32, 0] == 255 and result[32, 32, 2] == 255)


def test_delete_selected():
    result, _ = run_script(
        """
        select_rect(20, 20, 44, 44);
        delete_selected();
        """
    )
    assert result[32, 32, 3] == 0
    assert result[5, 5, 3] > 0


def test_selected_for_each_pixel():
    result, _ = run_script(
        """
        select_rect(0, 0, 32, 64);
        for_each_pixel(|x, y, r, g, b, a| {
            if is_selected(x, y) {
                [255 - r, 255 - g, 255 - b, a]
            } else {
                [r, g, b, a]
            }
        });
        """
    )
    assert result[32, 5, 0] > 200
    assert result[32, 50, 0] > 100


def test_user_function_and_loops():
    _, console = run_script(
        """
        fn double(x) { x * 2 }
        let total = 0;
        for i in 0..5 {
            total += double(i);
        }
        print_line(`${total}`);
        """
    )
    assert console[-1] == "20"


def test_canvas_ops_recorded():
    img = fixtures.test_gradient(64, 64)
    out, w, h, _console, ops = execute_script_sync("rotate_canvas_90cw();", img, 64, 64)
    assert (w, h) == (64, 64)
    assert len(ops) == 1 and ops[0].kind == "rot90cw"


def test_resize_image_script():
    img = fixtures.test_gradient(64, 64)
    out, w, h, _c, ops = execute_script_sync(
        'resize_image(32, 32, "bilinear");', img, 64, 64
    )
    assert (w, h) == (32, 32)
    assert np.asarray(out).shape == (32, 32, 4)
    assert ops[0].kind == "resize_image"


def test_rand_deterministic_with_seed():
    img = fixtures.test_gradient(8, 8)
    src = "print_line(`${rand_int(0, 100)}`);"
    _, _, _, c1, _ = execute_script_sync(src, img, 8, 8, rng_seed=1234)
    _, _, _, c2, _ = execute_script_sync(src, img, 8, 8, rng_seed=1234)
    assert c1 == c2


# -- language extensions: switch, maps, `in`, do-while ------------------------


def test_switch_expression():
    _, console = run_script(
        """
        let mode = "dark";
        let label = switch mode {
            "bright" => "B",
            "dark" | "dim" => "D",
            _ => "?"
        };
        print_line(label);
        let n = switch 2 { 1 => 10, 2 => { let q = 20; q + 2 }, _ => 0 };
        print_line(`${n}`);
        let fallthrough = switch 99 { 1 => 10, _ => -1 };
        print_line(`${fallthrough}`);
        """
    )
    assert console == ["D", "22", "-1"]


def test_object_maps():
    _, console = run_script(
        """
        let m = #{a: 1, "b": 2};
        m.c = m.a + m.b;
        m.a += 10;
        m["d"] = 4;
        m["d"] *= 3;
        print_line(`${m}`);
        print_line(`${m.keys()}`);
        print_line(`${m.len}`);
        print_line(`${m.contains("b")} ${m.remove("b")} ${m.contains("b")}`);
        """
    )
    assert console == [
        '#{"a": 11, "b": 2, "c": 3, "d": 12}',
        '["a", "b", "c", "d"]',
        "4",
        "true 2 false",
    ]


def test_in_operator():
    _, console = run_script(
        """
        print_line(`${3 in 0..5} ${5 in 0..5} ${5 in 0..=5}`);
        print_line(`${"right" in "brightness"}`);
        print_line(`${2 in [1, 2, 3]} ${9 in [1, 2, 3]}`);
        print_line(`${"a" in #{a: 1}} ${"z" in #{a: 1}}`);
        """
    )
    assert console == ["true false true", "true", "true false", "true false"]


def test_do_while_until():
    _, console = run_script(
        """
        let total = 0;
        let i = 0;
        do { total += i; i += 1; } while i < 5
        print_line(`${total}`);
        let j = 10;
        do { j -= 1; } until j <= 3
        print_line(`${j}`);
        let ran = 0;
        do { ran += 1; } while false
        print_line(`${ran}`);
        """
    )
    assert console == ["10", "3", "1"]
