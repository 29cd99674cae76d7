"""Generative pixel-loop fuzz: random for_each_pixel / for_region /
map_channels closures run through every engine tier — the forced-scalar
tree-walker (the oracle), the auto pipeline (purity-scan vectorizer +
compiled region runner), and the required-compile transpiler — and the
final pixels, console output, and error messages must match exactly.

Biased toward the snapshot/keep-old contract (scripting.rs:446-495):
float/bool/big-int channel results, mid-loop throws, get_pixel/set_pixel
inside the loop, captured-state mutation, mixed int/float branches,
out-of-range shifts, and near-i64-overflow arithmetic where the
vectorized numpy int64 path would silently wrap.
"""

import random

import numpy as np
import pytest

import paintfe_tpu.scripting.api as _api_mod
from paintfe_tpu.scripting import ScriptError, execute_script_sync


class Gen:
    def __init__(self, seed):
        self.r = random.Random(seed)

    def pick(self, xs):
        return self.r.choice(xs)

    def chan_expr(self, names, d=0):
        """An expression for one output channel: usually int-valued, but
        deliberately often float/bool/huge (keep-old paths)."""
        r = self.r.random()
        v = self.pick(names)
        w = self.pick(names)
        if d > 2 or r < 0.30:
            return self.pick([
                v, w, "255", "0", "17",
                f"255 - {v}",
                f"({v} + {w}) / 2",
                f"{v} * 0.5",                       # float -> keep old
                f"{v} > 100",                       # bool -> keep old
                f"({v} / 2) * 2.0",                 # integral float -> keep
                f"clamp({v} + 40, 0, 255)",
                f"min({v}, {w})",
                f"max({v}, 128)",
            ])
        if r < 0.45:
            op = self.pick(["+", "-", "*", "/", "%"])
            guard = "" if op not in ("/", "%") else " + 1"
            return (f"({self.chan_expr(names, d + 1)} {op} "
                    f"({self.chan_expr(names, d + 1)}{guard}))")
        if r < 0.55:
            # near-i64-overflow products: numpy int64 wraps, bigints don't
            return (f"(if ({v} - 128) * "
                    f"{self.pick(['144115188075855872', '72057594037927936'])}"
                    f" > 0 {{ 200 }} else {{ {w} }})")
        if r < 0.68:
            return (f"(if {v} {self.pick(['<', '>', '=='])} {w} "
                    f"{{ {self.chan_expr(names, d + 1)} }} else "
                    f"{{ {self.chan_expr(names, d + 1)} }})")
        if r < 0.78:
            return f"({v} {self.pick(['<<', '>>'])} "\
                   f"{self.pick(['1', '2', '3', '7'])})"
        if r < 0.84:
            # shift count sometimes out of 0..63 -> per-pixel script error
            return f"({v} << ({w} / 64 + {self.pick(['60', '62', '63'])}))"
        if r < 0.88:
            return self.pick([
                f"round({v} * 0.3)",                # float -> keep old
                f"floor({v} * 0.9)",
                f"abs({v} - {w})",
                f"sqrt({v}.to_float())",            # float -> keep old
            ])
        if r < 0.94:
            # switch + unary minus: compiled-closure env regressions
            return (f"(switch {v} {{ 0..=99 => {self.int_lit()}, "
                    f"200 => -(-{w}), _ => {self.chan_expr(names, d + 1)} }})")
        return f"({v} & {w} | 15)"

    def int_lit(self):
        return str(self.pick([0, 3, 77, 200, 255]))

    def program(self):
        kind = self.pick(["each", "each", "region", "map"])
        names = ["r", "g", "b"] if kind == "map" else ["x", "y", "r", "g", "b"]
        params = "r, g, b, a" if kind == "map" else "x, y, r, g, b, a"
        body = []
        impure = self.r.random()
        if impure < 0.18:
            body.append("acc.push(r);")             # captured mutation
        elif impure < 0.30 and kind != "map":
            body.append("let o = get_r((x + 1) % 4, y);")
            names = names + ["o"]
        elif impure < 0.38 and kind != "map":
            body.append("set_pixel(0, 0, 200, 0, 0, 255);")
        elif impure < 0.46 and kind != "map":
            # mid-loop throw: snapshot semantics commit NOTHING
            cx, cy = self.r.randint(0, 3), self.r.randint(0, 4)
            body.append(f"if x == {cx} && y == {cy} "
                        f"{{ throw `px${{x}},${{y}}`; }}")
        if self.r.random() < 0.4:
            body.append(f"let t = {self.chan_expr(names)};")
            names = names + ["t"]
        chans = ", ".join(self.chan_expr(names) for _ in range(3))
        ret = self.pick([f"[{chans}, a]", f"[{chans}, 255]",
                         f"[{chans}]",                     # <4: keep pixel
                         "()" if self.r.random() < 0.5 else f"[{chans}, a]"])
        closure = f"|{params}| {{ {' '.join(body)} {ret} }}"
        if kind == "each":
            loop = f"for_each_pixel({closure});"
        elif kind == "map":
            loop = f"map_channels({closure});"
        else:
            rx = self.pick(["0", "1", "-2", "2"])
            ry = self.pick(["0", "1", "-1"])
            rw = self.pick(["2", "4", "-3", "9"])
            rh = self.pick(["3", "5", "-2"])
            loop = f"for_region({rx}, {ry}, {rw}, {rh}, {closure});"
        prog = ["let acc = [];", ]
        if self.r.random() < 0.5:
            prog.append(f"try {{ {loop} }} catch (e) "
                        "{ print_line(`caught ${e}`); }")
        else:
            prog.append(loop)
        prog.append('print_line(`${get_pixel(0, 0)} ${get_pixel(3, 2)} '
                    '${acc.len}`);')
        return "\n".join(prog)


def _img():
    img = np.zeros((5, 4, 4), np.uint8)
    img[..., 0] = (np.arange(20).reshape(5, 4) * 13) % 256
    img[..., 1] = 130
    img[..., 2] = (np.arange(20).reshape(5, 4) * 57 + 9) % 256
    img[..., 3] = 255
    return img


def run_mode(src, mode, monkeypatch, force_scalar=False):
    monkeypatch.setenv("PAINTFE_SCRIPT_COMPILE", mode)
    orig = _api_mod.closure_is_pure
    if force_scalar:
        _api_mod.closure_is_pure = lambda *a, **k: False
    try:
        out, w, h, console, _ops = execute_script_sync(
            src, _img(), 4, 5, None)
        return ("ok", console, np.asarray(out).tobytes())
    except ScriptError as e:
        return ("err", e.message)
    except Exception as e:
        return ("raw", type(e).__name__, str(e))
    finally:
        _api_mod.closure_is_pure = orig


@pytest.mark.parametrize("seed", range(200))
def test_pixel_loop_fuzz_engines_agree(seed, monkeypatch):
    src = Gen(seed).program()
    # mode "1" (require transpile) rejects closure-bearing programs by
    # design, so the tiers here are: forced-scalar tree-walk (oracle),
    # auto (vectorizer + compiled region runner), and compile-disabled
    # (vectorizer + tree-walk scalar loop)
    oracle = run_mode(src, "0", monkeypatch, force_scalar=True)
    auto = run_mode(src, "auto", monkeypatch)
    v0 = run_mode(src, "0", monkeypatch)
    assert oracle == auto == v0, (
        f"engines diverge (seed {seed}):\n{src}\n"
        f"oracle={oracle}\nauto={auto}\nv0={v0}")
