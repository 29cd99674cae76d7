"""Generative dual-engine fuzz: random closure-free Rhai programs run
through the tree-walker AND the transpiler; console output, pixels, and
error messages must match exactly.

The generator is seeded (no ambient randomness) and biased toward the
constructs where the engines' implementations differ most: nested
blocks/shadowing, loops with break/continue, user fns reading/writing
globals, try/throw/catch, switch, compound assignment, string coercion,
arrays/maps with clone-on-assign, and mixed int/float arithmetic
(including division/modulo by possibly-zero values).
"""

import random

import numpy as np
import pytest

from paintfe_tpu.scripting import ScriptError, execute_script_sync

NAMES = ["a", "b", "c", "d", "e"]
# "fx" doubles as a global name in some programs: fn-vs-variable shadowing
FNAMES = ["fx", "fy", "fz"]


class Gen:
    def __init__(self, seed):
        self.r = random.Random(seed)
        self.fns = []
        self.fns2 = []  # two-parameter fns (reduce/sort callbacks)
        self.depth = 0

    def pick(self, xs):
        return self.r.choice(xs)

    def int_lit(self):
        return str(self.pick([0, 1, 2, 3, 5, 7, -1, -3, 255, 1000]))

    def float_lit(self):
        return self.pick(["0.5", "1.5", "-2.25", "3.0", "0.0"])

    def scalar_expr(self, d=0):
        r = self.r.random()
        if d > 2 or r < 0.3:
            if self.r.random() < 0.08:
                # bools in arithmetic/compare positions: engines must agree
                # on the function-not-found errors and unlike-type == rules
                return self.pick(["true", "false"])
            return self.pick([self.int_lit, self.float_lit,
                              lambda: self.pick(NAMES)])()
        if r < 0.72:
            op = self.pick(["+", "-", "*", "/", "%", "==", "!=", "<", ">",
                            "<=", ">="])
            l = self.scalar_expr(d + 1)
            rr = self.scalar_expr(d + 1)
            return f"({l} {op} {rr})"
        if r < 0.75:
            # pow: small literal exponent (negative int exponents error in
            # both engines; float corners go IEEE inf/NaN)
            return (f"({self.scalar_expr(d + 1)} ** "
                    f"{self.pick(['2', '3', '0', '-1', '0.5', '2.0'])})")
        if r < 0.85 and self.fns:
            fn = self.pick(self.fns)
            return f"{fn}({self.scalar_expr(d + 1)})"
        if r < 0.93:
            c = self.cond_expr(d + 1)
            return (f"(if {c} {{ {self.scalar_expr(d + 1)} }} "
                    f"else {{ {self.scalar_expr(d + 1)} }})")
        return (f"(switch {self.scalar_expr(d + 1)} "
                f"{{ 0..=2 => {self.int_lit()}, "
                f"{self.int_lit()} => {self.int_lit()}, "
                f"_ => {self.scalar_expr(d + 1)} }})")

    def cond_expr(self, d=0):
        op = self.pick(["<", ">", "==", "!=", "<=", ">="])
        l = self.scalar_expr(d + 1)
        r = self.scalar_expr(d + 1)
        e = f"({l} {op} {r})"
        if self.r.random() < 0.3:
            e2 = (f"({self.scalar_expr(d + 1)} "
                  f"{self.pick(['<', '>'])} {self.scalar_expr(d + 1)})")
            e = f"({e} {self.pick(['&&', '||'])} {e2})"
        return e

    # strings biased toward the parse_int/parse_float strictness corners
    # (whitespace, underscores, 0x prefixes, overflow, radix errors)
    PARSE_POOL = ['"42"', '"-7"', '"ff"', '"0x1A"', '" 5"', '"1_0"', '""',
                  '"abc"', '"+9"', '"101"', '"9223372036854775808"',
                  '"3.5"', '"1e3"', '"inf"', '"NaN"', '"2.5e2"', '"-0"']

    def std5_stmt(self):
        """Round-5 std-package closure: dedup/split/reduce_rev, range(),
        radix formatting, parity/sign, string pop/crop/pad/remove, and
        the unified call notation — all closure-free so the compiled
        tier must take the whole program."""
        v = f"sb_{self.pick(NAMES)}"
        rr = self.r.random()
        if rr < 0.08:
            # string char set-by-index (negative wraps; OOB is catchable)
            s = self.pick(['"abcdef"', '"xy"', '"banana"'])
            i = self.r.randint(-7, 7)
            return (f"let si_{v} = {s}; "
                    f"try {{ si_{v}[{i}] = 'Q'; }} "
                    f"catch (e) {{ print_line(`e${{e}}`); }} "
                    f"print_line(si_{v});")
        if rr < 0.16:
            # switch case conditions incl. guarded-default fall-through
            x = self.int_lit()
            return (f"let sw_{v} = {x}; print_line(`${{switch sw_{v} {{ "
                    f'0..=2 if sw_{v} > 1 => "a", 0..=2 => "b", '
                    f'_ if sw_{v} > 100 => "c", _ => "d" }}}}`);')
        if rr < 0.24:
            # const bindings: assignment errors are catchable; a later
            # let un-consts the name
            return (f"const K_{v} = {self.int_lit()}; "
                    f"try {{ K_{v} += 1; }} "
                    f"catch (e) {{ print_line(`c${{e}}`); }} "
                    f"let K_{v} = 7; K_{v} += 1; print_line(`${{K_{v}}}`);")
        if rr < 0.30:
            # statement-position break VALUE: discarded, but its side
            # effects must run in both engines
            n = self.r.randint(1, 7)
            return (f"let wv_{v} = 0; while wv_{v} < 6 {{ wv_{v} += 1; "
                    f"if wv_{v} == {n} {{ break wv_{v} * 10 + "
                    f"{self.int_lit()}; }} }} print_line(`${{wv_{v}}}`);")
        r = self.r.random()
        arr = ", ".join(self.int_lit() for _ in range(self.r.randint(1, 4)))
        if r < 0.12:
            return (f"let {v} = [{arr}, {arr}]; {v}.dedup(); "
                    f"print_line(`${{{v}}}`);")
        if r < 0.24:
            at = self.r.randint(-3, 4)
            return (f"let {v} = [{arr}]; let t_{v} = {v}.split({at}); "
                    f"print_line(`${{{v}}} ${{t_{v}}}`);")
        if r < 0.34 and self.fns2:
            fn = self.pick(self.fns2)
            init = "" if self.r.random() < 0.5 else f", {self.int_lit()}"
            return (f"let {v} = [{arr}]; "
                    f'print_line(`${{{v}.reduce_rev(Fn("{fn}"){init})}}`);')
        if r < 0.46:
            step = self.pick(["1", "2", "3", "-1", "-2"])
            lo, hi = self.r.randint(-2, 3), self.r.randint(-2, 6)
            return (f"let rs_{v} = 0; "
                    f"for rv in range({lo}, {hi}, {step}) "
                    f"{{ rs_{v} += rv; }} print_line(`${{rs_{v}}}`);")
        if r < 0.58:
            n = self.pick(["255", "-1", "0", "5", "1000", "-77"])
            m = self.pick(["to_hex", "to_octal", "to_binary"])
            return (f"print_line(`${{({n}).{m}()}} ${{({n}).is_odd}} "
                    f"${{({n}).sign()}}`);")
        if r < 0.72:
            s = self.pick(['"abcdef"', '"xy"', '""', '"banana"'])
            m = self.r.random()
            if m < 0.3:
                npop = "" if self.r.random() < 0.5 else f"({self.r.randint(0, 8)})"
                return (f"let ss_{v} = {s}; "
                        f"let pc_{v} = ss_{v}.pop{npop or '()'}; "
                        f"print_line(`${{pc_{v}}}|${{ss_{v}}}`);")
            if m < 0.6:
                a, b = self.r.randint(-2, 4), self.r.randint(0, 4)
                return (f"let ss_{v} = {s}; ss_{v}.crop({a}, {b}); "
                        f"print_line(`[${{ss_{v}}}]`);")
            if m < 0.8:
                return (f"let ss_{v} = {s}; "
                        f"ss_{v}.pad({self.r.randint(0, 7)}, \"*\"); "
                        f"print_line(ss_{v});")
            return (f"let ss_{v} = {s}; ss_{v}.remove(\"a\"); "
                    f"print_line(`[${{ss_{v}}}]`);")
        if r < 0.84:
            # unified call notation: f(x, y) <-> x.f(y), both directions,
            # including a mutating method called function-style
            w = self.r.random()
            if w < 0.35:
                return (f"let {v} = [{arr}]; push({v}, {self.int_lit()}); "
                        f"sort({v}); print_line(`${{{v}}}`);")
            if w < 0.7:
                return (f"print_line(`${{({self.int_lit()}).min("
                        f"{self.int_lit()})}} ${{to_upper(\"a\" + \"{self.pick(NAMES)}\")}}`);")
            s = self.pick(self.PARSE_POOL)
            return f"print_line(`${{parse_int({s}, 16)}}`);"
        m = self.pick(["floor", "ceiling", "round", "int", "fraction"])
        f = self.pick(["1.75", "-2.25", "0.5", "3.0", "-0.75"])
        return (f"print_line(`${{({f}).{m}}} ${{({f}).{m}()}} "
                f"${{({f}).is_finite}}`);")

    def stdlib_stmt(self, d=0):
        """Std array package + parse conversions + two-binding for: every
        construct lands in BOTH engines (Fn pointers, never closures —
        the compiled tier must accept the whole program)."""
        if self.r.random() < 0.3:
            return self.std5_stmt()
        r = self.r.random()
        v = f"sa_{self.pick(NAMES)}"
        arr = ", ".join(self.int_lit() for _ in range(self.r.randint(1, 4)))
        if r < 0.14:
            ops = self.pick([".sort()", ".reverse()",
                             f".truncate({self.r.randint(0, 3)})",
                             f".chop({self.r.randint(0, 3)})"])
            return (f"let {v} = [{arr}]; {v}{ops}; "
                    f"print_line(`${{{v}}}`);")
        if r < 0.26:
            s, n = self.r.randint(-3, 4), self.r.randint(0, 4)
            m = self.pick(["retain", "drain", "extract"])
            return (f"let {v} = [{arr}]; "
                    f"print_line(`${{{v}.{m}({s}, {n})}} ${{{v}}}`);")
        if r < 0.36:
            s, n = self.r.randint(-2, 3), self.r.randint(0, 3)
            return (f"let {v} = [{arr}]; {v}.splice({s}, {n}, "
                    f"[{self.int_lit()}]); print_line(`${{{v}}}`);")
        if r < 0.46:
            start = ("" if self.r.random() < 0.5
                     else f", {self.r.randint(-2, 3)}")
            return (f"let {v} = [{arr}]; "
                    f"print_line(`${{{v}.index_of({self.int_lit()}{start})}}`);")
        if r < 0.56:
            m = self.pick(["insert", "remove", "shift", "pad"])
            if m == "insert":
                call = f"{v}.insert({self.r.randint(-2, 4)}, {self.int_lit()})"
            elif m == "remove":
                call = f"print_line(`${{{v}.remove({self.r.randint(-3, 4)})}}`)"
            elif m == "shift":
                call = f"print_line(`${{{v}.shift()}}`)"
            else:
                call = f"{v}.pad({self.r.randint(0, 5)}, {self.int_lit()})"
            return f"let {v} = [{arr}]; {call}; print_line(`${{{v}}}`);"
        if r < 0.68 and self.fns:
            fn = self.pick(self.fns)
            m = self.pick(["map", "filter", "some", "all", "none",
                           "index_of", "for_each"])
            return (f"let {v} = [{arr}]; "
                    f'print_line(`${{{v}.{m}(Fn("{fn}"))}}`);')
        if r < 0.78 and self.fns2:
            fn = self.pick(self.fns2)
            if self.r.random() < 0.5:
                return (f"let {v} = [{arr}]; {v}.sort(Fn(\"{fn}\")); "
                        f"print_line(`${{{v}}}`);")
            init = ("" if self.r.random() < 0.5
                    else f", {self.int_lit()}")
            return (f"let {v} = [{arr}]; "
                    f'print_line(`${{{v}.reduce(Fn("{fn}"){init})}}`);')
        if r < 0.9:
            s = self.pick(self.PARSE_POOL)
            if self.r.random() < 0.6:
                radix = ("" if self.r.random() < 0.6
                         else f"({self.pick(['2', '16', '8', '37'])})")
                return f"print_line(`${{{s}.parse_int{radix or '()'}}}`);"
            return f"print_line(`${{{s}.parse_float()}}`);"
        body = self.stmt(d + 1)
        extra = ""
        if self.r.random() < 0.3:
            extra = (f" if fi == {self.r.randint(0, 2)} "
                     f"{{ {self.pick(['break', 'continue'])}; }}")
        it = (f"[{arr}]" if self.r.random() < 0.5
              else f"0..{self.r.randint(1, 5)}")
        return (f"let fsum = 0; for (fv, fi) in {it} "
                f"{{{extra} fsum += fv * 10 + fi; {body} }} "
                f"print_line(`f=${{fsum}}`);")

    def stmt(self, d=0):
        if d < 2 and self.r.random() < 0.2:
            return self.stdlib_stmt(d)
        r = self.r.random()
        if r < 0.25:
            return f"let {self.pick(NAMES)} = {self.scalar_expr()};"
        if r < 0.4:
            op = self.pick(["=", "+=", "-=", "*="])
            return f"{self.pick(NAMES)} {op} {self.scalar_expr()};"
        if r < 0.5:
            return f'print_line(`v=${{{self.scalar_expr()}}}`);'
        if r < 0.6 and d < 2:
            n = self.r.randint(1, 3)
            body = " ".join(self.stmt(d + 1) for _ in range(n))
            return f"if {self.cond_expr()} {{ {body} }}" + (
                f" else {{ {self.stmt(d + 1)} }}" if self.r.random() < 0.5
                else "")
        if r < 0.7 and d < 2:
            v = self.pick(["i", "j"])
            n = self.r.randint(1, 2)
            body = " ".join(self.stmt(d + 1) for _ in range(n))
            extra = ""
            if self.r.random() < 0.3:
                extra = f" if {v} == 2 {{ {self.pick(['break', 'continue'])}; }}"
            return f"for {v} in 0..{self.r.randint(1, 6)} {{{extra} {body} }}"
        if r < 0.78 and d < 2:
            return (f"try {{ {self.stmt(d + 1)} throw {self.scalar_expr()}; }}"
                    f" catch (err) {{ print_line(`c=${{err}}`); }}")
        if r < 0.86 and d < 2:
            n = self.r.randint(1, 2)
            body = " ".join(self.stmt(d + 1) for _ in range(n))
            return f"{{ let {self.pick(NAMES)} = {self.int_lit()}; {body} }}"
        if r < 0.83:
            arr = ", ".join(self.scalar_expr(2) for _ in range(2))
            v = self.pick(NAMES)
            return (f"let {v} = [{arr}]; {v}.push({self.scalar_expr(2)}); "
                    f'print_line(`n=${{{v}.len}} s=${{{v}[0]}}`);')
        if r < 0.845:
            # clone-on-value at method args: mutating the pushed variable
            # afterwards must NOT alias into the container
            v = self.pick(NAMES)
            return (f"let z_{v} = [{self.int_lit()}]; let c_{v} = []; "
                    f"c_{v}.push(z_{v}); z_{v}.push({self.int_lit()}); "
                    f'print_line(`a=${{c_{v}[0].len}} b=${{z_{v}.len}}`);')
        if r < 0.86:
            # for-in binds cloned values over a snapshot: inner mutations
            # must not write through to the array
            v = self.pick(NAMES)
            return (f"let w_{v} = [[{self.int_lit()}], [{self.int_lit()}]]; "
                    f"for it in w_{v} {{ it.push({self.int_lit()}); }} "
                    f'print_line(`k=${{w_{v}[0].len}}`);')
        if r < 0.91 and d < 2:
            # bounded while with a guaranteed-progress counter
            v = self.pick(["wi", "wj"])
            body = self.stmt(d + 1)
            return (f"let {v} = 0; while {v} < {self.r.randint(1, 4)} "
                    f"{{ {v} += 1; {body} }}")
        if r < 0.95:
            k = self.pick(["p", "q"])
            k2 = self.pick(["aa", "zz"])
            return (f'let m_{k} = #{{ {k}: {self.scalar_expr(2)}, '
                    f'{k2}: {self.int_lit()} }}; '
                    f'm_{k}["{k}"] += {self.int_lit()}; '
                    f'print_line(`m=${{m_{k}.{k}}} all=${{m_{k}}} '
                    f'ks=${{m_{k}.keys()}}`);')
        if r < 0.975:
            v = self.pick(NAMES)
            return (f'let s_{v} = "ab" + {v}; s_{v}.make_upper(); '
                    f"print_line(s_{v} + `${{s_{v}.len}}`);")
        return f'print_line("s" + {self.scalar_expr()});'

    def program(self):
        parts = []
        # globals first so every name reference is definable
        for n in NAMES:
            parts.append(f"let {n} = {self.int_lit()};")
        # a couple of user fns, some touching globals
        for fn in FNAMES[: self.r.randint(0, 3)]:
            self.fns.append(fn)
            if self.r.random() < 0.5:
                body = f"return {self.scalar_expr()};"
            else:
                body = (f"{self.pick(NAMES)} += 1; "
                        f"{self.scalar_expr()}")
            parts.append(f"fn {fn}(p) {{ {body} }}")
        if self.r.random() < 0.6:
            # a two-parameter fn for reduce/sort callbacks; sometimes a
            # deliberately WRONG comparator/reducer (bool or unit result)
            # so the error paths get fuzzed too
            self.fns2.append("f2")
            body = self.pick(["p - q", "q - p", "p + q", "p < q",
                              "if p > q { 1 } else { -1 }"])
            parts.append(f"fn f2(p, q) {{ {body} }}")
        for _ in range(self.r.randint(3, 10)):
            parts.append(self.stmt())
        if self.fns and self.r.random() < 0.3:
            # shadow a fn name with a variable mid-program (scope-first
            # call resolution before vs after the let)
            fn = self.pick(self.fns)
            parts.insert(len(parts) // 2, f"let {fn} = {self.int_lit()};")
        parts.append('print_line(`end ${' +
                     " + ".join(NAMES) + "}`);")
        return "\n".join(parts)


def run_mode(src, mode, monkeypatch):
    monkeypatch.setenv("PAINTFE_SCRIPT_COMPILE", mode)
    img = np.zeros((4, 4, 4), np.uint8)
    try:
        out, w, h, console, _ops = execute_script_sync(src, img, 4, 4, None)
        return ("ok", console, np.asarray(out).tobytes())
    except ScriptError as e:
        return ("err", e.message)
    except Exception as e:  # raw escapes must at least match by type+str
        return ("raw", type(e).__name__, str(e))


@pytest.mark.parametrize("seed", range(320))
def test_fuzz_engines_agree(seed, monkeypatch):
    src = Gen(seed).program()
    a = run_mode(src, "0", monkeypatch)
    b = run_mode(src, "1", monkeypatch)
    assert a == b, f"engines diverge (seed {seed}):\n{src}\n{a}\nvs\n{b}"
