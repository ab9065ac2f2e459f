"""Expressions module (lucene_spark/expressions.py) vs the reference's
own test vectors, evaluated through DuckDB (the oracle engine), plus a
randomized cross-check against a Python evaluator with JVM numeric
semantics, plus Spark<->DuckDB dialect parity on a live session.

Vectors transcribed from:
  expressions/src/test/.../js/TestJavascriptOperations.java:30-328
  expressions/src/test/.../js/TestJavascriptFunction.java:32-266
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from lucene_spark.expressions import (
    DEFAULT_FUNCTIONS,
    JavascriptParseError,
    _jvm_d2l,
    compile_expression,
)

_CON = duckdb.connect()


def _eval_duck(src: str, variables=None) -> float:
    sql = compile_expression(src, "duckdb", variables)
    return _CON.execute(f"SELECT {sql}").fetchall()[0][0]


# --- TestJavascriptOperations vectors (expected = (long) result) ----------

_OPS_VECTORS = [
    ("-1", -1), ("--1", 1), ("-(-1)", 1), ("-0", 0), ("--0", 0),
    ("1+1", 2), ("1+0.5+0.5", 2), ("5+10", 15), ("1+1+2", 4),
    ("(1+1)+2", 4), ("1+(1+2)", 4), ("0+1", 1), ("1+0", 1), ("0+0", 0),
    ("1-1", 0), ("5-10", -5), ("1-0.5-0.5", 0), ("1-1-2", -2),
    ("(1-1)-2", -2), ("1-(1-2)", 2), ("0-1", -1), ("1-0", 1), ("0-0", 0),
    ("1*1", 1), ("5*10", 50), ("50*0.1", 5), ("1*1*2", 2), ("(1*1)*2", 2),
    ("1*(1*2)", 2), ("10*0", 0), ("0*0", 0),
    ("10/5", 2), ("10/0.5", 20), ("10/5/2", 1), ("(27/9)/3", 1),
    ("27/(9/3)", 9), ("1/0", 9223372036854775807),
    ("1%1", 0), ("10%3", 1), ("10%3%2", 1), ("(27%10)%4", 3),
    ("27%(9%5)", 3),
    ("1 < 1", 0), ("2 < 1", 0), ("1 < 2", 1), ("2 < 1 < 3", 1),
    ("2 < (1 < 3)", 0), ("(2 < 1) < 1", 1), ("-1 < -2", 0), ("-1 < 0", 1),
    ("1 <= 1", 1), ("2 <= 1", 0), ("1 <= 2", 1), ("1 <= 1 <= 0", 0),
    ("-1 <= -1", 1), ("-1 <= 0", 1), ("-1 <= -2", 0),
    ("1 > 1", 0), ("2 > 1", 1), ("1 > 2", 0), ("2 > 1 > 3", 0),
    ("2 > (1 > 3)", 1), ("(2 > 1) > 1", 0), ("-1 > -2", 1), ("-1 > 0", 0),
    ("1 >= 1", 1), ("2 >= 1", 1), ("1 >= 2", 0), ("1 >= 1 >= 0", 1),
    ("-1 >= -1", 1), ("-1 >= 0", 0), ("-1 >= -2", 1),
    ("1 == 1", 1), ("0 == 0", 1), ("-1 == -1", 1), ("1.1 == 1.1", 1),
    ("0.9 == 0.9", 1), ("-0 == 0", 1), ("0 == 1", 0), ("1 == 2", 0),
    ("-1 == 1", 0), ("-1 == 0", 0), ("-2 == 1", 0), ("-2 == -1", 0),
    ("1 != 1", 0), ("0 != 0", 0), ("-1 != -1", 0), ("1.1 != 1.1", 0),
    ("0.9 != 0.9", 0), ("-0 != 0", 0), ("0 != 1", 1), ("1 != 2", 1),
    ("-1 != 1", 1), ("-1 != 0", 1), ("-2 != 1", 1), ("-2 != -1", 1),
    ("!1", 0), ("!!1", 1), ("!0", 1), ("!!0", 0), ("!-1", 0), ("!2", 0),
    ("!-2", 0),
    ("1 && 1", 1), ("1 && 0", 0), ("0 && 1", 0), ("0 && 0", 0),
    ("-1 && -1", 1), ("-1 && 0", 0), ("0 && -1", 0), ("-0 && -0", 0),
    ("1 || 1", 1), ("1 || 0", 1), ("0 || 1", 1), ("0 || 0", 0),
    ("-1 || -1", 1), ("-1 || 0", 1), ("0 || -1", 1), ("-0 || -0", 0),
    ("1 ? 2 : 3", 2), ("-1 ? 2 : 3", 2), ("0 ? 2 : 3", 3),
    ("1 ? 2 ? 3 : 4 : 5", 3), ("0 ? 2 ? 3 : 4 : 5", 5),
    ("1 ? 0 ? 3 : 4 : 5", 4), ("1 ? 2 : 3 ? 4 : 5", 2),
    ("0 ? 2 : 3 ? 4 : 5", 4), ("0 ? 2 : 0 ? 4 : 5", 5),
    ("(1 ? 1 : 0) ? 3 : 4", 3), ("(0 ? 1 : 0) ? 3 : 4", 4),
    ("1 << 1", 2), ("2 << 1", 4), ("-1 << 31", -2147483648),
    ("3 << 5", 96), ("-5 << 3", -40), ("4195 << 7", 536960),
    ("4195 << 66", 16780), ("4195 << 6", 268480), ("4195 << 70", 268480),
    ("-4195 << 70", -268480), ("-15 << 62", 4611686018427387904),
    ("1 >> 1", 0), ("2 >> 1", 1), ("-1 >> 5", -1), ("-2 >> 30", -1),
    ("-5 >> 1", -3), ("536960 >> 7", 4195), ("16780 >> 66", 4195),
    ("268480 >> 6", 4195), ("268480 >> 70", 4195),
    ("-268480 >> 70", -4195), ("-2147483646 >> 1", -1073741823),
    ("1 >>> 1", 0), ("2 >>> 1", 1), ("-1 >>> 37", 134217727),
    ("-2 >>> 62", 3), ("-5 >>> 33", 2147483647), ("536960 >>> 7", 4195),
    ("16780 >>> 66", 4195), ("268480 >>> 6", 4195),
    ("268480 >>> 70", 4195), ("-268480 >>> 102", 67108863),
    ("2147483648 >>> 1", 1073741824),
    ("4 & 4", 4), ("3 & 2", 2), ("7 & 3", 3), ("-1 & -1", -1),
    ("-1 & 25", 25), ("3 & 7", 3), ("0 & 1", 0), ("1 & 0", 0),
    ("4 | 4", 4), ("5 | 2", 7), ("7 | 3", 7), ("-1 | -5", -1),
    ("-1 | 25", -1), ("-100 | 15", -97), ("0 | 1", 1), ("1 | 0", 1),
    ("4 ^ 4", 0), ("5 ^ 2", 7), ("15 ^ 3", 12), ("-1 ^ -5", 4),
    ("-1 ^ 25", -26), ("-100 ^ 15", -109), ("0 ^ 1", 1), ("1 ^ 0", 1),
    ("0 ^ 0", 0),
    ("~-5", 4), ("~25", -26), ("~0", -1), ("~-1", 0),
    ("0", 0), ("1", 1), ("123456789", 123456789),
    ("5.6E2", 560), ("5.6E+2", 560), ("500E-2", 5),
    ("0x0", 0), ("0x1", 1), ("0xF", 15), ("0x1234ABCDEF", 78193085935),
    ("1 << 0x1", 1 << 0x1), ("1 << 0xA", 1 << 0xA), ("0x1 << 2", 0x1 << 2),
    ("0xA << 2", 0xA << 2),
    ("0X0", 0), ("0X1", 1), ("0XF", 15), ("0X1234ABCDEF", 78193085935),
    ("00", 0), ("01", 1), ("010", 8), ("0123456777", 21913087),
    ("1 << 01", 1 << 0o1), ("1 << 010", 1 << 0o10), ("01 << 2", 0o1 << 2),
    ("010 << 2", 0o10 << 2),
]


def test_operations_reference_vectors():
    bad = []
    for src, want in _OPS_VECTORS:
        got = _jvm_d2l(_eval_duck(src))
        if got != want:
            bad.append((src, want, got))
    assert not bad, bad


# --- TestJavascriptFunction vectors (double compare) -----------------------

_PI = math.pi
_FN_VECTORS = [
    ("abs(0)", 0), ("abs(119)", 119), ("abs(1)", 1), ("abs(-1)", 1),
    ("acos(-1)", _PI), ("acos(-0.8660254)", _PI * 5 / 6),
    ("acos(-0.7071068)", _PI * 3 / 4), ("acos(-0.5)", _PI * 2 / 3),
    ("acos(0)", _PI / 2), ("acos(0.5)", _PI / 3),
    ("acos(0.7071068)", _PI / 4), ("acos(0.8660254)", _PI / 6),
    ("acos(1)", 0),
    ("acosh(1)", 0), ("acosh(2.5)", 1.5667992369724109),
    ("acosh(1234567.89)", 14.719378760739708),
    ("asin(-1)", -_PI / 2), ("asin(-0.5)", -_PI / 6), ("asin(0)", 0),
    ("asin(0.5)", _PI / 6), ("asin(1)", _PI / 2),
    ("asinh(-1234567.89)", -14.719378760740035),
    ("asinh(-2.5)", -1.6472311463710958),
    ("asinh(-1)", -0.8813735870195429), ("asinh(0)", 0),
    ("asinh(1)", 0.8813735870195429),
    ("asinh(2.5)", 1.6472311463710958),
    ("asinh(1234567.89)", 14.719378760740035),
    ("atan(-1)", -_PI / 4), ("atan(0)", 0), ("atan(1)", _PI / 4),
    ("atan2(0,0)", 0.0), ("atan2(2,2)", _PI / 4),
    ("atan2(-2,2)", -_PI / 4), ("atan2(2,-2)", _PI * 3 / 4),
    ("atan2(-2,-2)", -_PI * 3 / 4),
    ("atanh(-1)", -math.inf), ("atanh(-0.5)", -0.5493061443340549),
    ("atanh(0)", 0), ("atanh(0.5)", 0.5493061443340549),
    ("atanh(1)", math.inf),
    ("ceil(0)", 0), ("ceil(0.1)", 1), ("ceil(0.9)", 1),
    ("ceil(25.2)", 26), ("ceil(-0.1)", 0), ("ceil(-0.9)", 0),
    ("ceil(-1.1)", -1),
    ("cos(0)", 1), (f"cos({_PI / 2})", 0), (f"cos({_PI / 4})", 0.7071068),
    (f"cos({_PI * 2 / 3})", -0.5), (f"cos({_PI / 6})", 0.8660254),
    ("cosh(0)", 1), ("cosh(-1)", 1.5430806348152437),
    ("cosh(1)", 1.5430806348152437),
    ("cosh(-12.3456789)", 114982.09728671524),
    ("cosh(12.3456789)", 114982.09728671524),
    ("exp(0)", 1), ("exp(-1)", 0.36787944117), ("exp(1)", 2.71828182846),
    ("exp(-12.3456789)", 0.0000043485), ("exp(12.3456789)", 229964.194569),
    ("floor(0)", 0), ("floor(0.1)", 0), ("floor(25.2)", 25),
    ("floor(-0.1)", -1), ("floor(-1.1)", -2),
    (
        "haversin(40.7143528,-74.0059731,40.759011,-73.9844722)",
        5.285885589128259,
    ),
    ("ln(0)", -math.inf), (f"ln({math.e})", 1), ("ln(-1)", math.nan),
    ("ln(1)", 0), ("ln(0.5)", -0.69314718056),
    ("ln(12.3456789)", 2.51330611521),
    ("log10(0)", -math.inf), ("log10(1)", 0), ("log10(-1)", math.nan),
    ("log10(0.5)", -0.3010299956639812),
    ("log10(12.3456789)", 1.0915149771692705),
    ("logn(2, 0)", -math.inf), ("logn(2, 1)", 0), ("logn(2, -1)", math.nan),
    ("logn(2, 0.5)", -1), ("logn(2, 12.3456789)", 3.6259342686489378),
    ("logn(2.5, 0.5)", -0.75647079736603),
    ("logn(2.5, 12.3456789)", 2.7429133874016745),
    ("max(0, 0)", 0), ("max(1, 0)", 1), ("max(0, -1)", 0),
    ("max(-1, 0)", 0), ("max(25, 23)", 25),
    ("min(0, 0)", 0), ("min(1, 0)", 0), ("min(0, -1)", -1),
    ("min(-1, 0)", -1), ("min(25, 23)", 23),
    ("pow(0, 0)", 1), ("pow(0.1, 2)", 0.01),
    ("pow(0.9, -1)", 1.1111111111111112),
    ("pow(2.2, -2.5)", 0.13929749224447147), ("pow(5, 3)", 125),
    ("pow(-0.9, 5)", -0.59049), ("pow(-1.1, 2)", 1.21),
    ("sin(0)", 0), (f"sin({_PI / 2})", 1), (f"sin({-_PI / 2})", -1),
    (f"sin({_PI / 6})", 0.5),
    ("sinh(0)", 0), ("sinh(-1)", -1.1752011936438014),
    ("sinh(1)", 1.1752011936438014),
    ("sinh(-12.3456789)", -114982.09728236674),
    ("sinh(12.3456789)", 114982.09728236674),
    ("sqrt(0)", 0), ("sqrt(-1)", math.nan), ("sqrt(0.49)", 0.7),
    ("sqrt(49)", 7),
    ("tan(0)", 0), ("tan(-1)", -1.55740772465), ("tan(1)", 1.55740772465),
    ("tan(-1.3)", -3.60210244797), ("tan(1.3)", 3.60210244797),
    ("tanh(0)", 0), ("tanh(-1)", -0.76159415595),
    ("tanh(1)", 0.76159415595), ("tanh(-12.3456789)", -0.99999999996),
    ("tanh(12.3456789)", 0.99999999996),
]


def _feq(got, want, tol=1e-6):
    if want != want:  # NaN
        return got != got
    if math.isinf(want):
        return got == want
    return math.isclose(got, want, rel_tol=tol, abs_tol=tol)


def test_function_reference_vectors():
    bad = []
    for src, want in _FN_VECTORS:
        got = _eval_duck(src)
        # haversin uses exact trig vs the reference's table trig
        tol = 1e-4 if src.startswith("haversin") else 1e-6
        if not _feq(got, float(want), tol):
            bad.append((src, want, got))
    assert not bad, bad


# --- infinity / NaN corner semantics (JVM, not SQL-native) -----------------


def test_jvm_corner_semantics():
    assert _eval_duck("1/0") == math.inf
    assert _eval_duck("-1/0") == -math.inf
    assert math.isnan(_eval_duck("0/0"))
    assert math.isnan(_eval_duck("5%0"))
    assert math.isnan(_eval_duck("(1/0) % 3"))
    assert _eval_duck("3 % (1/0)") == 3.0
    assert math.isnan(_eval_duck("sqrt(0-1)"))
    assert math.isnan(_eval_duck("acos(2)"))
    # NaN comparisons: all false; != true (JVM dcmp, unlike SQL NaN order)
    assert _eval_duck("sqrt(0-1) == sqrt(0-1)") == 0.0
    assert _eval_duck("sqrt(0-1) != 1") == 1.0
    assert _eval_duck("sqrt(0-1) < 1") == 0.0
    assert _eval_duck("sqrt(0-1) > 1") == 0.0
    assert math.isnan(_eval_duck("max(sqrt(0-1), 5)"))
    assert math.isnan(_eval_duck("min(sqrt(0-1), 5)"))
    # NaN truth-tests as d2l(NaN)=0 -> false
    assert _eval_duck("sqrt(0-1) ? 7 : 8") == 8.0
    assert _eval_duck("!(sqrt(0-1))") == 1.0
    # d2l saturation in bitwise context
    assert _eval_duck("(1/0) & -1") == float(2**63 - 1)
    assert _eval_duck("(-1/0) & -1") == float(-(2**63))


def test_variables_and_errors():
    sql = compile_expression("sqrt(v) + 1", "duckdb", {"v": "16.0"})
    assert _CON.execute(f"SELECT {sql}").fetchall()[0][0] == 5.0
    # unmapped simple names pass through as column refs
    assert "n_chars" in compile_expression("n_chars * 2")
    with pytest.raises(JavascriptParseError):
        compile_expression("popularity ** 2")
    with pytest.raises(JavascriptParseError):
        compile_expression("foo(3)")
    with pytest.raises(JavascriptParseError):
        compile_expression("pow(3)")  # wrong arity
    with pytest.raises(JavascriptParseError):
        compile_expression("1 +")
    with pytest.raises(JavascriptParseError):
        compile_expression("a.b + 1")  # dotted needs explicit binding
    # custom functions extend the arity table
    # (JavascriptCompiler.compile(source, functions) seam)
    sql = compile_expression("cbrt(27)", "duckdb", functions={"cbrt": 1})
    assert _feq(_CON.execute(f"SELECT {sql}").fetchall()[0][0], 3.0)


# --- randomized cross-check vs a JVM-semantics Python evaluator ------------


def _py_jvm_eval(node, env):
    """Evaluate the module's AST with JVM numeric semantics."""
    kind = node[0]
    if kind == "num":
        return node[1]
    if kind == "var":
        return float(env[node[1]])
    if kind == "cond":
        c = _jvm_d2l(_py_jvm_eval(node[1], env))
        return _py_jvm_eval(node[2] if c != 0 else node[3], env)
    if kind == "un":
        op, x = node[1], node[2]
        if op == "+":
            return _py_jvm_eval(x, env)
        if op == "-":
            return -_py_jvm_eval(x, env)
        if op == "!":
            return 0.0 if _jvm_d2l(_py_jvm_eval(x, env)) != 0 else 1.0
        return float(_wrap64(_jvm_d2l(_py_jvm_eval(x, env)) ^ -1))
    if kind == "call":
        a = [_py_jvm_eval(x, env) for x in node[2]]
        return _py_fn(node[1], a)
    op, l, r = node[1], node[2], node[3]
    if op in ("&&", "||"):
        lt = _jvm_d2l(_py_jvm_eval(l, env)) != 0
        rt = _jvm_d2l(_py_jvm_eval(r, env)) != 0
        return float((lt and rt) if op == "&&" else (lt or rt))
    lv, rv = _py_jvm_eval(l, env), _py_jvm_eval(r, env)
    if op in ("<", "<=", ">", ">=", "==", "!="):
        if math.isnan(lv) or math.isnan(rv):
            return 1.0 if op == "!=" else 0.0
        return float(
            {"<": lv < rv, "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv,
             "==": lv == rv, "!=": lv != rv}[op]
        )
    if op in ("&", "|", "^"):
        li, ri = _jvm_d2l(lv), _jvm_d2l(rv)
        return float(
            _wrap64({"&": li & ri, "|": li | ri, "^": li ^ ri}[op])
        )
    if op in ("<<", ">>", ">>>"):
        li, s = _jvm_d2l(lv), _jvm_d2l(rv) & 63
        if op == "<<":
            return float(_wrap64(li << s))
        if op == ">>":
            return float(li >> s)  # python >> on int is arithmetic
        return float(_wrap64((li & 0xFFFFFFFFFFFFFFFF) >> s))
    if op == "+":
        return lv + rv
    if op == "-":
        return lv - rv
    if op == "*":
        return lv * rv
    if op == "/":
        return _jdiv(lv, rv)
    # %
    if rv == 0.0 or math.isnan(rv) or math.isnan(lv) or math.isinf(lv):
        return math.nan
    return math.fmod(lv, rv)


def _jdiv(lv: float, rv: float) -> float:
    """IEEE double division (JVM DDIV)."""
    if rv != 0.0:
        try:
            return lv / rv
        except OverflowError:
            return math.inf
    if math.isnan(lv) or lv == 0.0 or math.isnan(rv):
        return math.nan
    neg = math.copysign(1.0, rv) < 0
    return -math.inf if (lv > 0) == neg else math.inf


def _wrap64(v: int) -> int:
    v &= 0xFFFFFFFFFFFFFFFF
    return v - (1 << 64) if v >= (1 << 63) else v


def _py_fn(name, a):
    try:
        if name == "abs":
            return abs(a[0])
        if name in ("acos", "asin"):
            if math.isnan(a[0]) or not -1.0 <= a[0] <= 1.0:
                return math.nan
            return getattr(math, name)(a[0])
        if name == "acosh":
            if math.isnan(a[0]) or a[0] < 1.0:
                return math.nan
            return math.log(math.sqrt(a[0] * a[0] - 1.0) + a[0])
        if name == "asinh":
            x = abs(a[0])
            s = -1.0 if a[0] < 0 else 1.0
            return s * math.log(math.sqrt(x * x + 1.0) + x)
        if name == "atanh":
            x = a[0]
            if math.isnan(x) or abs(x) > 1.0:
                return math.nan
            if abs(x) == 1.0:
                return math.copysign(math.inf, x)
            m = -0.5 if x < 0 else 0.5
            return m * math.log((1.0 + abs(x)) / (1.0 - abs(x)))
        if name == "atan":
            return math.atan(a[0])
        if name == "atan2":
            return math.atan2(a[0], a[1])
        if name == "ceil":
            if math.isnan(a[0]) or abs(a[0]) >= 2.0**52:
                return a[0]
            return float(math.ceil(a[0]))
        if name == "floor":
            if math.isnan(a[0]) or abs(a[0]) >= 2.0**52:
                return a[0]
            return float(math.floor(a[0]))
        if name in ("cos", "sin", "tan"):
            if math.isnan(a[0]) or math.isinf(a[0]):
                return math.nan
            return getattr(math, name)(a[0])
        if name in ("cosh", "sinh", "tanh"):
            return getattr(math, name)(a[0])
        if name == "exp":
            return math.exp(a[0]) if a[0] < 700 else math.inf
        if name in ("ln", "log10"):
            x = a[0]
            if math.isnan(x) or x < 0:
                return math.nan
            if x == 0:
                return -math.inf
            return math.log(x) if name == "ln" else math.log10(x)
        if name == "logn":
            base, x = a
            def _l(v):
                if math.isnan(v) or v < 0:
                    return math.nan
                return -math.inf if v == 0 else math.log(v)
            return _jdiv(_l(x), _l(base))
        if name == "max":
            return math.nan if any(map(math.isnan, a)) else max(a)
        if name == "min":
            return math.nan if any(map(math.isnan, a)) else min(a)
        if name == "pow":
            x, y = a
            if x == 0.0 and y < 0:  # Math.pow(±0, neg) -> ±Inf
                odd = float(y).is_integer() and int(y) % 2 != 0
                neg = odd and math.copysign(1.0, x) < 0
                return -math.inf if neg else math.inf
            try:
                return math.pow(x, y)
            except OverflowError:  # Java overflows to ±Inf
                odd = float(y).is_integer() and int(y) % 2 != 0
                return -math.inf if (x < 0 and odd) else math.inf
        if name == "sqrt":
            if math.isnan(a[0]) or a[0] < 0:
                return math.nan
            return math.sqrt(a[0])
    except (ValueError, OverflowError):
        return math.nan
    raise AssertionError(name)


def _random_expr(rng, depth):
    if depth <= 0:
        pick = rng.random()
        if pick < 0.4:
            return f"{rng.uniform(-50, 50):.4f}"
        if pick < 0.6:
            return str(rng.randint(-100, 100))
        return rng.choice(["va", "vb", "vc"])
    pick = rng.random()
    a = _random_expr(rng, depth - 1)
    b = _random_expr(rng, depth - 1)
    if pick < 0.45:
        op = rng.choice(["+", "-", "*", "/", "%"])
        return f"({a} {op} {b})"
    if pick < 0.6:
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        return f"({a} {op} {b})"
    if pick < 0.7:
        op = rng.choice(["&", "|", "^", "<<", ">>", ">>>", "&&", "||"])
        return f"({a} {op} {b})"
    if pick < 0.8:
        c = _random_expr(rng, depth - 1)
        return f"({a} ? {b} : {c})"
    if pick < 0.9:
        fn = rng.choice(
            ["abs", "sqrt", "exp", "ln", "floor", "ceil", "cos", "sin",
             "tanh", "atan"]
        )
        return f"{fn}({a})"
    fn = rng.choice(["max", "min", "pow", "atan2", "logn"])
    return f"{fn}({a}, {b})"


def test_fuzz_duckdb_vs_jvm_python():
    from lucene_spark.expressions import _lex, _Parser

    rng = random.Random(42)
    env = {"va": 3.25, "vb": -7.5, "vc": 0.0}
    checked = 0
    for _ in range(300):
        src = _random_expr(rng, rng.randint(1, 3))
        ast = _Parser(_lex(src), DEFAULT_FUNCTIONS).parse()
        want = _py_jvm_eval(ast, env)
        got = _eval_duck(
            src, {k: repr(v) for k, v in env.items()}
        )
        assert _feq(got, want, 1e-9), (src, want, got)
        checked += 1
    assert checked == 300


# --- Spark dialect parity (live session) -----------------------------------


def test_spark_duckdb_parity(spark):
    from pyspark.sql import functions as F

    exprs = [
        "1/0", "-1/0", "0/0", "5%0", "10%3", "-10%3",
        "sqrt(0-1) == sqrt(0-1)", "sqrt(0-1) != 1", "max(sqrt(0-1), 5)",
        "-5 << 3", "-1 >>> 37", "4195 << 70", "-268480 >> 70",
        "~25", "-1 ^ 25", "(1/0) & -1", "(-1/0) & -1",
        "0x1234ABCDEF", "0123456777",
        "ln(0)", "ln(-1)", "logn(2, 12.3456789)", "acosh(2.5)",
        "asinh(-2.5)", "atanh(0.5)", "cosh(1)", "sinh(-1)", "tanh(12.3)",
        "haversin(40.7143528,-74.0059731,40.759011,-73.9844722)",
        "0.5 && 1", "1.5 && 1", "!0.5", "0.5 ? 7 : 8",
        "(va + vb) * sqrt(abs(vc - 2))",
        "min(max(va, vb), 10) + pow(2, vc)",
    ]
    env = {"va": 3.25, "vb": -7.5, "vc": 2.0}
    binds = {k: repr(v) for k, v in env.items()}
    cols = [
        F.expr(compile_expression(s, "spark", binds)).alias(f"e{i}")
        for i, s in enumerate(exprs)
    ]
    row = spark.range(1).select(*cols).collect()[0]
    for i, src in enumerate(exprs):
        want = _eval_duck(src, binds)
        got = row[f"e{i}"]
        assert _feq(got, want, 1e-9), (src, want, got)
