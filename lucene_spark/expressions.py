"""Lucene expressions module analog — the JavaScript-like expression
language compiled to a SQL scalar expression instead of JVM bytecode.

Reference: lucene/expressions/src/java/org/apache/lucene/expressions/js/
  Javascript.g4                 (grammar: precedence ladder, literals)
  JavascriptCompiler.java:296-680 (typed-stack semantics: everything is
      double at the top; bitwise/shift operands pass through d2l
      truncation; boolean contexts test trunc(x) != 0; comparisons
      produce 1.0/0.0; ternary is lazy)
  JavascriptCompiler.properties (the 25-function Math table)
  org/apache/lucene/util/MathUtil.java:99-151 (asinh/acosh/atanh)
  org/apache/lucene/util/SloppyMath.java:47-95 (haversin)

Where the reference emits JVM bytecode evaluated per-document, this
engine emits a Spark SQL expression string — Catalyst folds it into
whole-stage codegen, so an expression over doc values costs a projection,
not a UDF. The same AST also renders to a DuckDB dialect so every
expression is oracle-checkable (the driver's correctness gate runs the
Spark rendering and the DuckDB rendering of the SAME source side by
side).

JVM-exactness notes (all guards emitted inline, both dialects):
- d2l truncates toward zero, saturates at Long.MIN/MAX, NaN -> 0 —
  exactly JVM ``(long) x`` (D2L).
- x/0, x%0, sqrt(-1), log(0), log(-1), acos(2) etc. produce the Java
  Infinity/NaN results (DuckDB would otherwise NULL or raise).
- NaN comparisons are all-false (!= is all-true) like JVM dcmp, NOT the
  NaN-greatest total order Spark and DuckDB use natively.
- Documented deviations: shift counts are masked ``& 63`` after LONG
  (not int) truncation — differs from the JVM only for counts with
  |count| >= 2^31; Math.max/min of (+0.0, -0.0) zero-sign is not
  reproduced; haversin uses exact trig where SloppyMath uses table
  lookups (|err| <= ~1e-7 km).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

__all__ = ["compile_expression", "expression_column", "JavascriptParseError"]


class JavascriptParseError(ValueError):
    """Raised on lexical/syntax/arity errors, with position info
    (JavascriptCompiler raises ParseException with position)."""


# ---------------------------------------------------------------------------
# Lexer (Javascript.g4:46-89)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<octal>0[0-7]+)
  | (?P<decimal>(?:(?:0|[1-9][0-9]*)(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+\-]?[0-9]+)?)
  | (?P<variable>[_$a-zA-Z][_$a-zA-Z0-9]*(?:\.[_$a-zA-Z][_$a-zA-Z0-9]*)*)
  | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!~<>&^|?:,])
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class _Tok:
    kind: str  # 'num' | 'var' | 'op'
    text: str
    value: float = 0.0
    from_long: bool = False  # hex/octal literals push a long (pushLong)
    pos: int = 0


def _lex(source: str) -> list[_Tok]:
    out, i, n = [], 0, len(source)
    while i < n:
        m = _TOKEN_RE.match(source, i)
        if m is None:
            raise JavascriptParseError(
                f"unexpected character {source[i]!r} at position {i}"
            )
        i = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "hex":
            out.append(_Tok("num", text, float(int(text, 16)), True, m.start()))
        elif kind == "octal":
            out.append(_Tok("num", text, float(int(text, 8)), True, m.start()))
        elif kind == "decimal":
            out.append(_Tok("num", text, float(text), False, m.start()))
        elif kind == "variable":
            out.append(_Tok("var", text, pos=m.start()))
        else:
            out.append(_Tok("op", text, pos=m.start()))
    return out


# ---------------------------------------------------------------------------
# Parser — precedence ladder straight from Javascript.g4:28-44

_Num = tuple  # ('num', float value, bool from_long)
# nodes: ('num', v, from_long) ('var', name) ('call', name, [args])
#        ('un', op, x) ('bin', op, l, r) ('cond', c, t, f)


class _Parser:
    def __init__(self, toks: list[_Tok], functions: dict):
        self.toks = toks
        self.i = 0
        self.functions = functions

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _eat(self, text: str | None = None) -> _Tok:
        t = self._peek()
        if t is None:
            raise JavascriptParseError("unexpected end of expression")
        if text is not None and not (t.kind == "op" and t.text == text):
            raise JavascriptParseError(
                f"expected {text!r} at position {t.pos}, found {t.text!r}"
            )
        self.i += 1
        return t

    def parse(self):
        node = self._ternary()
        if self._peek() is not None:
            t = self._peek()
            raise JavascriptParseError(
                f"trailing input at position {t.pos}: {t.text!r}"
            )
        return node

    def _ternary(self):
        cond = self._binary(0)
        t = self._peek()
        if t is not None and t.kind == "op" and t.text == "?":
            self._eat("?")
            then = self._ternary()  # <assoc=right>
            self._eat(":")
            other = self._ternary()
            return ("cond", cond, then, other)
        return cond

    # binary precedence, loosest-first (index = level)
    _LEVELS = [
        ("||",),
        ("&&",),
        ("|",),
        ("^",),
        ("&",),
        ("==", "!="),
        ("<", "<=", ">", ">="),
        ("<<", ">>", ">>>"),
        ("+", "-"),
        ("*", "/", "%"),
    ]

    def _binary(self, level: int):
        if level >= len(self._LEVELS):
            return self._unary()
        ops = self._LEVELS[level]
        node = self._binary(level + 1)
        while True:
            t = self._peek()
            if t is None or t.kind != "op" or t.text not in ops:
                return node
            self._eat(t.text)
            rhs = self._binary(level + 1)
            node = ("bin", t.text, node, rhs)

    def _unary(self):
        t = self._peek()
        if t is not None and t.kind == "op" and t.text in ("!", "~", "+", "-"):
            self._eat(t.text)
            return ("un", t.text, self._unary())
        return self._primary()

    def _primary(self):
        t = self._peek()
        if t is None:
            raise JavascriptParseError("unexpected end of expression")
        if t.kind == "op" and t.text == "(":
            self._eat("(")
            node = self._ternary()
            self._eat(")")
            return node
        if t.kind == "num":
            self._eat()
            return ("num", t.value, t.from_long)
        if t.kind == "var":
            self._eat()
            nxt = self._peek()
            if nxt is not None and nxt.kind == "op" and nxt.text == "(":
                self._eat("(")
                args = []
                if not (self._peek() and self._peek().text == ")"):
                    args.append(self._ternary())
                    while self._peek() and self._peek().text == ",":
                        self._eat(",")
                        args.append(self._ternary())
                self._eat(")")
                if t.text not in self.functions:
                    raise JavascriptParseError(
                        f"unrecognized function {t.text!r} at position {t.pos}"
                    )
                arity = self.functions[t.text]
                if len(args) != arity:
                    raise JavascriptParseError(
                        f"function {t.text!r} expects {arity} argument(s),"
                        f" got {len(args)}"
                    )
                return ("call", t.text, args)
            return ("var", t.text)
        raise JavascriptParseError(
            f"unexpected token {t.text!r} at position {t.pos}"
        )


# arity table = JavascriptCompiler.properties (the DEFAULT_FUNCTIONS map)
DEFAULT_FUNCTIONS = {
    "abs": 1, "acos": 1, "acosh": 1, "asin": 1, "asinh": 1, "atan": 1,
    "atan2": 2, "atanh": 1, "ceil": 1, "cos": 1, "cosh": 1, "exp": 1,
    "floor": 1, "haversin": 4, "ln": 1, "log10": 1, "logn": 2, "max": 2,
    "min": 2, "pow": 2, "sin": 1, "sinh": 1, "sqrt": 1, "tan": 1,
    "tanh": 1,
}

_LONG_MAX = 2**63 - 1
_LONG_MIN = -(2**63)
_TWO63 = "9223372036854775808.0"  # 2^63 exactly as a double literal
_TO_KILOMETERS = "6371.0087714"  # SloppyMath.TO_METERS / 1000


def _jvm_d2l(x: float) -> int:
    """JVM D2L: truncate toward zero, saturate, NaN -> 0 (compile-time
    constant folding twin of the emitted d2l)."""
    if math.isnan(x):
        return 0
    if x >= 2.0**63:
        return _LONG_MAX
    if x <= -(2.0**63):
        return _LONG_MIN
    return int(x)  # python int() truncates toward zero


class _Emitter:
    """Render the AST to one SQL scalar (type DOUBLE) for a dialect.

    ``ctx`` mirrors JavascriptCompiler's typeStack: 'D' wants a DOUBLE
    result, 'L' a BIGINT (the JVM pushes INT for truth tests, but d2i
    and d2l agree on trunc(x) != 0 because both saturate, so one long
    context suffices)."""

    def __init__(self, dialect: str, variables: dict | None):
        if dialect not in ("spark", "duckdb"):
            raise ValueError(f"unknown dialect {dialect!r}")
        self.dialect = dialect
        self.variables = variables or {}

    # --- literals ---------------------------------------------------------

    def _dbl(self, v: float) -> str:
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"

    def _lng(self, v: int) -> str:
        if v == _LONG_MIN:  # parsers reject the bare MIN literal
            return "CAST(-9223372036854775807 AS BIGINT) - 1"
        return f"CAST({v} AS BIGINT)"

    def _nan(self) -> str:
        return "CAST('NaN' AS DOUBLE)"

    def _inf(self, neg: bool = False) -> str:
        return f"CAST('{'-' if neg else ''}Infinity' AS DOUBLE)"

    # --- type plumbing ----------------------------------------------------

    def _d2l(self, x: str) -> str:
        trunc = (
            f"trunc({x})"
            if self.dialect == "duckdb"
            else f"(CASE WHEN {x} < 0.0 THEN CEIL({x}) ELSE FLOOR({x}) END)"
        )
        return (
            f"(CASE WHEN isnan({x}) THEN CAST(0 AS BIGINT)"
            f" WHEN {x} >= {_TWO63} THEN {self._lng(_LONG_MAX)}"
            f" WHEN {x} <= -{_TWO63} THEN {self._lng(_LONG_MIN)}"
            f" ELSE CAST({trunc} AS BIGINT) END)"
        )

    def _l2d(self, x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    def _as(self, sql: str, have: str, want: str) -> str:
        if have == want:
            return sql
        return self._d2l(sql) if want == "L" else self._l2d(sql)

    def _truth(self, node) -> str:
        """IFEQ/IFNE test: trunc(x) != 0."""
        return f"({self.emit(node, 'L')} <> CAST(0 AS BIGINT))"

    def _bool(self, pred: str, ctx: str) -> str:
        one, zero = (
            (self._dbl(1.0), self._dbl(0.0))
            if ctx == "D"
            else (self._lng(1), self._lng(0))
        )
        return f"(CASE WHEN {pred} THEN {one} ELSE {zero} END)"

    # --- operators --------------------------------------------------------

    def emit(self, node, ctx: str) -> str:
        kind = node[0]
        if kind == "num":
            _, v, from_long = node
            if from_long:  # pushLong: hex/octal fold per context
                return self._lng(int(v)) if ctx == "L" else self._dbl(v)
            return (
                self._lng(_jvm_d2l(v)) if ctx == "L" else self._dbl(v)
            )
        if kind == "var":
            name = node[1]
            sql = self.variables.get(name)
            if sql is None:
                if "." in name:
                    raise JavascriptParseError(
                        f"dotted variable {name!r} needs an explicit"
                        f" binding in `variables`"
                    )
                sql = name
            d = f"CAST({sql} AS DOUBLE)"
            return self._as(d, "D", ctx)
        if kind == "call":
            return self._as(self._call(node[1], node[2]), "D", ctx)
        if kind == "un":
            return self._un(node[1], node[2], ctx)
        if kind == "bin":
            return self._bin(node[1], node[2], node[3], ctx)
        if kind == "cond":
            _, c, t, f = node
            return (
                f"(CASE WHEN {self._truth(c)} THEN {self.emit(t, ctx)}"
                f" ELSE {self.emit(f, ctx)} END)"
            )
        raise AssertionError(kind)

    def _un(self, op: str, x, ctx: str) -> str:
        if op == "+":
            return self.emit(x, ctx)
        if op == "-":
            return self._as(f"(- {self.emit(x, 'D')})", "D", ctx)
        if op == "!":
            return self._bool(f"NOT {self._truth(x)}", ctx)
        # ~x = x XOR -1 in LONG type (JavascriptCompiler LXOR with -1)
        l = self.emit(x, "L")
        neg1 = self._lng(-1)
        inner = (
            f"xor({l}, {neg1})"
            if self.dialect == "duckdb"
            else f"({l} ^ {neg1})"
        )
        return self._as(inner, "L", ctx)

    def _bin(self, op: str, lhs, rhs, ctx: str) -> str:
        if op in ("+", "-", "*"):
            l, r = self.emit(lhs, "D"), self.emit(rhs, "D")
            return self._as(f"({l} {op} {r})", "D", ctx)
        if op == "/":
            return self._as(self._divide(lhs, rhs), "D", ctx)
        if op == "%":
            return self._as(self._remainder(lhs, rhs), "D", ctx)
        if op in ("&", "|", "^"):
            l, r = self.emit(lhs, "L"), self.emit(rhs, "L")
            if self.dialect == "duckdb" and op == "^":
                return self._as(f"xor({l}, {r})", "L", ctx)
            return self._as(f"({l} {op} {r})", "L", ctx)
        if op in ("<<", ">>", ">>>"):
            return self._as(self._shift(op, lhs, rhs), "L", ctx)
        if op in ("<", "<=", ">", ">="):
            l, r = self.emit(lhs, "D"), self.emit(rhs, "D")
            # JVM dcmp: any NaN operand -> false (Spark/DuckDB natively
            # order NaN greatest, so guard explicitly)
            pred = (
                f"(NOT isnan({l}) AND NOT isnan({r}) AND {l} {op} {r})"
            )
            return self._bool(pred, ctx)
        if op in ("==", "!="):
            l, r = self.emit(lhs, "D"), self.emit(rhs, "D")
            eq = f"(NOT isnan({l}) AND NOT isnan({r}) AND {l} = {r})"
            pred = eq if op == "==" else f"(NOT {eq})"
            return self._bool(pred, ctx)
        if op == "&&":
            return self._bool(
                f"({self._truth(lhs)} AND {self._truth(rhs)})", ctx
            )
        if op == "||":
            return self._bool(
                f"({self._truth(lhs)} OR {self._truth(rhs)})", ctx
            )
        raise AssertionError(op)

    def _divide(self, lhs, rhs) -> str:
        return self._div_sql(self.emit(lhs, "D"), self.emit(rhs, "D"))

    def _div_sql(self, l: str, r: str) -> str:
        # IEEE double division (JVM DDIV): x/±0 -> ±Inf by the sign
        # product, 0/0 and NaN/0 -> NaN. Spark (ANSI) raises and DuckDB
        # NULLs zero denominators, so the zero branch is rebuilt
        # exactly. Spark's ANSI ConstantFolding evaluates even
        # not-taken CASE branches, so the division itself must be the
        # never-raising try_divide; -0.0 detection uses atan2(r, -1)
        # (±π by the zero's sign — Spark has no signbit()).
        if self.dialect == "duckdb":
            neg_zero = f"signbit({r})"
            div = f"{l} / {r}"
        else:
            neg_zero = f"(atan2({r}, -1.0) < 0.0)"
            div = f"try_divide({l}, {r})"
        return (
            f"(CASE WHEN {r} <> 0.0 OR isnan({r}) THEN {div}"
            f" WHEN isnan({l}) OR {l} = 0.0 THEN {self._nan()}"
            f" WHEN ({l} > 0.0) = ({neg_zero}) THEN {self._inf(True)}"
            f" ELSE {self._inf()} END)"
        )

    def _remainder(self, lhs, rhs) -> str:
        l, r = self.emit(lhs, "D"), self.emit(rhs, "D")
        # JVM DREM: sign of the dividend; x % 0 and Inf % y -> NaN;
        # x % Inf -> x. Both engines match the finite cases but NULL
        # the zero divisor.
        if self.dialect == "duckdb":
            isinf_l = f"isinf({l})"
            mod = f"{l} % {r}"
        else:
            # try_mod: Spark's ANSI % raises on a zero divisor even
            # when constant-folding a not-taken branch
            isinf_l = f"(abs({l}) = {self._inf()})"
            mod = f"try_mod({l}, {r})"
        return (
            f"(CASE WHEN {r} = 0.0 OR isnan({r}) OR isnan({l})"
            f" OR {isinf_l} THEN {self._nan()}"
            f" ELSE {mod} END)"
        )

    def _shift(self, op: str, lhs, rhs) -> str:
        l = self.emit(lhs, "L")
        # JVM masks the (int-typed) count to 0..63; we mask after LONG
        # truncation — differs only for |count| >= 2^31 (documented)
        cnt = f"({self.emit(rhs, 'L')} & {self._lng(63)})"
        if self.dialect == "spark":
            fn = {
                "<<": "shiftleft",
                ">>": "shiftright",
                ">>>": "shiftrightunsigned",
            }[op]
            return f"{fn}({l}, CAST({cnt} AS INT))"
        # DuckDB: << raises on negative/overflow and has no >>>, so the
        # two lossy shifts run in HUGEINT modular arithmetic; >> is
        # already arithmetic like the JVM's LSHR.
        if op == ">>":
            return f"({l} >> {cnt})"
        two64 = "CAST(18446744073709551616 AS HUGEINT)"
        two63 = "CAST(9223372036854775808 AS HUGEINT)"
        # power(2.0, n) is exact for n in 0..63
        pow2 = f"CAST(power(2.0, CAST({cnt} AS DOUBLE)) AS HUGEINT)"
        if op == "<<":
            raw = f"(CAST({l} AS HUGEINT) * {pow2})"
        else:  # >>> : reinterpret as unsigned, floor-divide
            u = (
                f"(CASE WHEN {l} >= 0 THEN CAST({l} AS HUGEINT)"
                f" ELSE CAST({l} AS HUGEINT) + {two64} END)"
            )
            raw = f"({u} // {pow2})"
        lo64 = f"((({raw}) % {two64} + {two64}) % {two64})"
        return (
            f"CAST((CASE WHEN {lo64} >= {two63} THEN {lo64} - {two64}"
            f" ELSE {lo64} END) AS BIGINT)"
        )

    # --- function table ---------------------------------------------------

    def _call(self, name: str, args: list) -> str:
        a = [self.emit(x, "D") for x in args]
        d = self.dialect
        nan, inf = self._nan(), self._inf()
        if name not in DEFAULT_FUNCTIONS:
            # custom function (JavascriptCompiler.compile(source,
            # functions) seam): emitted verbatim, the target engine
            # must resolve the name
            return f"{name}({', '.join(a)})"
        if name == "abs":
            return f"abs({a[0]})"
        if name in ("acos", "asin"):
            # Java: out-of-domain -> NaN (DuckDB raises)
            return (
                f"(CASE WHEN isnan({a[0]}) OR {a[0]} < -1.0 OR {a[0]} > 1.0"
                f" THEN {nan} ELSE {name}({a[0]}) END)"
            )
        if name == "atan":
            return f"atan({a[0]})"
        if name == "atan2":
            return f"atan2({a[0]}, {a[1]})"
        if name == "acosh":  # MathUtil.acosh: log(sqrt(a*a-1)+a)
            return (
                f"(CASE WHEN isnan({a[0]}) OR {a[0]} < 1.0 THEN {nan}"
                f" ELSE {self._ln_pos(f'(sqrt({a[0]} * {a[0]} - 1.0) + {a[0]})')} END)"
            )
        if name == "asinh":  # MathUtil.asinh: sign * log(sqrt(a²+1)+|a|)
            x = a[0]
            pos = self._ln_pos(f"(sqrt({x} * {x} + 1.0) + abs({x}))")
            return (
                f"(CASE WHEN isnan({x}) THEN {nan}"
                f" WHEN {x} < 0.0 THEN -{pos} ELSE {pos} END)"
            )
        if name == "atanh":  # MathUtil.atanh: ±0.5 * log((1+|a|)/(1-|a|))
            x = a[0]
            return (
                f"(CASE WHEN isnan({x}) OR {x} < -1.0 OR {x} > 1.0 THEN {nan}"
                f" WHEN {x} = 1.0 THEN {inf}"
                f" WHEN {x} = -1.0 THEN {self._inf(True)}"
                f" WHEN {x} < 0.0 THEN"
                f" -0.5 * {self._ln_pos(f'((1.0 + abs({x})) / (1.0 - abs({x})))')}"
                f" ELSE 0.5 * {self._ln_pos(f'((1.0 + {x}) / (1.0 - {x}))')}"
                f" END)"
            )
        if name in ("ceil", "floor"):
            x = a[0]
            # doubles >= 2^52 are already integral (Math.ceil identity);
            # the guard also keeps Spark's LONG-returning ceil in range
            fn = f"CAST({name}({x}) AS DOUBLE)"
            return (
                f"(CASE WHEN isnan({x}) OR abs({x}) >= 4503599627370496.0"
                f" THEN {x} ELSE {fn} END)"
            )
        if name in ("cos", "sin", "tan"):
            x = a[0]
            isinf = (
                f"isinf({x})" if d == "duckdb" else f"(abs({x}) = {inf})"
            )
            return (
                f"(CASE WHEN isnan({x}) OR {isinf} THEN {nan}"
                f" ELSE {name}({x}) END)"
            )
        if name in ("cosh", "sinh"):
            x = a[0]
            if d == "spark":
                return f"{name}({x})"
            sign = "+" if name == "cosh" else "-"
            return f"((exp({x}) {sign} exp(-({x}))) / 2.0)"
        if name == "tanh":
            x = a[0]
            if d == "spark":
                return f"tanh({x})"
            return (
                f"(CASE WHEN isnan({x}) THEN {nan}"
                f" WHEN {x} > 20.0 THEN 1.0 WHEN {x} < -20.0 THEN -1.0"
                f" ELSE (exp(2.0 * {x}) - 1.0) / (exp(2.0 * {x}) + 1.0)"
                f" END)"
            )
        if name == "exp":
            return f"exp({a[0]})"
        if name == "ln":
            return self._log(a[0])
        if name == "log10":
            return f"({self._log(a[0])} / {self._ln_pos('10.0')})"
        if name == "logn":  # MathUtil.log(base, x) = log(x)/log(base),
            # IEEE division (logn(1, x) divides by zero -> ±Inf/NaN)
            return self._div_sql(self._log(a[1]), self._log(a[0]))
        if name in ("max", "min"):
            fn = "greatest" if name == "max" else "least"
            l, r = a
            # Java Math.max/min propagate NaN; greatest/least don't
            return (
                f"(CASE WHEN isnan({l}) OR isnan({r}) THEN {nan}"
                f" ELSE {fn}({l}, {r}) END)"
            )
        if name == "pow":
            return f"power({a[0]}, {a[1]})"
        if name == "sqrt":
            x = a[0]
            return (
                f"(CASE WHEN isnan({x}) OR {x} < 0.0 THEN {nan}"
                f" ELSE sqrt({x}) END)"
            )
        if name == "haversin":
            # SloppyMath.haversinKilometers (exact-trig rendering of the
            # table-based reference; |err| <= ~1e-7 km, documented)
            lat1, lon1, lat2, lon2 = a
            x1, x2 = f"radians({lat1})", f"radians({lat2})"
            h = (
                f"((1.0 - cos({x1} - {x2}))"
                f" + cos({x1}) * cos({x2})"
                f" * (1.0 - cos(radians({lon1} - {lon2}))))"
            )
            return (
                f"({_TO_KILOMETERS} * 2.0"
                f" * asin(least(1.0, sqrt(greatest(0.0, {h} * 0.5)))))"
            )
        raise AssertionError(name)

    def _ln_pos(self, x: str) -> str:
        """ln of an expression known > 0 (no domain guard needed)."""
        return f"ln({x})"

    def _log(self, x: str) -> str:
        """Math.log semantics: log(0) = -Inf, log(<0) = NaN."""
        return (
            f"(CASE WHEN isnan({x}) OR {x} < 0.0 THEN {self._nan()}"
            f" WHEN {x} = 0.0 THEN {self._inf(True)}"
            f" ELSE ln({x}) END)"
        )


def compile_expression(
    source: str,
    dialect: str = "spark",
    variables: dict | None = None,
    functions: dict | None = None,
) -> str:
    """Compile a Lucene-JS expression to ONE SQL scalar of type DOUBLE.

    ``variables`` maps expression variable names (e.g. ``_score``,
    ``doc.field`` written as ``doc.field``) to SQL column expressions;
    unmapped simple names pass through as column references.
    ``functions`` extends/overrides the arity table (the reference's
    custom-functions seam, JavascriptCompiler.compile(source, functions))
    — custom names must then be resolvable by the target engine.
    """
    fns = dict(DEFAULT_FUNCTIONS)
    if functions:
        fns.update(functions)
    ast = _Parser(_lex(source), fns).parse()
    out = _Emitter(dialect, variables).emit(ast, "D")
    return f"CAST({out} AS DOUBLE)"


def expression_column(source: str, variables: dict | None = None):
    """The expression as a pyspark Column (ExpressionValueSource analog:
    bindings resolve variables, Catalyst codegen evaluates)."""
    from pyspark.sql import functions as F

    return F.expr(compile_expression(source, "spark", variables))
