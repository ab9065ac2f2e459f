"""Lucene RegExp dialect -> Java regex translation
(util/automaton/RegExp.java:1 grammar; RegexpQuery.java:44 matches the
WHOLE term against the automaton).

The engine evaluates regexps with Spark's ``rlike`` (Java regex,
substring semantics), so the compat layer does two things:

1. translates the Lucene syntax — where ``.?*+{n,m}[...]()|`` mean the
   same but ``"..."`` quotes a literal, ``@`` is any-string, ``#`` is
   the empty language, ``&`` is intersection, ``~`` is complement,
   ``<n-m>`` is a numeric interval, and ``^ $`` are LITERAL characters
   (anchoring is implicit) — into an equivalent Java pattern;
2. the caller anchors the result as ``^(?:...)$`` for whole-term
   matching (RegexpQuery semantics).

Coverage, per the documented behavior table in tests/test_regexp.py:

=============  ==============================================
operator        handling
=============  ==============================================
literal/escape  translated (Java metachars escaped)
``.``           translated
``[...]``       translated (ranges, negation; Java class
                metachars ``&`` etc. escaped)
``? * + {n,m}`` translated (always wrapped ``(?:..)`` so
                stacked quantifiers like ``a*?`` stay
                Lucene-associative, never Java-lazy)
``( ) |``       translated; ``()`` is the empty string
``"..."``       translated to an escaped literal
``@``           translated to ``(?s:.*)``
``#``           translated to ``(?!)`` (matches nothing)
``&``           translated at TOP level only, via anchored
                lookahead; nested -> UnsupportedRegexpOperator
``~``           UnsupportedRegexpOperator (deprecated in the
                reference; not expressible in Java regex)
``<n-m>``       translated to a digit-range alternation
                (Automata.makeDecimalInterval semantics: same-
                length operands -> fixed-width zero-padded
                strings; different lengths -> any value in
                [n, m] with arbitrary leading zeros; reversed
                bounds swap, RegExp.java:1313-1321)
``<name>``      UnsupportedRegexpOperator (named automaton)
=============  ==============================================

Unsupported operators raise with the operator name and position so a
caller can fall back or surface a clear error — never a silently
different match set.
"""

from __future__ import annotations

_JAVA_META = set(".^$|?*+()[]{}\\")
_CLASS_META = set("\\]^-[&")


class RegexpSyntaxError(ValueError):
    """Malformed pattern under the Lucene RegExp grammar."""


class UnsupportedRegexpOperator(RegexpSyntaxError):
    """Valid Lucene RegExp operator with no sound Java-regex
    translation — callers must reject, not approximate."""

    def __init__(self, op: str, pos: int, why: str):
        self.op, self.pos = op, pos
        super().__init__(
            f"Lucene regexp operator {op!r} at position {pos} is not "
            f"supported by the Java-regex evaluator: {why}"
        )


def _esc(c: str) -> str:
    return "\\" + c if c in _JAVA_META else c


def _digit_span(a: str, b: str) -> str:
    return a if a == b else f"[{a}-{b}]"


def _fixed_range(x: str, y: str) -> list[str]:
    """Alternatives matching decimal strings of len(x)==len(y) digits
    with x <= s <= y numerically (equal-width compare == lexicographic)."""
    if not x:
        return [""]
    if x[0] == y[0]:
        return [x[0] + r for r in _fixed_range(x[1:], y[1:])]
    rest = len(x) - 1
    if rest == 0:
        return [_digit_span(x[0], y[0])]
    out = [x[0] + r for r in _fixed_range(x[1:], "9" * rest)]
    if ord(y[0]) - ord(x[0]) >= 2:
        mid = _digit_span(chr(ord(x[0]) + 1), chr(ord(y[0]) - 1))
        out.append(mid + f"[0-9]{{{rest}}}" if rest > 1 else mid + "[0-9]")
    out += [y[0] + r for r in _fixed_range("0" * rest, y[1:])]
    return out


def _interval_regex(smin: str, smax: str) -> str:
    """<n-m> -> Java regex, mirroring Automata.makeDecimalInterval:
    equal-length operands = fixed width (zero-padded strings of exactly
    that length); otherwise any number of leading zeros around the
    value range."""
    imin, imax = int(smin), int(smax)
    digits = len(smin) if len(smin) == len(smax) else 0
    if imin > imax:
        imin, imax = imax, imin
    if digits > 0:
        x = str(imin).zfill(digits)
        y = str(imax).zfill(digits)
        alts = _fixed_range(x, y)
    else:
        alts = []
        for width in range(1, len(str(imax)) + 1):
            lo = 0 if width == 1 else 10 ** (width - 1)
            hi = 10**width - 1
            a, b = max(imin, lo), min(imax, hi)
            if a <= b:
                alts.extend(_fixed_range(str(a).zfill(width),
                                         str(b).zfill(width)))
    body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
    return body if digits > 0 else "0*" + body


def _esc_cc(c: str) -> str:
    return "\\" + c if c in _CLASS_META else c


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str | None:
        return self.s[self.i] if self.i < len(self.s) else None

    def take(self) -> str:
        if self.i >= len(self.s):
            raise RegexpSyntaxError(f"unexpected end of pattern: {self.s!r}")
        c = self.s[self.i]
        self.i += 1
        return c

    def match(self, c: str) -> bool:
        if self.peek() == c:
            self.i += 1
            return True
        return False

    # unionexp := interexp ('|' unionexp)?
    def union(self, top: bool) -> str:
        parts = [self.inter(top)]
        while self.match("|"):
            parts.append(self.inter(top))
        return parts[0] if len(parts) == 1 else "(?:" + "|".join(parts) + ")"

    # interexp := concatexp ('&' interexp)?  [top level only]
    def inter(self, top: bool) -> str:
        pos0 = self.i
        parts = [self.concat()]
        while self.match("&"):
            parts.append(self.concat())
        if len(parts) == 1:
            return parts[0]
        if not top:
            raise UnsupportedRegexpOperator(
                "&", pos0,
                "intersection translates to an end-anchored lookahead, "
                "which is only sound at the top level of the pattern",
            )
        # sound under the caller's ^(?:...)$ anchor: every operand must
        # cover the entire term
        look = "".join(f"(?=(?:{p})$)" for p in parts[:-1])
        return look + "(?:" + parts[-1] + ")"

    def concat(self) -> str:
        parts = []
        while self.peek() not in (None, "|", "&", ")"):
            parts.append(self.repeat())
        return "".join(parts)

    def repeat(self) -> str:
        base = self.complement()
        while True:
            c = self.peek()
            if c in ("?", "*", "+"):
                self.take()
                base = f"(?:{base}){c}"
            elif c == "{":
                self.take()
                spec = ""
                while self.peek() not in (None, "}"):
                    spec += self.take()
                if not self.match("}"):
                    raise RegexpSyntaxError(f"unterminated {{n,m}} in {self.s!r}")
                lo, _, hi = spec.partition(",")
                if not lo.isdigit() or (hi and not hi.isdigit() and "," in spec):
                    raise RegexpSyntaxError(f"bad repeat spec {{{spec}}}")
                base = f"(?:{base}){{{spec}}}"
            else:
                return base

    def complement(self) -> str:
        if self.peek() == "~":
            pos = self.i
            raise UnsupportedRegexpOperator(
                "~", pos,
                "language complement has no Java-regex equivalent "
                "(deprecated COMPLEMENT flag in the reference)",
            )
        return self.char_class()

    def char_class(self) -> str:
        if not self.match("["):
            return self.simple()
        neg = self.match("^")
        items = []
        while not self.match("]"):
            if self.peek() is None:
                raise RegexpSyntaxError(f"unterminated [..] in {self.s!r}")
            c = self.take()
            if c == "\\":
                c = self.take()
            if self.peek() == "-" and self.s[self.i + 1 : self.i + 2] not in ("]", ""):
                self.take()
                c2 = self.take()
                if c2 == "\\":
                    c2 = self.take()
                items.append(_esc_cc(c) + "-" + _esc_cc(c2))
            else:
                items.append(_esc_cc(c))
        if not items:
            raise RegexpSyntaxError("empty character class")
        return "[" + ("^" if neg else "") + "".join(items) + "]"

    def simple(self) -> str:
        pos = self.i
        c = self.take()
        if c == ".":
            return "."
        if c == "#":
            return "(?!)"  # empty language: matches no string
        if c == "@":
            return "(?s:.*)"  # any string
        if c == '"':
            buf = ""
            while self.peek() != '"':
                if self.peek() is None:
                    raise RegexpSyntaxError(f'unterminated "..." in {self.s!r}')
                buf += self.take()
            self.take()
            return "".join(_esc(ch) for ch in buf)
        if c == "(":
            if self.match(")"):
                return ""  # () is the empty string
            inner = self.union(top=False)
            if not self.match(")"):
                raise RegexpSyntaxError(f"unbalanced parens in {self.s!r}")
            return "(?:" + inner + ")"
        if c == "<":
            body = ""
            while self.peek() not in (None, ">"):
                body += self.take()
            if not self.match(">"):
                raise RegexpSyntaxError(f"unterminated <...> in {self.s!r}")
            i = body.find("-")
            if i <= 0 or i == len(body) - 1 or i != body.rfind("-"):
                raise UnsupportedRegexpOperator(
                    f"<{body}>", pos,
                    "named automata are a reference extension point; only "
                    "numeric <n-m> intervals translate to Java regex",
                )
            smin, smax = body[:i], body[i + 1 :]
            if not (smin.isdigit() and smax.isdigit()):
                raise RegexpSyntaxError(
                    f"interval syntax error at position {pos} in {self.s!r}"
                )
            return "(?:" + _interval_regex(smin, smax) + ")"
        if c == "\\":
            return _esc(self.take())
        if c in (")", "}", "]"):
            raise RegexpSyntaxError(f"unbalanced {c!r} in {self.s!r}")
        return _esc(c)


def to_java_regex(pattern: str) -> str:
    """Translate a Lucene RegExp pattern to an UNANCHORED Java regex;
    raises UnsupportedRegexpOperator / RegexpSyntaxError. The caller is
    responsible for whole-term anchoring (``^(?:...)$``)."""
    p = _Parser(pattern)
    out = p.union(top=True)
    if p.peek() is not None:
        raise RegexpSyntaxError(
            f"trailing {p.peek()!r} at position {p.i} in {pattern!r}"
        )
    return out


def term_predicate_pattern(pattern: str) -> str:
    """The anchored Java pattern for RegexpQuery's whole-term contract."""
    return "^(?:" + to_java_regex(pattern) + ")$"
