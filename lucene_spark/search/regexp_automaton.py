"""Full Lucene RegExp evaluation via Brzozowski derivatives.

`search/regexp.py` translates the Lucene RegExp dialect
(util/automaton/RegExp.java grammar) to Java regex for Spark's JVM
`rlike` — the fast path — but two operators have no sound Java-regex
translation and were rejected loudly: language complement ``~`` and
nested intersection ``&``. The reference evaluates these by compiling
to a DFA (RegExp.toAutomaton -> Operations.complement/intersection,
util/automaton/Operations.java:110,180); this module is the equivalent
evaluator, built on regular-expression derivatives (Brzozowski 1964;
Owens/Reppy/Turon JFP 2009 "Regular-expression derivatives re-examined"
— the same construction Lucene's automaton package implements
eagerly, done lazily here):

    nullable(r)        — does r accept the empty string
    deriv(r, c)        — the language { s : c·s in L(r) }

Matching walks the term once, taking one derivative per character —
a lazily-materialized DFA whose states are canonicalized regex nodes.
Smart constructors apply the similarity rules (flatten/sort/dedupe
union+intersection, collapse double-negation/star-star, annihilate on
the empty language) that bound the state space (Owens et al. §4.1).

Complement and intersection are trivial under derivatives:

    nullable(~r) = not nullable(r)     deriv(~r, c) = ~deriv(r, c)
    nullable(r&s) = both               deriv(r&s, c) = deriv(r,c) & deriv(s,c)

which is exactly why the reference's automaton layer supports them and
plain backtracking regex engines don't.

The numeric interval ``<n-m>`` builds the same digit-range union AST
as Automata.makeDecimalInterval (equal-length operands = fixed-width
zero-padded; otherwise arbitrary leading zeros), sharing the shape of
`regexp.py::_interval_regex` but emitting AST nodes instead of Java
pattern text.

The engine consumes this through `RegexMatcher` inside an
Arrow-batched pandas UDF over the TERM DICTIONARY only (the
MultiTermQuery TermsEnum analog): the per-term Python cost lands on
|dictionary| rows, never on postings, and the lazy-DFA transition
cache is shared across the whole Arrow batch.
"""

from __future__ import annotations

from lucene_spark.search.regexp import RegexpSyntaxError

# ---------------------------------------------------------------------------
# AST — hashable tuples, canonicalized by the smart constructors
# ---------------------------------------------------------------------------

EMPTY = ("empty",)  # the empty language (Lucene '#')
EPS = ("eps",)      # the empty string   (Lucene '()')
ANY = ("any",)      # any single char    (Lucene '.')
ALL = ("star", ANY)  # any string        (Lucene '@')


def char(c: str):
    return ("char", c)


def cclass(ranges: tuple, neg: bool):
    """[...] — ranges is a sorted tuple of (lo, hi) char pairs."""
    return ("class", tuple(sorted(ranges)), neg)


def cat(a, b):
    if a == EMPTY or b == EMPTY:
        return EMPTY
    if a == EPS:
        return b
    if b == EPS:
        return a
    if a[0] == "cat":  # right-associate for canonical form
        return cat(a[1], cat(a[2], b))
    return ("cat", a, b)


def alt(*parts):
    flat: list = []
    for p in parts:
        if p[0] == "or":
            flat.extend(p[1])
        elif p != EMPTY:
            flat.append(p)
    if ALL in flat:
        return ALL
    uniq = sorted(set(flat))
    if not uniq:
        return EMPTY
    if len(uniq) == 1:
        return uniq[0]
    return ("or", tuple(uniq))


def inter(*parts):
    flat: list = []
    for p in parts:
        if p[0] == "and":
            flat.extend(p[1])
        elif p != ALL:
            flat.append(p)
    if EMPTY in flat:
        return EMPTY
    uniq = sorted(set(flat))
    if not uniq:
        return ALL
    if len(uniq) == 1:
        return uniq[0]
    return ("and", tuple(uniq))


def star(a):
    if a[0] == "star":
        return a
    if a in (EPS, EMPTY):
        return EPS
    return ("star", a)


def neg(a):
    if a[0] == "not":
        return a[1]
    if a == EMPTY:
        return ALL
    if a == ALL:
        return EMPTY
    return ("not", a)


# ---------------------------------------------------------------------------
# derivatives
# ---------------------------------------------------------------------------


def nullable(r) -> bool:
    t = r[0]
    if t in ("eps", "star"):
        return True
    if t in ("empty", "char", "class", "any"):
        return False
    if t == "cat":
        return nullable(r[1]) and nullable(r[2])
    if t == "or":
        return any(nullable(p) for p in r[1])
    if t == "and":
        return all(nullable(p) for p in r[1])
    if t == "not":
        return not nullable(r[1])
    raise AssertionError(r)


def _in_class(r, c: str) -> bool:
    hit = any(lo <= c <= hi for lo, hi in r[1])
    return hit != r[2]


def deriv(r, c: str):
    t = r[0]
    if t in ("empty", "eps"):
        return EMPTY
    if t == "any":
        return EPS
    if t == "char":
        return EPS if r[1] == c else EMPTY
    if t == "class":
        return EPS if _in_class(r, c) else EMPTY
    if t == "cat":
        a, b = r[1], r[2]
        d = cat(deriv(a, c), b)
        return alt(d, deriv(b, c)) if nullable(a) else d
    if t == "or":
        return alt(*(deriv(p, c) for p in r[1]))
    if t == "and":
        return inter(*(deriv(p, c) for p in r[1]))
    if t == "star":
        return cat(deriv(r[1], c), r)
    if t == "not":
        return neg(deriv(r[1], c))
    raise AssertionError(r)


# ---------------------------------------------------------------------------
# parser — same grammar as regexp.py::_Parser, producing AST
# ---------------------------------------------------------------------------


def _digit_node(a: str, b: str):
    return char(a) if a == b else cclass(((a, b),), False)


_DIGITS = cclass((("0", "9"),), False)


def _fixed_ast(x: str, y: str):
    """AST matching decimal strings of exactly len(x)==len(y) digits
    with x <= s <= y (mirrors regexp.py::_fixed_range)."""
    if not x:
        return EPS
    if x[0] == y[0]:
        return cat(char(x[0]), _fixed_ast(x[1:], y[1:]))
    rest = len(x) - 1
    if rest == 0:
        return _digit_node(x[0], y[0])
    parts = [cat(char(x[0]), _fixed_ast(x[1:], "9" * rest))]
    if ord(y[0]) - ord(x[0]) >= 2:
        mid: tuple = _digit_node(chr(ord(x[0]) + 1), chr(ord(y[0]) - 1))
        for _ in range(rest):
            mid = cat(mid, _DIGITS)
        parts.append(mid)
    parts.append(cat(char(y[0]), _fixed_ast("0" * rest, y[1:])))
    return alt(*parts)


def _interval_ast(smin: str, smax: str):
    """<n-m> per Automata.makeDecimalInterval: equal-length operands =
    fixed-width zero-padded strings of that length; different lengths =
    the numeric range with any number of leading zeros."""
    imin, imax = int(smin), int(smax)
    digits = len(smin) if len(smin) == len(smax) else 0
    if imin > imax:  # RegExp.java:1313-1321 swaps reversed bounds
        imin, imax = imax, imin
    if digits > 0:
        return _fixed_ast(str(imin).zfill(digits), str(imax).zfill(digits))
    parts = []
    for width in range(1, len(str(imax)) + 1):
        lo = 0 if width == 1 else 10 ** (width - 1)
        hi = 10**width - 1
        a, b = max(imin, lo), min(imax, hi)
        if a <= b:
            parts.append(_fixed_ast(str(a).zfill(width), str(b).zfill(width)))
    return cat(star(char("0")), alt(*parts))


class _AstParser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self):
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

    def union(self):
        parts = [self.inter()]
        while self.match("|"):
            parts.append(self.inter())
        return alt(*parts)

    def inter(self):
        parts = [self.concat()]
        while self.match("&"):
            parts.append(self.concat())
        return inter(*parts)

    def concat(self):
        node = EPS
        while self.peek() not in (None, "|", "&", ")"):
            node = cat(node, self.repeat())
        return node

    def repeat(self):
        base = self.complement()
        while True:
            c = self.peek()
            if c == "?":
                self.take()
                base = alt(EPS, base)
            elif c == "*":
                self.take()
                base = star(base)
            elif c == "+":
                self.take()
                base = cat(base, star(base))
            elif c == "{":
                self.take()
                spec = ""
                while self.peek() not in (None, "}"):
                    spec += self.take()
                if not self.match("}"):
                    raise RegexpSyntaxError(
                        f"unterminated {{n,m}} in {self.s!r}")
                lo, comma, hi = spec.partition(",")
                if not lo.isdigit() or (hi and not hi.isdigit()):
                    raise RegexpSyntaxError(f"bad repeat spec {{{spec}}}")
                n = int(lo)
                node = EPS
                for _ in range(n):
                    node = cat(node, base)
                if comma and not hi:  # {n,}
                    node = cat(node, star(base))
                elif comma:  # {n,m}
                    opt = alt(EPS, base)
                    for _ in range(int(hi) - n):
                        node = cat(node, opt)
                base = node
            else:
                return base

    def complement(self):
        # complexp := ~complexp | charclassexp (RegExp.java
        # parseComplExp) — so ``~a*`` is ``(~a)*``, the quantifier
        # applying OUTSIDE the complement
        if self.match("~"):
            return neg(self.complement())
        return self.char_class()

    def char_class(self):
        if not self.match("["):
            return self.simple()
        negated = self.match("^")
        ranges = []
        while not self.match("]"):
            if self.peek() is None:
                raise RegexpSyntaxError(f"unterminated [..] in {self.s!r}")
            c = self.take()
            if c == "\\":
                c = self.take()
            if (self.peek() == "-"
                    and self.s[self.i + 1: self.i + 2] not in ("]", "")):
                self.take()
                c2 = self.take()
                if c2 == "\\":
                    c2 = self.take()
                ranges.append((c, c2))
            else:
                ranges.append((c, c))
        if not ranges:
            raise RegexpSyntaxError("empty character class")
        return cclass(tuple(ranges), negated)

    def simple(self):
        pos = self.i
        c = self.take()
        if c == ".":
            return ANY
        if c == "#":
            return EMPTY
        if c == "@":
            return ALL
        if c == '"':
            node = EPS
            while self.peek() != '"':
                if self.peek() is None:
                    raise RegexpSyntaxError(
                        f'unterminated "..." in {self.s!r}')
                node = cat(node, char(self.take()))
            self.take()
            return node
        if c == "(":
            if self.match(")"):
                return EPS
            inner = self.union()
            if not self.match(")"):
                raise RegexpSyntaxError(f"unbalanced parens in {self.s!r}")
            return inner
        if c == "<":
            body = ""
            while self.peek() not in (None, ">"):
                body += self.take()
            if not self.match(">"):
                raise RegexpSyntaxError(f"unterminated <...> in {self.s!r}")
            i = body.find("-")
            if i <= 0 or i == len(body) - 1 or i != body.rfind("-"):
                raise RegexpSyntaxError(
                    f"named automaton <{body}> at position {pos} has no "
                    f"registered provider (reference extension point)"
                )
            smin, smax = body[:i], body[i + 1:]
            if not (smin.isdigit() and smax.isdigit()):
                raise RegexpSyntaxError(
                    f"interval syntax error at position {pos} in {self.s!r}"
                )
            return _interval_ast(smin, smax)
        if c == "\\":
            return char(self.take())
        if c in (")", "}", "]"):
            raise RegexpSyntaxError(f"unbalanced {c!r} in {self.s!r}")
        return char(c)


def parse(pattern: str):
    """Lucene RegExp pattern -> canonical AST. Raises RegexpSyntaxError
    on malformed patterns; every dialect operator (incl. ``~`` and
    nested ``&``) is supported."""
    p = _AstParser(pattern)
    node = p.union()
    if p.peek() is not None:
        raise RegexpSyntaxError(
            f"trailing {p.peek()!r} at position {p.i} in {pattern!r}"
        )
    return node


# ---------------------------------------------------------------------------
# matcher — lazy DFA over canonical derivative states
# ---------------------------------------------------------------------------


class RegexMatcher:
    """Whole-term matcher (RegexpQuery semantics: the automaton must
    accept the ENTIRE term). One instance per pattern; the transition
    cache is the lazily-built DFA and is shared across every term the
    instance sees, so batch matching amortizes derivative construction
    to (distinct states × distinct chars)."""

    def __init__(self, pattern: str):
        self.pattern = pattern
        self.root = parse(pattern)
        self._trans: dict = {}
        self._nullable: dict = {self.root: nullable(self.root)}

    def _step(self, state, c: str):
        key = (state, c)
        nxt = self._trans.get(key)
        if nxt is None:
            nxt = deriv(state, c)
            self._trans[key] = nxt
            if nxt not in self._nullable:
                self._nullable[nxt] = nullable(nxt)
        return nxt

    def matches(self, term: str) -> bool:
        state = self.root
        for c in term:
            state = self._step(state, c)
            if state == EMPTY:
                return False
        return self._nullable[state]

    def matches_batch(self, terms) -> list:
        """list/Series[str] -> list[bool], one DFA shared across all."""
        m = self.matches
        return [bool(t is not None and m(t)) for t in terms]
