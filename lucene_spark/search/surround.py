"""Surround query-language parser — proximity-first boolean syntax
lowered onto the span plan nodes.

Re-expresses `queryparser/surround` (parser/QueryParser.jj:20-330,
query/*.java):

* Infix precedence chain ``OR < AND < NOT < N < W`` and the prefix
  forms ``OR(a,b,…)`` / ``AND(a,b,…)`` / ``3W(a,b,…)`` / ``N(a,b)``
  (QueryParser.jj FieldsQuery→OrQuery→AndQuery→NotQuery→NQuery→
  WQuery→PrimaryQuery). Operators are case-insensitive.
* ``nW`` = ordered within distance n, ``nN`` = unordered; distance
  defaults to 1 and lowers to SpanNearQ with ``slop = n - 1``
  (DistanceQuery.java:97 — ``new SpanNearQuery(clauses,
  getOpDistance() - 1, ordered)``).
* Distance operands must be distance-sub-queries: terms, truncations,
  OR combinations, or nested W/N (DistanceQuery.java:66-72
  distanceSubQueryNotAllowed); AND/NOT inside W/N raises.
* ``term*`` → SrndPrefixQuery, embedded ``*``/``?`` → SrndTruncQuery
  (QueryParser.jj:166-182); inside a distance op they expand against
  the term dictionary into SpanOr (SpanNearClauseFactory analog, the
  same bucket-pruned dictionary scan complexphrase.py uses). A
  truncation with no leading literal raises the reference's
  "Too unrestrictive truncation" error.
* ``field:`` prefixes distribute the field over the sub-query; a
  chain ``f1:f2:q`` ORs the per-field copies (FieldsQuery.java).
* ``^n`` weights wrap in BoostQ (OptionalWeights).
* Expansion work is capped like BasicQueryFactory's maxBasicQueries
  (default 1024) — TooManyBasicQueries raises past the cap.

The surround language does NOT analyze terms (package-info.java: terms
are used verbatim); we lowercase only, matching the index's lowercased
dictionary — documented deviation, same spirit.
"""

from __future__ import annotations

import dataclasses
import re

from lucene_spark.search import plans as P

MAX_BASIC_QUERIES = 1024  # query/BasicQueryFactory.java default

# a term no analyzer can produce: an expansion that matched nothing
# keeps its slot unmatchable (SpanMatchNoDocsQuery analog)
_NO_MATCH_TERM = "\x00<no-match>"


class SurroundParseError(ValueError):
    pass


class TooManyBasicQueries(SurroundParseError):
    def __init__(self):
        super().__init__(
            f"Too many basic queries: > {MAX_BASIC_QUERIES} "
            "(BasicQueryFactory.maxBasicQueries)"
        )


_TOK = re.compile(
    r"""\s*(?:
    (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,) | (?P<colon>:) |
    (?P<carat>\^(?P<weight>\d+(?:\.\d+)?)) |
    (?P<quoted>"(?P<qbody>[^"]*)") |
    (?P<term>[^\s(),:^"]+)
)""",
    re.X,
)

_DIST_RE = re.compile(r"^(\d{1,2})?([wn])$", re.I)


def _lex(s: str):
    out, i = [], 0
    while i < len(s):
        m = _TOK.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip():
                raise SurroundParseError(f"cannot lex at: {s[i:]!r}")
            break
        i = m.end()
        for kind in ("lparen", "rparen", "comma", "colon"):
            if m.group(kind):
                out.append((kind, m.group(kind)))
                break
        else:
            if m.group("carat"):
                out.append(("weight", float(m.group("weight"))))
            elif m.group("quoted") is not None:
                out.append(("quoted", m.group("qbody")))
            else:
                t = m.group("term")
                u = t.upper()
                if u in ("OR", "AND", "NOT"):
                    out.append((u, t))
                else:
                    dm = _DIST_RE.match(t)
                    if dm:
                        dist = int(dm.group(1) or 1)
                        if not 1 <= dist <= 99:
                            raise SurroundParseError(
                                f"distance out of range: {t}")
                        out.append(
                            ("W" if dm.group(2).lower() == "w" else "N",
                             dist))
                    else:
                        out.append(("term", t))
    out.append(("eof", None))
    return out


class _Parser:
    def __init__(self, s: str, searcher=None, default_field=None):
        self.toks = _lex(s)
        self.pos = 0
        self.searcher = searcher
        self.default_field = default_field
        self.basic = 0

    # -- token helpers --------------------------------------------------
    def peek(self, ahead=0):
        return self.toks[min(self.pos + ahead, len(self.toks) - 1)]

    def take(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind):
        k, v = self.take()
        if k != kind:
            raise SurroundParseError(f"expected {kind}, got {k}={v!r}")
        return v

    # -- grammar (QueryParser.jj FieldsQuery..PrimaryQuery) -------------
    def top(self):
        q = self.fields_query(self.default_field)
        if self.peek()[0] != "eof":
            raise SurroundParseError(
                f"trailing input at token {self.pos}: {self.peek()}")
        return q

    def fields_query(self, field):
        fields = []
        while (self.peek()[0] == "term"
               and self.peek(1)[0] == "colon"):
            fields.append(self.take()[1])
            self.take()
        q = self.or_query(fields[-1] if fields else field)
        if len(fields) > 1:
            # FieldsQuery.java: one copy per field, OR'd
            return P.BoolQ(should=tuple(
                _apply_field(q, f) for f in fields))
        return q

    def _infix(self, sub, ops, combine):
        q = sub()
        clauses = [q]
        last_op = None
        while self.peek()[0] in ops:
            k, v = self.take()
            last_op = (k, v)
            clauses.append(sub())
        if last_op is None:
            return q
        return combine(last_op, clauses)

    def or_query(self, field):
        return self._infix(
            lambda: self.and_query(field), ("OR",),
            lambda _op, cl: P.BoolQ(should=tuple(cl)))

    def and_query(self, field):
        return self._infix(
            lambda: self.not_query(field), ("AND",),
            lambda _op, cl: P.BoolQ(must=tuple(cl)))

    def not_query(self, field):
        q = self.n_query(field)
        negs = []
        while self.peek()[0] == "NOT":
            self.take()
            negs.append(self.n_query(field))
        if not negs:
            return q
        return P.BoolQ(must=(q,), must_not=tuple(negs))

    def n_query(self, field):
        return self._infix(
            lambda: self.w_query(field), ("N",),
            lambda op, cl: self._distance(cl, op[1], ordered=False,
                                          field=field))

    def w_query(self, field):
        return self._infix(
            lambda: self.primary(field), ("W",),
            lambda op, cl: self._distance(cl, op[1], ordered=True,
                                          field=field))

    def primary(self, field):
        k, v = self.peek()
        if k == "lparen":
            self.take()
            q = self.fields_query(field)
            self.expect("rparen")
            return self._weights(q)
        if k in ("OR", "AND") and self.peek(1)[0] == "lparen":
            self.take()
            clauses = self._arg_list(field)
            q = (P.BoolQ(should=tuple(clauses)) if k == "OR"
                 else P.BoolQ(must=tuple(clauses)))
            return self._weights(q)
        if k in ("W", "N") and self.peek(1)[0] == "lparen":
            self.take()
            clauses = self._arg_list(field)
            return self._weights(self._distance(
                clauses, v, ordered=(k == "W"), field=field))
        if k == "quoted":
            self.take()
            return self._weights(self._simple_term(v, field, quoted=True))
        if k == "term":
            self.take()
            return self._weights(self._simple_term(v, field))
        raise SurroundParseError(f"unexpected token {k}={v!r}")

    def _arg_list(self, field):
        self.expect("lparen")
        clauses = [self.fields_query(field)]
        while self.peek()[0] == "comma":
            self.take()
            clauses.append(self.fields_query(field))
        self.expect("rparen")
        if len(clauses) < 2:
            raise SurroundParseError(
                "prefix operator needs >= 2 arguments (QueryParser.jj)")
        return clauses

    def _weights(self, q):
        boost = 1.0
        while self.peek()[0] == "weight":
            boost *= self.take()[1]
        return q if boost == 1.0 else P.BoostQ(q, boost)

    # -- leaves ----------------------------------------------------------
    def _simple_term(self, t: str, field, quoted: bool = False):
        self._count_basic()
        t = t.lower()
        if not quoted and ("*" in t or "?" in t):
            lead = re.match(r"[^*?]*", t).group()
            if not lead:
                raise SurroundParseError(
                    f"Too unrestrictive truncation: {t}")
            if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
                return P.PrefixQ(t[:-1], field=field)
            return P.WildcardQ(t, field=field)
        return P.TermQ(t, field=field)

    def _count_basic(self, n: int = 1):
        self.basic += n
        if self.basic > MAX_BASIC_QUERIES:
            raise TooManyBasicQueries()

    # -- distance lowering (DistanceQuery.java:66-97) ---------------------
    def _distance(self, clauses, dist: int, ordered: bool, field):
        spans = tuple(self._to_span(c) for c in clauses)
        return P.SpanNearQ(spans, slop=dist - 1, in_order=ordered)

    def _to_span(self, q):
        if isinstance(q, P.BoostQ):
            inner = self._to_span(q.inner)
            return dataclasses.replace(inner, boost=inner.boost * q.boost)
        if isinstance(q, P.TermQ):
            return P.SpanTermQ(q.term, boost=q.boost, field=q.field)
        if isinstance(q, (P.SpanTermQ, P.SpanNearQ, P.SpanOrQ)):
            return q
        if isinstance(q, P.BoolQ):
            if q.must or q.must_not or q.filter:
                raise SurroundParseError(
                    "AND/NOT not allowed as distance sub-query "
                    "(DistanceQuery.distanceSubQueryNotAllowed)")
            return P.SpanOrQ(tuple(self._to_span(c) for c in q.should))
        if isinstance(q, (P.PrefixQ, P.WildcardQ)):
            return self._expand_span(q)
        raise SurroundParseError(
            f"{type(q).__name__} not allowed as distance sub-query")

    def _expand_span(self, node):
        """SpanNearClauseFactory.visitMatchingTerms analog: dictionary
        expansion of a truncation into SpanOr(SpanTerm…)."""
        if self.searcher is None:
            raise SurroundParseError(
                "truncation inside W/N needs a searcher to expand "
                "against the term dictionary")
        pred = self.searcher._multiterm_pred(node)
        # maxBasicQueries pushed into the stats scan: at most
        # remaining+1 rows ever reach the driver before
        # TooManyBasicQueries fires (never the whole dictionary slice).
        remaining = MAX_BASIC_QUERIES - self.basic
        terms = sorted(
            t for t, _df, _ttf in
            self.searcher._predicate_term_stats(
                pred, node.field, limit=remaining + 1
            )
        )
        self._count_basic(len(terms))
        if not terms:
            return P.SpanTermQ(_NO_MATCH_TERM, field=node.field)
        if len(terms) == 1:
            return P.SpanTermQ(terms[0], field=node.field)
        return P.SpanOrQ(tuple(
            P.SpanTermQ(t, field=node.field) for t in terms))


def _apply_field(q, field):
    """FieldsQuery.java — push a field name down every leaf."""
    if dataclasses.is_dataclass(q) and hasattr(q, "field"):
        return dataclasses.replace(q, field=field)
    if isinstance(q, P.BoolQ):
        return dataclasses.replace(
            q,
            must=tuple(_apply_field(c, field) for c in q.must),
            should=tuple(_apply_field(c, field) for c in q.should),
            must_not=tuple(_apply_field(c, field) for c in q.must_not),
            filter=tuple(_apply_field(c, field) for c in q.filter),
        )
    if isinstance(q, (P.SpanNearQ, P.SpanOrQ)):
        return dataclasses.replace(
            q, clauses=tuple(_apply_field(c, field) for c in q.clauses))
    if isinstance(q, P.BoostQ):
        return dataclasses.replace(q, inner=_apply_field(q.inner, field))
    return q


def parse(query: str, searcher=None, default_field=None):
    """Parse a surround-language query into plan nodes.

    ``searcher`` is only required when a truncation appears inside a
    W/N distance operator (dictionary expansion)."""
    return _Parser(query, searcher, default_field).top()
