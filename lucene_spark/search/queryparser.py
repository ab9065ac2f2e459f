"""Classic query-string parser — the queryparser/classic analog
(queryparser/classic/QueryParserBase.java:112-117, QueryParser.jj grammar).

Grammar (recursive descent, the classic syntax surface):

    query     := clause (WS clause)*
    clause    := [+|-] [AND|OR|NOT|&&|'||'] unit [^boost]
    unit      := '(' query ')'                     grouping (sub-BoolQ)
               | [field ':'] atom
    atom      := '"' terms '"' [~slop]             phrase (PhraseQuery)
               | '[' lo TO hi ']' / '{' lo TO hi '}'  term range (incl/excl)
               | term'*' / te?m                    wildcard (prefix fast-path)
               | term~[N]                          fuzzy (default 2 edits)
               | term                              TermQuery

Escaping: a backslash escapes any of the reference's special characters
``+ - && || ! ( ) { } [ ] ^ " ~ * ? : \\ /``
(QueryParserBase.escape, queryparser/classic/QueryParserBase.java:790-807)
— ``foo\\:bar`` is one term, ``\\(1\\+1\\)`` parses as text not grouping.

Field scoping: ``field:atom`` and ``field:(a OR b)`` route every term
inside to that indexed field (QueryParser.jj field handling); bare atoms
use the index's default field (field=None in the plan nodes).

Like the reference, the parser re-runs the analyzer on query text
(util/QueryBuilder.java) so query-side and index-side tokenization agree:
a quoted phrase is analyzed into its token sequence; a bare atom that
analyzes to multiple tokens becomes an OR of terms (default OR operator,
QueryParserBase default). ``+t`` = MUST, ``-t`` = MUST_NOT, infix AND
promotes both neighbours to MUST, NOT negates the following clause —
the classic parser's flat precedence, applied per nesting level.
"""

from __future__ import annotations

import re

from lucene_spark.analysis import analyze_query_text
from lucene_spark.search import plans as P

# characters that terminate a bare term unless escaped
_SPECIAL = set('+-!(){}[]^"~*?:\\/ \t')
_ESCAPABLE = set('+-&|!(){}[]^"~*?:\\/')

_FIELD_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*):")
_OP_RE = re.compile(r"(AND|OR|NOT|&&|\|\|)(?=[\s(]|$)")
_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)")
_SLOP_RE = re.compile(r"~(\d+)")
_EDITS_RE = re.compile(r"~(\d*)")
_RANGE_RE = re.compile(r"([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])")


def _read_bare(s: str, pos: int) -> tuple[str, str, int]:
    """Read a bare term honoring backslash escapes.

    Returns (raw_with_wildcards, unescaped_text, new_pos): `raw` keeps
    unescaped * and ? markers for wildcard detection; escaped specials
    land in `text` as literals (and as non-operator chars in raw)."""
    raw = []
    text = []
    while pos < len(s):
        c = s[pos]
        if c == "\\" and pos + 1 < len(s) and s[pos + 1] in _ESCAPABLE:
            raw.append("\x00")  # placeholder: literal char, not operator
            text.append(s[pos + 1])
            pos += 2
            continue
        # the classic grammar allows - and + INSIDE a term (QueryParser.jj
        # _TERM_CHAR includes them; only the first char excludes them)
        if c in "+-" and raw:
            raw.append(c)
            text.append(c)
            pos += 1
            continue
        if c in _SPECIAL and c not in "*?":
            break
        if c in "*?":
            raw.append(c)
            text.append(c)
            pos += 1
            continue
        raw.append(c)
        text.append(c)
        pos += 1
    return "".join(raw), "".join(text), pos


class _Parser:
    def __init__(self, s: str, default_op: str = "OR"):
        self.s = s
        self.pos = 0
        self.default_op = default_op

    def _ws(self) -> None:
        while self.pos < len(self.s) and self.s[self.pos] in " \t\r\n":
            self.pos += 1

    def _boost(self, q):
        m = _BOOST_RE.match(self.s, self.pos)
        if m:
            self.pos = m.end()
            b = float(m.group(1))
            if b != 1.0:
                return P.BoostQ(q, b)
        return q

    def parse_query(self, depth: int = 0):
        occur_atoms: list[tuple[str, object]] = []
        pending_and = False
        pending_or = False
        pending_not = False
        explicit = False  # current atom carries an explicit +/- prefix
        s = self.s
        while True:
            self._ws()
            if self.pos >= len(s):
                break
            if s[self.pos] == ")":
                if depth == 0:
                    raise ValueError(f"unbalanced ')' at {self.pos}")
                break
            mop = _OP_RE.match(s, self.pos) if s[self.pos] not in "\\" else None
            if mop:
                op = mop.group(1)
                if op in ("AND", "&&"):
                    pending_and = True
                elif op in ("OR", "||"):
                    pending_or = True
                elif op == "NOT":
                    pending_not = True
                self.pos = mop.end()
                continue
            occur = "must" if self.default_op == "AND" else "should"
            explicit = False
            if s[self.pos] in "+-" and not re.match(
                r"[+-]?\d", s[self.pos:]
            ):
                occur = "must" if s[self.pos] == "+" else "must_not"
                explicit = True
                self.pos += 1
            atom = self.parse_unit(depth)
            atom = self._boost(atom)
            if pending_not:
                occur = "must_not"
                pending_not = False
            if pending_and:
                # CONJ_AND promotes the previous clause to MUST unless
                # prohibited (QueryParserBase.addClause)
                if occur_atoms and occur_atoms[-1][0] == "should":
                    occur_atoms[-1] = ("must", occur_atoms[-1][1])
                if occur == "should":
                    occur = "must"
                pending_and = False
            elif pending_or:
                # CONJ_OR demotes the previous clause to SHOULD unless
                # prohibited, and the current clause is SHOULD unless an
                # explicit +/- overrides (relevant with AND_OPERATOR)
                if occur_atoms and occur_atoms[-1][0] == "must":
                    occur_atoms[-1] = ("should", occur_atoms[-1][1])
                if occur == "must" and not explicit:
                    occur = "should"
                pending_or = False
            occur_atoms.append((occur, atom))

        if not occur_atoms:
            return P.MatchAllQ()
        must = tuple(a for o, a in occur_atoms if o == "must")
        should = tuple(a for o, a in occur_atoms if o == "should")
        must_not = tuple(a for o, a in occur_atoms if o == "must_not")
        if len(occur_atoms) == 1 and should:
            return should[0]
        if len(occur_atoms) == 1 and must:
            return must[0]
        return P.BoolQ(must=must, should=should, must_not=must_not)

    def parse_unit(self, depth: int, field: str | None = None):
        s = self.s
        self._ws()
        if self.pos < len(s) and s[self.pos] == "(":
            self.pos += 1
            inner = self.parse_query(depth + 1)
            self._ws()
            if self.pos >= len(s) or s[self.pos] != ")":
                raise ValueError("missing ')'")
            self.pos += 1
            return inner
        # field prefix (only if not already scoped; nested field:field: is
        # not a thing in the classic grammar)
        if field is None:
            mf = _FIELD_RE.match(s, self.pos)
            if mf:
                self.pos = mf.end()
                self._ws()
                if self.pos < len(s) and s[self.pos] == "(":
                    return self._scoped(self.parse_unit(depth), mf.group(1))
                return self.parse_unit(depth, field=mf.group(1))
        return self.parse_atom(field)

    def _scoped(self, q, field: str):
        """Push a field onto every leaf of a parsed sub-tree."""
        if isinstance(q, P.BoolQ):
            return P.BoolQ(
                tuple(self._scoped(c, field) for c in q.must),
                tuple(self._scoped(c, field) for c in q.should),
                tuple(self._scoped(c, field) for c in q.must_not),
                tuple(self._scoped(c, field) for c in q.filter),
                q.min_should_match,
                q.boost,
            )
        if isinstance(q, P.BoostQ):
            return P.BoostQ(self._scoped(q.inner, field), q.boost)
        if hasattr(q, "field") and getattr(q, "field") is None:
            return type(q)(**{**q.__dict__, "field": field})
        return q

    def parse_atom(self, field: str | None):
        s = self.s
        if self.pos >= len(s):
            raise ValueError("unexpected end of query")
        c = s[self.pos]
        if c == '"':
            end = s.find('"', self.pos + 1)
            if end < 0:
                raise ValueError("unterminated phrase")
            body = s[self.pos + 1 : end]
            self.pos = end + 1
            slop = 0
            m = _SLOP_RE.match(s, self.pos)
            if m:
                slop = int(m.group(1))
                self.pos = m.end()
            toks = analyze_query_text(body)
            if not toks:
                return P.MatchAllQ()
            if len(toks) == 1:
                return P.TermQ(toks[0], field=field)
            return P.PhraseQ(tuple(toks), slop=slop, field=field)
        mr = _RANGE_RE.match(s, self.pos)
        if mr:
            self.pos = mr.end()
            inc_lo = mr.group(1) == "["
            inc_hi = mr.group(4) == "]"
            return P.TermRangeQ(
                mr.group(2).lower(), mr.group(3).lower(), inc_lo, inc_hi, field=field
            )
        raw, text, newpos = _read_bare(s, self.pos)
        if not raw:
            raise ValueError(f"cannot parse query at: {s[self.pos:]!r}")
        self.pos = newpos
        # fuzzy suffix
        m = _EDITS_RE.match(s, self.pos)
        if m:
            self.pos = m.end()
            edits = int(m.group(1)) if m.group(1) else 2
            return P.FuzzyQ(text.lower(), max_edits=edits, field=field)
        if "*" in raw.replace("\x00", "") or "?" in raw.replace("\x00", ""):
            pat = text.lower()
            if raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw:
                return P.PrefixQ(pat[:-1], field=field)
            return P.WildcardQ(pat, field=field)
        toks = analyze_query_text(text)
        if not toks:
            return P.MatchAllQ()
        if len(toks) == 1:
            return P.TermQ(toks[0], field=field)
        return P.BoolQ(should=tuple(P.TermQ(t, field=field) for t in toks))


def parse(query: str):
    """Query string -> plan tree (rewrite-normalized)."""
    p = _Parser(query.strip())
    out = p.parse_query(0)
    p._ws()
    if p.pos < len(p.s):
        raise ValueError(f"trailing input at: {p.s[p.pos:]!r}")
    return P.rewrite(out)
