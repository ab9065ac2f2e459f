"""ComplexPhraseQueryParser analog — wildcards, fuzzies, ranges and
OR-groups INSIDE quoted phrases, lowered onto the span machinery
(queryparser/complexPhrase/ComplexPhraseQueryParser.java:63).

Reference behavior re-expressed:

* Outside quotes the classic parser applies unchanged (this module
  subclasses it).
* Inside ``"..."`` each whitespace-separated element is one phrase
  position; an element may be a plain term, ``prefix*``, ``wild?card``,
  ``fuzzy~N``, ``[lo TO hi]`` / ``{lo TO hi}`` range, or a group
  ``(alt1 alt2 -neg)`` whose alternatives OR together and whose
  ``-``/negated members exclude spans (ComplexPhraseQueryParser.
  addComplexPhraseClause builds SpanOr(include) / SpanNot(include,
  exclude)).
* Multi-term elements expand against the term dictionary at parse time
  — the analog of SpanMultiTermQueryWrapper's rewrite(reader)
  expansion — using the executor's pushed-down dictionary predicates
  (one bucket-pruned term_stats scan per element, no postings touched).
* The phrase becomes SpanNearQ(clauses, slop, in_order); ``"..."~N``
  sets slop, in_order defaults True like the reference
  (ComplexPhraseQueryParser.setInOrder default).

Scoring follows the repo's documented span subsumption: spans lower to
the minimal-interval algebra (plans.rewrite -> IntervalQ), matching
SpanWeight's sloppyFreq accumulation.
"""

from __future__ import annotations

import re

from lucene_spark.analysis import analyze_query_text
from lucene_spark.search import plans as P
from lucene_spark.search.queryparser import _Parser, _SLOP_RE

_FUZZY_RE = re.compile(r"^(.+?)~(\d*)$")
_RANGE_BODY_RE = re.compile(r"([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])")

# a term no analyzer can produce: an expansion that matched nothing
# must keep its phrase slot unmatchable (the reference rewrites to
# SpanMatchNoDocsQuery)
_NO_MATCH_TERM = "\x00<no-match>"


class _ComplexParser(_Parser):
    def __init__(self, s: str, searcher, in_order: bool):
        super().__init__(s)
        self.searcher = searcher
        self.in_order = in_order

    # -- phrase-element expansion -------------------------------------
    def _expand_multi(self, node, field: str | None):
        """Dictionary expansion of a multi-term element -> span clause."""
        if isinstance(node, P.FuzzyQ):
            terms = [t for t, _df, _b in self.searcher._fuzzy_expansions(node)]
        else:
            pred = self.searcher._multiterm_pred(node)
            # SpanMultiTermQueryWrapper's SCORING_SPAN_QUERY_REWRITE
            # throws TooManyClauses past maxClauseCount; the bound is
            # pushed into the stats scan so a hostile wildcard ships at
            # most MAX+1 rows to the driver.
            max_c = self.searcher.MAX_CLAUSE_COUNT
            terms = [
                t
                for t, _df, _ttf in self.searcher._predicate_term_stats(
                    pred, field, limit=max_c + 1
                )
            ]
            if len(terms) > max_c:
                raise ValueError(
                    f"maxClauseCount exceeded: >{max_c} expansions"
                )
        if not terms:
            return P.SpanTermQ(_NO_MATCH_TERM, field=field)
        if len(terms) == 1:
            return P.SpanTermQ(terms[0], field=field)
        return P.SpanOrQ(tuple(P.SpanTermQ(t, field=field) for t in sorted(terms)))

    def _atom_span(self, tok: str, field: str | None):
        """One phrase element (no grouping) -> span clause."""
        mr = _RANGE_BODY_RE.match(tok)
        if mr and mr.end() == len(tok):
            node = P.TermRangeQ(
                mr.group(2).lower(), mr.group(3).lower(),
                mr.group(1) == "[", mr.group(4) == "]", field=field,
            )
            return self._expand_multi(node, field)
        mf = _FUZZY_RE.match(tok)
        if mf and "*" not in tok and "?" not in tok:
            edits = int(mf.group(2)) if mf.group(2) else 2
            return self._expand_multi(
                P.FuzzyQ(mf.group(1).lower(), max_edits=edits, field=field),
                field,
            )
        if "*" in tok or "?" in tok:
            pat = tok.lower()
            if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
                node = P.PrefixQ(pat[:-1], field=field)
            else:
                node = P.WildcardQ(pat, field=field)
            return self._expand_multi(node, field)
        toks = analyze_query_text(tok)
        if not toks:
            return P.SpanTermQ(_NO_MATCH_TERM, field=field)
        if len(toks) == 1:
            return P.SpanTermQ(toks[0], field=field)
        return P.SpanNearQ(
            tuple(P.SpanTermQ(t, field=field) for t in toks), 0, True
        )

    def _group_span(self, body: str, field: str | None):
        """Parenthesized group inside a phrase: OR of alternatives with
        optional '-'/NOT negatives -> SpanOr / SpanNot."""
        include, exclude = [], []
        pending_not = False
        for tok in body.split():
            if tok in ("OR", "||"):
                continue
            if tok in ("NOT", "!"):
                pending_not = True
                continue
            neg = pending_not
            pending_not = False
            if tok.startswith("-"):
                neg, tok = True, tok[1:]
            elif tok.startswith("+"):
                tok = tok[1:]
            if not tok:
                continue
            (exclude if neg else include).append(self._atom_span(tok, field))
        if not include:
            return P.SpanTermQ(_NO_MATCH_TERM, field=field)
        inc = include[0] if len(include) == 1 else P.SpanOrQ(tuple(include))
        if not exclude:
            return inc
        exc = exclude[0] if len(exclude) == 1 else P.SpanOrQ(tuple(exclude))
        return P.SpanNotQ(inc, exc)

    def _phrase_elements(self, body: str) -> list[tuple[str, str]]:
        els = []
        i, n = 0, len(body)
        while i < n:
            c = body[i]
            if c.isspace():
                i += 1
                continue
            if c == "(":
                j = body.find(")", i)
                if j < 0:
                    raise ValueError("unterminated group in phrase")
                els.append(("group", body[i + 1 : j]))
                i = j + 1
            elif c in "[{":
                close = "]" if c == "[" else "}"
                j = body.find(close, i)
                if j < 0:
                    raise ValueError("unterminated range in phrase")
                els.append(("atom", body[i : j + 1]))
                i = j + 1
            else:
                j = i
                while j < n and not body[j].isspace():
                    j += 1
                els.append(("atom", body[i:j]))
                i = j
        return els

    # -- classic-parser hook ------------------------------------------
    def parse_atom(self, field: str | None):
        s = self.s
        if self.pos < len(s) and s[self.pos] == '"':
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
            clauses = []
            for kind, tok in self._phrase_elements(body):
                if kind == "group":
                    clauses.append(self._group_span(tok, field))
                else:
                    clauses.append(self._atom_span(tok, field))
            if not clauses:
                return P.MatchAllQ()
            if len(clauses) == 1:
                return clauses[0]
            return P.SpanNearQ(tuple(clauses), slop, self.in_order)
        return super().parse_atom(field)


def parse(query: str, searcher, in_order: bool = True):
    """Complex-phrase query string -> plan tree (expansion against
    ``searcher``'s term dictionary happens here, like the reference's
    rewrite(reader))."""
    p = _ComplexParser(query.strip(), searcher, in_order)
    out = p.parse_query(0)
    p._ws()
    if p.pos < len(p.s):
        raise ValueError(f"trailing input at: {p.s[p.pos:]!r}")
    return P.rewrite(out)
