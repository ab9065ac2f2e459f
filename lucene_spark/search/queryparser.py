"""Classic query-string parser — the queryparser/classic analog
(queryparser/classic/QueryParserBase.java:112-117, QueryParser.jj grammar).

Grammar subset (the operators the classic demo exposes,
demo/SearchFiles.java:89-121):

    query     := clause (WS clause)*
    clause    := [+|-] [boolop] atom [~N] [^boost]
    boolop    := AND | OR | NOT (uppercase, infix)
    atom      := '"' terms '"' [~slop]      phrase (PhraseQuery)
               | term'*' / te?m            wildcard (prefix fast-path)
               | term~[N]                  fuzzy (default 2 edits)
               | [lo TO hi] / {lo TO hi}   term range (incl/excl)
               | term                      TermQuery

Like the reference, the parser re-runs the analyzer on query text
(util/QueryBuilder.java) so query-side and index-side tokenization agree:
a quoted phrase is analyzed into its token sequence; a bare atom that
analyzes to multiple tokens becomes an OR of terms (default OR operator,
QueryParserBase default). `+term` = MUST, `-term` = MUST_NOT, infix AND
groups its two neighbours as MUST, NOT negates the following clause.

This is deliberately a single-pass, non-recursive grammar (no
parentheses) — the plan dataclasses compose programmatically for
anything richer.
"""

from __future__ import annotations

import re

from lucene_spark.analysis import analyze_query_text
from lucene_spark.search import plans as P

_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
      | \[(?P<ilo>\S+)\s+TO\s+(?P<ihi>\S+)\]
      | \{(?P<elo>\S+)\s+TO\s+(?P<ehi>\S+)\}
      | (?P<bare>[^\s^~"]+)(?:~(?P<edits>\d*))?
    )(?:\^(?P<boost>\d+(?:\.\d+)?))?
    """,
    re.VERBOSE,
)


def _atom(m: re.Match):
    boost = float(m.group("boost")) if m.group("boost") else 1.0

    def boosted(q):
        return P.BoostQ(q, boost) if boost != 1.0 else q

    if m.group("phrase") is not None:
        toks = analyze_query_text(m.group("phrase"))
        slop = int(m.group("slop") or 0)
        if not toks:
            return boosted(P.MatchAllQ())
        if len(toks) == 1:
            return boosted(P.TermQ(toks[0]))
        return boosted(P.PhraseQ(tuple(toks), slop=slop))
    if m.group("ilo") is not None:
        return boosted(P.TermRangeQ(m.group("ilo").lower(), m.group("ihi").lower(),
                                    True, True))
    if m.group("elo") is not None:
        return boosted(P.TermRangeQ(m.group("elo").lower(), m.group("ehi").lower(),
                                    False, False))
    bare = m.group("bare")
    if m.group("edits") is not None:
        edits = int(m.group("edits")) if m.group("edits") else 2
        return boosted(P.FuzzyQ(bare.lower(), max_edits=edits))
    if "*" in bare or "?" in bare:
        if bare.endswith("*") and "*" not in bare[:-1] and "?" not in bare:
            return boosted(P.PrefixQ(bare[:-1].lower()))
        return boosted(P.WildcardQ(bare.lower()))
    toks = analyze_query_text(bare)
    if not toks:
        return boosted(P.MatchAllQ())
    if len(toks) == 1:
        return boosted(P.TermQ(toks[0]))
    # analyzer split one atom into several tokens -> OR of terms
    return boosted(P.BoolQ(should=tuple(P.TermQ(t) for t in toks)))


def parse(query: str):
    """Query string -> plan tree (rewrite-normalized)."""
    occur_atoms: list[tuple[str, object]] = []  # (occur, atom)
    pending_and = False
    pending_not = False
    pos = 0
    s = query.strip()
    while pos < len(s):
        # word operators
        mop = re.match(r"\s*(AND|OR|NOT|&&|\|\|)\b", s[pos:])
        if mop:
            op = mop.group(1)
            if op in ("AND", "&&"):
                pending_and = True
            elif op == "NOT":
                pending_not = True
            pos += mop.end()
            continue
        mpre = re.match(r"\s*([+-])", s[pos:])
        occur = "should"
        if mpre and not re.match(r"\s*[+-]?\d", s[pos:]):
            occur = "must" if mpre.group(1) == "+" else "must_not"
            pos += mpre.end()
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            raise ValueError(f"cannot parse query at: {s[pos:]!r}")
        pos = m.end()
        atom = _atom(m)
        if pending_not:
            occur = "must_not"
            pending_not = False
        if pending_and:
            # infix AND: promote this atom and the previous one to MUST
            if occur_atoms and occur_atoms[-1][0] == "should":
                occur_atoms[-1] = ("must", occur_atoms[-1][1])
            if occur == "should":
                occur = "must"
            pending_and = False
        occur_atoms.append((occur, atom))

    must = tuple(a for o, a in occur_atoms if o == "must")
    should = tuple(a for o, a in occur_atoms if o == "should")
    must_not = tuple(a for o, a in occur_atoms if o == "must_not")
    if len(occur_atoms) == 1 and should:
        return P.rewrite(should[0])
    return P.rewrite(P.BoolQ(must=must, should=should, must_not=must_not))
