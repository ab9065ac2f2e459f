"""XML query parser — CoreParser analog over the plan-node algebra.

Re-expresses `queryparser/xml/CoreParser.java:72-116` and its builders/
package: an XML element tree maps 1:1 onto query plan nodes through a
name->builder registry (the reference's QueryBuilderFactory seam —
`register()` here is `CoreParser.addBuilder`).

Supported elements (builders/*.java):

  TermQuery fieldName= boost=        -> TermQ
  TermsQuery fieldName=              -> BoolQ SHOULD over analyzed terms
  MatchAllDocsQuery                  -> MatchAllQ
  BooleanQuery / Clause occurs=      -> BoolQ (must|should|mustNot|filter,
     minimumNumberShouldMatch=)         min_should_match)
  RangeQuery lower/upperTerm=        -> TermRangeQ (includeLower/Upper)
  PointRangeQuery                    -> FieldFilter 'between' (constant
                                        score, like the reference's
                                        PointRangeQueryBuilder)
  DisjunctionMaxQuery tieBreaker=    -> DisMaxQ
  ConstantScoreQuery                 -> ConstScoreQ
  UserQuery                          -> classic QueryParser on the text
  SpanTerm / SpanNear slop= inOrder= -> SpanTermQ / SpanNearQ
  SpanOr / SpanOrTerms               -> SpanOrQ (terms variant analyzes)
  SpanFirst end=                     -> SpanFirstQ
  SpanNot (Include/Exclude children) -> SpanNotQ
  BoostingTermQuery                  -> PayloadScoreQ(SpanTermQ, avg) —
     the reference builds PayloadScoreQuery with AveragePayloadFunction
     (BoostingTermBuilder.java:37); include_span_score divergence is
     documented on PayloadScoreQ

Unsupported reference builders raise UnsupportedXmlElement naming the
element (SpanPositionRange, LikeThisQuery, FuzzyLikeThisQuery) — the
registry seam accepts replacements, matching CoreParser's extensibility
contract. Python's xml.etree does not resolve external entities, so
parsing untrusted query XML is safe by default.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_spark.analysis import analyze_query_text
from lucene_spark.search import plans as P


class XmlParseError(ValueError):
    pass


class UnsupportedXmlElement(XmlParseError):
    def __init__(self, name: str):
        super().__init__(
            f"no builder registered for element <{name}> "
            "(CoreParser.addBuilder analog: xmlparser.register)"
        )


def _boost(el) -> float:
    return float(el.get("boost", "1.0"))


def _field(el, parser) -> str | None:
    return el.get("fieldName", parser.default_field)


def _children(el):
    return [c for c in el if isinstance(c.tag, str)]


def _one_child(el, parser):
    kids = _children(el)
    if len(kids) != 1:
        raise XmlParseError(
            f"<{el.tag}> expects exactly one child query, got {len(kids)}")
    return parser.build(kids[0])


# --- query builders (builders/*.java) ---------------------------------------


def _term_query(el, parser):
    return P.TermQ((el.text or "").strip().lower(),
                   boost=_boost(el), field=_field(el, parser))


def _terms_query(el, parser):
    """TermsQueryBuilder.java: analyze the text, one SHOULD TermQuery
    per emitted token."""
    terms = analyze_query_text((el.text or "").strip())
    f = _field(el, parser)
    return P.BoolQ(
        should=tuple(P.TermQ(t, field=f) for t in terms),
        boost=_boost(el),
    )


def _match_all(el, parser):
    return P.MatchAllQ(boost=_boost(el))


_OCCURS = {"must": "must", "should": "should",
           "mustNot": "must_not", "filter": "filter"}


def _boolean_query(el, parser):
    groups = {"must": [], "should": [], "must_not": [], "filter": []}
    for clause in _children(el):
        if clause.tag != "Clause":
            raise XmlParseError(
                f"<BooleanQuery> children must be <Clause>, got <{clause.tag}>")
        occurs = clause.get("occurs", "should")
        if occurs not in _OCCURS:
            raise XmlParseError(f"unknown occurs={occurs!r}")
        groups[_OCCURS[occurs]].append(_one_child(clause, parser))
    return P.BoolQ(
        must=tuple(groups["must"]),
        should=tuple(groups["should"]),
        must_not=tuple(groups["must_not"]),
        filter=tuple(groups["filter"]),
        min_should_match=int(el.get("minimumNumberShouldMatch", "0")),
        boost=_boost(el),
    )


def _range_query(el, parser):
    return P.TermRangeQ(
        (el.get("lowerTerm") or "").lower() or None,
        (el.get("upperTerm") or "").lower() or None,
        el.get("includeLower", "true") == "true",
        el.get("includeUpper", "true") == "true",
        boost=_boost(el),
        field=_field(el, parser),
    )


def _point_range_query(el, parser):
    f = el.get("fieldName")
    if not f:
        raise XmlParseError("<PointRangeQuery> requires fieldName")
    lo = el.get("lowerTerm")
    hi = el.get("upperTerm")
    cast = int if el.get("type", "int") in ("int", "long") else float
    return P.FieldFilter(
        f, "between",
        (cast(lo) if lo is not None else None,
         cast(hi) if hi is not None else None),
    )


def _dismax_query(el, parser):
    return P.DisMaxQ(
        tuple(parser.build(c) for c in _children(el)),
        tiebreak=float(el.get("tieBreaker", "0.0")),
        boost=_boost(el),
    )


def _const_score(el, parser):
    return P.ConstScoreQ(_one_child(el, parser), boost=_boost(el))


def _user_query(el, parser):
    from lucene_spark.search.queryparser import parse as _classic_parse

    q = _classic_parse((el.text or "").strip())
    b = _boost(el)
    return q if b == 1.0 else P.BoostQ(q, b)


# --- span builders ----------------------------------------------------------


def _span_term(el, parser):
    return P.SpanTermQ((el.text or "").strip().lower(),
                       boost=_boost(el), field=_field(el, parser))


def _span_near(el, parser):
    return P.SpanNearQ(
        tuple(parser.build_span(c) for c in _children(el)),
        slop=int(el.get("slop", "0")),
        in_order=el.get("inOrder", "true") == "true",
        boost=_boost(el),
    )


def _span_or(el, parser):
    return P.SpanOrQ(
        tuple(parser.build_span(c) for c in _children(el)),
        boost=_boost(el),
    )


def _span_or_terms(el, parser):
    """SpanOrTermsBuilder.java: analyze text -> SpanOr of SpanTerms."""
    f = _field(el, parser)
    terms = analyze_query_text((el.text or "").strip())
    if not terms:
        raise XmlParseError("<SpanOrTerms> analyzed to zero tokens")
    return P.SpanOrQ(
        tuple(P.SpanTermQ(t, field=f) for t in terms), boost=_boost(el))


def _span_first(el, parser):
    return P.SpanFirstQ(
        _one_span_child(el, parser), end=int(el.get("end", "1")),
        boost=_boost(el))


def _one_span_child(el, parser):
    kids = _children(el)
    if len(kids) != 1:
        raise XmlParseError(
            f"<{el.tag}> expects exactly one child span, got {len(kids)}")
    return parser.build_span(kids[0])


def _span_not(el, parser):
    inc = exc = None
    for c in _children(el):
        if c.tag == "Include":
            inc = _one_span_child(c, parser)
        elif c.tag == "Exclude":
            exc = _one_span_child(c, parser)
    if inc is None or exc is None:
        raise XmlParseError("<SpanNot> needs <Include> and <Exclude>")
    return P.SpanNotQ(inc, exc, boost=_boost(el))


def _boosting_term(el, parser):
    span = _span_term(el, parser)
    return P.PayloadScoreQ(span, func="avg", boost=_boost(el))


_QUERY_BUILDERS = {
    "TermQuery": _term_query,
    "TermsQuery": _terms_query,
    "MatchAllDocsQuery": _match_all,
    "BooleanQuery": _boolean_query,
    "RangeQuery": _range_query,
    "PointRangeQuery": _point_range_query,
    "DisjunctionMaxQuery": _dismax_query,
    "ConstantScoreQuery": _const_score,
    "UserQuery": _user_query,
    "SpanTerm": _span_term,
    "SpanNear": _span_near,
    "SpanOr": _span_or,
    "SpanOrTerms": _span_or_terms,
    "SpanFirst": _span_first,
    "SpanNot": _span_not,
    "BoostingTermQuery": _boosting_term,
}

_SPAN_BUILDERS = {
    "SpanTerm": _span_term,
    "SpanNear": _span_near,
    "SpanOr": _span_or,
    "SpanOrTerms": _span_or_terms,
    "SpanFirst": _span_first,
    "SpanNot": _span_not,
}


def register(name: str, fn, span: bool = False) -> None:
    """CoreParser.addBuilder / addSpanBuilder analog."""
    _QUERY_BUILDERS[name] = fn
    if span:
        _SPAN_BUILDERS[name] = fn


class XmlQueryParser:
    """CoreParser.java:56 — parse(xml) -> plan node."""

    def __init__(self, default_field: str | None = None):
        self.default_field = default_field

    def build(self, el):
        fn = _QUERY_BUILDERS.get(el.tag)
        if fn is None:
            raise UnsupportedXmlElement(el.tag)
        return fn(el, self)

    def build_span(self, el):
        fn = _SPAN_BUILDERS.get(el.tag)
        if fn is None:
            raise UnsupportedXmlElement(el.tag)
        return fn(el, self)

    def parse(self, xml: str):
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as e:
            raise XmlParseError(f"malformed query XML: {e}") from e
        return self.build(root)


def parse(xml: str, default_field: str | None = None):
    return XmlQueryParser(default_field).parse(xml)
