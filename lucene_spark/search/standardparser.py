"""StandardQueryParser — the queryparser/flexible analog.

The reference's flexible framework (queryparser/flexible/standard/
StandardQueryParser.java:103) parses the SAME classic syntax surface
(StandardSyntaxParser.jj mirrors QueryParser.jj) but exposes a
config-handler API instead of parser subclassing:

- ``setDefaultOperator(AND|OR)`` (StandardQueryParser.java:244-263) —
  how bare juxtaposed clauses combine; explicit AND/OR/+/- still win.
- ``setMultiFields(fields)`` (StandardQueryParser.java:217-236) —
  field-less clauses are expanded into a SHOULD disjunction across the
  given fields (MultiFieldQueryNodeProcessor), optional per-field
  boosts via a ``{field: boost}`` map.
- ``setPhraseSlop(n)`` (StandardQueryParser.java:418) — default slop
  applied to quoted phrases that carry no explicit ``~n``.
- ``setAllowLeadingWildcard(bool)`` (StandardQueryParser.java:281;
  default False) — a leading ``*``/``?`` in a wildcard raises, like the
  reference's AllowLeadingWildcardProcessor.

The classic recursive-descent parser (``search/queryparser.py``) does
the syntax work; this module applies the flexible-framework config as
plan-tree processors (the QueryNodeProcessorPipeline analog: each
config knob is one bottom-up tree rewrite over the frozen dataclass
nodes).
"""

from __future__ import annotations

import dataclasses

from lucene_spark.search import plans as P
from lucene_spark.search import queryparser as _classic

# leaf node types carrying a per-field binding (field=None = default)
_FIELD_LEAVES = (
    P.TermQ,
    P.PhraseQ,
    P.NGramPhraseQ,
    P.MultiPhraseQ,
    P.SynonymQ,
    P.PrefixQ,
    P.WildcardQ,
    P.RegexpQ,
    P.FuzzyQ,
    P.TermRangeQ,
    P.TermInSetQ,
)


def _transform(node, fn):
    """Bottom-up tree map over the frozen-dataclass plan nodes."""
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, tuple) and any(
                dataclasses.is_dataclass(x) for x in v
            ):
                nv = tuple(_transform(x, fn) for x in v)
                if nv != v:
                    changes[f.name] = nv
            elif dataclasses.is_dataclass(v) and not isinstance(v, type):
                nv = _transform(v, fn)
                if nv is not v:
                    changes[f.name] = nv
        if changes:
            node = dataclasses.replace(node, **changes)
    return fn(node)


class StandardQueryParser:
    """Flexible-framework entry point over the classic syntax."""

    def __init__(self):
        self.default_operator = "OR"
        self.multi_fields: dict | None = None
        self.phrase_slop = 0
        self.allow_leading_wildcard = False

    # -- config handler setters (StandardQueryParser.java API names) ---
    def set_default_operator(self, op: str):
        if op not in ("AND", "OR"):
            raise ValueError("operator must be 'AND' or 'OR'")
        self.default_operator = op
        return self

    def set_multi_fields(self, fields):
        """List of field names, or {field: boost}."""
        if fields is None:
            self.multi_fields = None
        elif isinstance(fields, dict):
            self.multi_fields = dict(fields)
        else:
            self.multi_fields = {f: 1.0 for f in fields}
        return self

    def set_phrase_slop(self, slop: int):
        self.phrase_slop = int(slop)
        return self

    def set_allow_leading_wildcard(self, allow: bool):
        self.allow_leading_wildcard = bool(allow)
        return self

    # -- parse ----------------------------------------------------------
    def parse(self, query: str):
        p = _classic._Parser(query.strip(), default_op=self.default_operator)
        tree = p.parse_query(0)
        p._ws()
        if p.pos < len(p.s):
            raise ValueError(f"trailing input at: {p.s[p.pos:]!r}")
        if not self.allow_leading_wildcard:
            _transform(tree, self._check_leading_wildcard)
        if self.phrase_slop:
            tree = _transform(tree, self._apply_phrase_slop)
        if self.multi_fields:
            tree = _transform(tree, self._expand_fields)
        return P.rewrite(tree)

    @staticmethod
    def _check_leading_wildcard(node):
        if isinstance(node, P.WildcardQ) and node.pattern[:1] in ("*", "?"):
            raise ValueError(
                f"leading wildcard not allowed: {node.pattern!r} "
                "(set_allow_leading_wildcard(True) to enable)"
            )
        return node

    def _apply_phrase_slop(self, node):
        if isinstance(node, (P.PhraseQ, P.MultiPhraseQ)) and node.slop == 0:
            return dataclasses.replace(node, slop=self.phrase_slop)
        return node

    def _expand_fields(self, node):
        if isinstance(node, _FIELD_LEAVES) and node.field is None:
            clauses = []
            for fld, boost in self.multi_fields.items():
                q = dataclasses.replace(node, field=fld)
                if boost != 1.0:
                    q = P.BoostQ(q, boost)
                clauses.append(q)
            if len(clauses) == 1:
                return clauses[0]
            return P.BoolQ(should=tuple(clauses))
        return node


def parse(
    query: str,
    default_operator: str = "OR",
    multi_fields=None,
    phrase_slop: int = 0,
    allow_leading_wildcard: bool = False,
):
    """One-shot convenience mirroring QueryParserUtil.parse."""
    sp = StandardQueryParser()
    sp.set_default_operator(default_operator)
    sp.set_multi_fields(multi_fields)
    sp.set_phrase_slop(phrase_slop)
    sp.set_allow_leading_wildcard(allow_leading_wildcard)
    return sp.parse(query)
