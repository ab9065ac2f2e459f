"""Analyzer-driven query construction (util/QueryBuilder.java:66).

The reference's ``QueryBuilder`` is the piece every search application
actually calls: it re-runs the analysis chain over free query text and
assembles the right query shape from the token stream — a single
``TermQuery``, a ``BooleanQuery`` of per-position clauses, a
``SynonymQuery`` when several tokens share one position
(posIncr=0), a ``PhraseQuery`` (with stop-hole position gaps) for
quoted text, or a ``MultiPhraseQuery`` when a quoted stream carries
synonyms. ``createMinShouldMatchQuery`` converts a 0..1 fraction to an
absolute minimumNumberShouldMatch (QueryBuilder.java:153-180).

Spark-first: this is pure plan construction on the driver — the output
is a plan node tree the executor lowers to the same DataFrame plans as
hand-built queries, so Catalyst sees nothing new.
"""

from __future__ import annotations

from lucene_spark.analysis import tokenize
from lucene_spark.search import plans as P


def _positions_grouped(text: str, analyzer: dict | None,
                       expand_synonyms: bool):
    """Run the chain; group emitted terms by position (CachingTokenFilter
    pass 1, QueryBuilder.java:312-341). Returns ordered
    [(position, [terms...]), ...] — multiple terms at one position mean
    posIncr=0 injections (query-time synonyms)."""
    terms, positions = tokenize(
        text or "", analyzer=analyzer, expand_synonyms=expand_synonyms
    )
    grouped: dict[int, list[str]] = {}
    order: list[int] = []
    for t, p in zip(terms, positions):
        if p not in grouped:
            grouped[p] = []
            order.append(p)
        grouped[p].append(t)
    return [(p, grouped[p]) for p in order]


class QueryBuilder:
    """Creates queries from the analysis chain (QueryBuilder.java:66).

    ``analyzer`` is the same config dict the index was built with
    (``Index.analyzer``); pass ``expand_synonyms=True`` for the
    query-time-synonym setup (SynonymQuery per shared position) against
    an index built WITHOUT index-time expansion — mirroring how the
    reference's analyzer choice decides which side expands.
    """

    def __init__(self, analyzer: dict | None = None,
                 expand_synonyms: bool = False):
        self.analyzer = analyzer
        self.expand_synonyms = expand_synonyms

    # -- createBooleanQuery(field, text, operator) -------------------
    def create_boolean_query(self, field: str | None, text: str,
                             operator: str = "should"):
        """QueryBuilder.java:93-112. operator in {'should','must'};
        returns None for an all-stopword/empty stream (MatchNoDocs by
        convention at the call site, like the reference's null)."""
        if operator not in ("should", "must"):
            raise ValueError("invalid operator: only should or must are allowed")
        return self._field_query(field, text, operator, quoted=False, slop=0)

    # -- createPhraseQuery(field, text, slop) ------------------------
    def create_phrase_query(self, field: str | None, text: str,
                            phrase_slop: int = 0):
        """QueryBuilder.java:124-141: quoted text -> phrase (stop holes
        preserved as position gaps, analyzePhrase's builder.add(term,
        position)); degenerates to TermQuery for one token."""
        return self._field_query(field, text, "must", quoted=True,
                                 slop=phrase_slop)

    # -- createMinShouldMatchQuery(field, text, fraction) ------------
    def create_min_should_match_query(self, field: str | None, text: str,
                                      fraction: float):
        """QueryBuilder.java:153-180: fraction==1 -> MUST conjunction;
        else SHOULD query with msm = int(fraction * n_clauses)."""
        if not (0.0 <= fraction <= 1.0):
            raise ValueError("fraction should be >= 0 and <= 1")
        if fraction == 1.0:
            return self.create_boolean_query(field, text, "must")
        q = self._field_query(field, text, "should", quoted=False, slop=0)
        if isinstance(q, P.BoolQ):
            msm = int(fraction * len(q.should))
            q = P.BoolQ(should=q.should, min_should_match=msm)
        return q

    # -- createFieldQuery (QueryBuilder.java:296-377) -----------------
    def _field_query(self, field, text, operator, quoted, slop):
        groups = _positions_grouped(text, self.analyzer,
                                    self.expand_synonyms)
        if not groups:
            return None  # numTokens == 0 -> null query
        n_positions = len(groups)
        has_synonyms = any(len(ts) > 1 for _, ts in groups)

        if n_positions == 1 and len(groups[0][1]) == 1:
            # single term (analyzeTerm, QueryBuilder.java:379)
            return P.TermQ(groups[0][1][0], field=field)
        if quoted and n_positions > 1:
            if has_synonyms:
                # analyzeMultiPhrase (QueryBuilder.java:470): term
                # alternatives per position. MultiPhraseQ slots are
                # consecutive; reject hole-bearing streams loudly
                # rather than silently shifting positions.
                base = groups[0][0]
                if any(p - base != i for i, (p, _) in enumerate(groups)):
                    raise NotImplementedError(
                        "quoted query with both synonyms and stopword "
                        "holes is not supported (MultiPhraseQ slots are "
                        "consecutive)")
                return P.MultiPhraseQ(
                    tuple(tuple(ts) for _, ts in groups), slop=slop,
                    field=field)
            # analyzePhrase (QueryBuilder.java:443): keep position gaps
            base = groups[0][0]
            return P.PhraseQ(
                tuple(ts[0] for _, ts in groups), slop=slop, field=field,
                positions=tuple(p - base for p, _ in groups))
        # boolean paths (analyzeBoolean / analyzeMultiBoolean,
        # QueryBuilder.java:392-436)
        clauses = []
        for _, ts in groups:
            if len(ts) == 1:
                clauses.append(P.TermQ(ts[0], field=field))
            else:
                clauses.append(P.SynonymQ(tuple(ts), field=field))
        if n_positions == 1:
            return clauses[0]  # lone SynonymQuery
        if operator == "must":
            return P.BoolQ(must=tuple(clauses))
        return P.BoolQ(should=tuple(clauses))
