from lucene_spark.search.plans import (  # noqa: F401
    BoolQ,
    BoostQ,
    ConstScoreQ,
    DisMaxQ,
    FieldFilter,
    FuzzyQ,
    MatchAllQ,
    PhraseQ,
    PrefixQ,
    RegexpQ,
    SynonymQ,
    TermInSetQ,
    TermQ,
    TermRangeQ,
    WildcardQ,
)
from lucene_spark.search.executor import Searcher  # noqa: F401
