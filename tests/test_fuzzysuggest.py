"""FuzzySuggester (suggest/analyzing/FuzzySuggester.java analog) vs a
brute-force oracle over the collected term dictionary."""

from __future__ import annotations

from lucene_spark.corpus import make_corpus
from lucene_spark.index import Index, build_index
from lucene_spark.search.executor import _edit_distance
from lucene_spark.search.fuzzysuggest import FuzzySuggester


def _brute(vocab, query, e, transpositions, non_fuzzy_prefix, min_len, n):
    if len(query) < min_len or e == 0:
        keep = [(t, w) for t, w in vocab if t.startswith(query)]
    else:
        keep = []
        lo, hi = max(1, len(query) - e), len(query) + e
        for t, w in vocab:
            if not t.startswith(query[:non_fuzzy_prefix]):
                continue
            if len(t) < len(query) - e:
                continue
            d = min(
                _edit_distance(t[:L], query, transpositions)
                for L in range(lo, min(hi, len(t)) + 1)
            )
            if d <= e:
                keep.append((t, w))
    keep.sort(key=lambda x: (-x[1], x[0]))
    return keep[:n]


def test_fuzzy_suggest_vs_brute(spark, tmp_path_factory):
    pdf = make_corpus(200, seed=37)
    idx_dir = str(tmp_path_factory.mktemp("fsug_idx"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", keep_cols=["lang"], num_buckets=4, salt_rows=64,
    )
    from pyspark.sql import functions as F

    idx = Index(spark, idx_dir)
    stats = idx.term_stats
    if idx.has_field_column:
        stats = stats.filter(F.col("field") == idx.resolve_field(None))
    rows = stats.groupBy("term").sum("ttf").collect()
    vocab = [(r["term"], int(r["sum(ttf)"])) for r in rows]

    for query, edits, transp in [
        ("licens", 1, True),      # typo'd prefix of 'license'
        ("improt", 1, True),      # transposition: 'import'
        ("improt", 1, False),     # without transpositions: differs
        ("asyncc", 2, True),
        ("fu", 1, True),          # below min_fuzzy_length -> exact prefix
    ]:
        sug = FuzzySuggester(idx, max_edits=edits, transpositions=transp)
        got = [(r["term"], int(r["weight"]))
               for r in sug.lookup(query, n=8).collect()]
        want = _brute(vocab, query, edits, transp, 1, 3, 8)
        assert got == want, (query, edits, transp, got[:3], want[:3])

    # transpositions actually matter for 'improt' (OSA 1, plain lev 2)
    with_t = {r["term"] for r in FuzzySuggester(idx, 1, True).lookup("improt").collect()}
    assert "import" in with_t
    without_t = {r["term"] for r in FuzzySuggester(idx, 1, False).lookup("improt").collect()}
    assert "import" not in without_t
