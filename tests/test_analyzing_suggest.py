"""AnalyzingSuggester (suggest/analyzing/AnalyzingSuggester.java) —
analyzed-prefix completion with preserve_sep and exact_first contracts,
vs a brute-force oracle."""

from __future__ import annotations

import pandas as pd

from lucene_spark.analysis import tokenize
from lucene_spark.search.suggest import AnalyzingSuggester

_ENTRIES = [
    (0, "The Ghost of Christmas Past", 10),
    (1, "ghost christmas carols", 50),
    (2, "ghostchristmas mashup", 40),
    (3, "Ghost Stories", 30),
    (4, "christmas ghost tales", 20),
    (5, "ghost christmas", 5),  # low weight: only exact_first ranks it on top
]


def _brute(query, preserve_sep=True, exact_first=True, n=10):
    sep = " " if preserve_sep else ""
    qa = sep.join(tokenize(query)[0])
    rows = []
    for k, t, w in _ENTRIES:
        an = sep.join(tokenize(t)[0])
        if an.startswith(qa):
            rows.append((an == qa, k, t, w))
    rows.sort(key=lambda r: (
        (not r[0]) if exact_first else False, -r[3], r[2]))
    return [(k, t, w) for _e, k, t, w in rows[:n]]


def test_analyzing_suggester_contracts(spark):
    df = spark.createDataFrame(
        pd.DataFrame(_ENTRIES, columns=["key", "text", "weight"])
    )
    sug = AnalyzingSuggester(df).build()
    for q in ["ghost chr", "ghost", "Ghost Christmas", "christmas", "gh"]:
        got = [(r["key"], r["text"], r["weight"])
               for r in sug.lookup(q, 10).collect()]
        assert got == _brute(q), (q, got)

    # preserve_sep: "ghostch" must NOT match across the token boundary
    got = {r["key"] for r in sug.lookup("ghostch", 10).collect()}
    assert got == {2}
    # ...but with preserve_sep=False it does
    nosep = AnalyzingSuggester(df, preserve_sep=False).build()
    got2 = {r["key"] for r in nosep.lookup("ghostch", 10).collect()}
    assert 1 in got2 and 5 in got2 and 2 in got2

    # exact_first: "ghost christmas" is an exact analyzed match with the
    # LOWEST weight — exact_first must still put it on top; with
    # exact_first off, order is pure weight and it sinks
    top = sug.lookup("ghost christmas", 3).collect()[0]
    assert top["key"] == 5
    noex = AnalyzingSuggester(df, exact_first=False).build()
    got3 = [r["key"] for r in noex.lookup("ghost christmas", 3).collect()]
    assert got3 == [k for k, _t, _w in _brute(
        "ghost christmas", exact_first=False, n=3)]
