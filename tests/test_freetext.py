"""FreeTextSuggester (stupid-backoff n-gram completion) vs a pure-
Python oracle implementing FreeTextSuggester.java's lookup contract
directly over the corpus token streams."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from lucene_spark.analysis import analyze_query_text, tokenize
from lucene_spark.search.freetext import ALPHA, FreeTextSuggester

_DOCS = [
    "big data line speeds past the old data lake",
    "data line tools beat data lake tools",
    "the data line wins big data races",
    "big data lake retention policies",
    "line data is not lake data",
    "big wins need big data",
]


def _oracle(docs, key, grams=3, num=10):
    streams = [tokenize(t)[0] for t in docs]
    counts: Counter = Counter()
    for toks in streams:
        for n in range(1, grams + 1):
            for i in range(len(toks) - n + 1):
                counts[" ".join(toks[i : i + n])] += 1
    tot = sum(c for g, c in counts.items() if " " not in g)

    toks = analyze_query_text(key)
    ended = key != key.rstrip()
    last = [None] * grams
    for g in range(min(grams, len(toks))):
        last[g] = " ".join(toks[len(toks) - 1 - g :])
    if ended:
        for g in range(grams - 1, 0, -1):
            if last[g - 1] is not None:
                last[g] = last[g - 1] + " "
        last[0] = ""

    results, seen, backoff = [], set(), 1.0
    for g in range(grams - 1, -1, -1):
        probe = last[g]
        if probe is None or (probe == "" and key):
            continue
        rows = sorted(
            (gram, c) for gram, c in counts.items()
            if gram.count(" ") == g and gram.startswith(probe)
        )
        if not rows:
            backoff *= ALPHA
            continue
        sp = probe.rfind(" ")
        ctx = tot if sp < 0 else counts.get(probe[:sp], 0)
        if not ctx:
            backoff *= ALPHA
            continue
        for gram, c in rows:
            word = gram.rsplit(" ", 1)[-1]
            if word in seen:
                continue
            seen.add(word)
            results.append((gram, backoff * c / ctx))
        backoff *= ALPHA
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:num]


def test_freetext_vs_oracle(spark):
    docs = spark.createDataFrame(pd.DataFrame({"text": _DOCS}))
    sug = FreeTextSuggester(docs, grams=3).build()
    for key in [
        "big data l",      # trigram completion of a partial word
        "data l",          # bigram context
        "big data ",       # trailing space: predict the NEXT word
        "purple mushroom data l",  # unseen trigram ctx -> backoff path
        "lak",             # unigram-only completion
        "data ",
    ]:
        got = [(g, round(s, 10)) for g, s in sug.lookup(key, 10)]
        want = [(g, round(s, 10)) for g, s in _oracle(_DOCS, key)]
        assert got == want, (key, got[:4], want[:4])
    # higher-order models outrank backoff predictions of the same shape
    got = sug.lookup("big data ", 10)
    assert got and got[0][0].startswith("big data ")
    # dedup: a word predicted at order 3 is absent from lower orders
    words = [g.rsplit(" ", 1)[-1] for g, _ in got]
    assert len(words) == len(set(words))


def test_freetext_df_and_validation(spark):
    docs = spark.createDataFrame(pd.DataFrame({"text": _DOCS}))
    sug = FreeTextSuggester(docs, grams=2).build()
    df = sug.lookup_df(spark, "data l", 5)
    assert df.columns == ["gram", "score"] and df.count() > 0
    import pytest

    with pytest.raises(ValueError):
        FreeTextSuggester(docs, grams=0)
