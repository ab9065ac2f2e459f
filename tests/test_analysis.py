"""Tokenizer semantics + cross-engine (DuckDB regexp) identity."""

import duckdb
import pandas as pd

from lucene_spark.analysis import (
    MAX_TOKEN_LENGTH,
    TOKEN_REGEX_SQL,
    analyze_batch,
    tokenize,
)
from lucene_spark.smallfloat import int_to_byte4


def test_basic():
    terms, pos = tokenize("Foo bar_baz  qux-2 ")
    assert terms == ["foo", "bar_baz", "qux", "2"]
    assert pos == [0, 1, 2, 3]


def test_empty_and_none():
    assert tokenize("") == ([], [])
    assert tokenize("...!!!") == ([], [])


def test_max_token_length_split():
    long = "a" * 600
    terms, pos = tokenize(long)
    assert [len(t) for t in terms] == [255, 255, 90]


def test_stopword_holes():
    terms, pos = tokenize("the quick the fox", stopwords=frozenset({"the"}))
    assert terms == ["quick", "fox"]
    assert pos == [1, 3]  # holes advance position increments (StopFilter)


def test_batch_matches_scalar_and_norm():
    texts = pd.Series(["Hello World hello", "", "one", "x " * 100])
    out = analyze_batch(texts)
    assert out["terms"][0] == ["hello", "world", "hello"]
    assert out["dl"].tolist() == [3, 0, 1, 100]
    assert out["norm"].tolist() == [int(int_to_byte4([d])[0]) for d in [3, 0, 1, 100]]


def test_duckdb_tokenization_identity():
    """The SQL-oracle tokenizer must equal the engine tokenizer."""
    con = duckdb.connect()
    rows = con.execute(
        "select doc_id, text, regexp_extract_all(lower(text), ?) "
        "from '/root/testdata/sf0.001/documents.parquet' order by doc_id",
        [TOKEN_REGEX_SQL],
    ).fetchall()
    for doc_id, text, sql_tokens in rows:
        assert tokenize(text)[0] == sql_tokens, doc_id
