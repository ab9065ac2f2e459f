"""Analysis-chain zoo tests (lucene_spark/analysis.py).

The Porter stemmer is verified against the reference's own vocabulary
fixture (analysis/common/src/test/org/apache/lucene/analysis/en/
porterTestData.zip — ~23.5k (word, stem) pairs distributed with the
algorithm); the S-stemmer against the EnglishMinimalStemmer rules; the
chain semantics (stop holes, synonym overlaps, discounted lengths)
against hand-built expectations.
"""

import os
import zipfile

import duckdb
import pytest

from lucene_spark.analysis import (
    analyze_batch,
    analyze_query_text,
    english_minimal_stem,
    fold_ascii,
    minimal_stem_sql,
    porter_stem,
    tokenize,
)

import pandas as pd

_PORTER_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/en/porterTestData.zip"
)


@pytest.mark.skipif(not os.path.exists(_PORTER_ZIP), reason="no reference data")
def test_porter_full_vocabulary():
    with zipfile.ZipFile(_PORTER_ZIP) as z:
        voc = z.read("voc.txt").decode().split()
        out = z.read("output.txt").decode().split()
    assert len(voc) == len(out) and len(voc) > 20_000
    mism = [(v, porter_stem(v), o) for v, o in zip(voc, out) if porter_stem(v) != o]
    assert mism == []


def test_english_minimal_stem_rules():
    # en/EnglishMinimalStemmer.java:26-44 branch-by-branch
    cases = {
        "as": "as",          # len < 3
        "day": "day",        # no trailing s
        "bus": "bus",        # -us kept
        "class": "class",    # -ss kept
        "ponies": "pony",    # -ies -> y
        "aes": "aes",        # s[len-4] == 'a' blocks the ies rule... (len==3 path)
        "dies": "dy",
        "goes": "goes",      # -oes kept
        "sees": "sees",      # -ees kept
        "ties": "ty",
        "types": "type",     # -es after consonant: drop s
        "tables": "table",
        "rows": "row",
        "mergers": "merger",
    }
    for w, want in cases.items():
        assert english_minimal_stem(w) == want, w


def test_minimal_stem_sql_matches_python():
    """The SQL CASE the oracles use and the Python rule must agree on a
    broad sample (incl. every branch boundary)."""
    words = [
        "a", "as", "ss", "us", "bus", "gas", "its", "ies", "dies", "aies",
        "eies", "oies", "pies", "ponies", "movies", "series", "goes",
        "toes", "sees", "fees", "shoes", "types", "tables", "classes",
        "values", "merges", "rows", "vectors", "days", "boys", "xyz",
    ]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {minimal_stem_sql('w')} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()
    for w, (g,) in zip(words, got):
        assert g == english_minimal_stem(w), w


def test_fold_ascii():
    # representative ASCIIFoldingFilter mappings: decomposables via NFKD,
    # non-decomposables via the supplement table
    assert fold_ascii("café") == "cafe"
    assert fold_ascii("naïve") == "naive"
    assert fold_ascii("straße") == "strasse"
    assert fold_ascii("ångström") == "angstrom"
    assert fold_ascii("łódź œuf þing") == "lodz oeuf thing"
    assert fold_ascii("plain ascii_42") == "plain ascii_42"


def test_fold_joins_tokens_pre_tokenize():
    # unfolded, é splits the run; folded it joins — fold runs BEFORE
    # the tokenizer so the emitted token is the folded whole word
    terms, _ = tokenize("café", analyzer={"ascii_fold": True})
    assert terms == ["cafe"]
    terms, _ = tokenize("café")
    assert terms == ["caf"]


def test_synonym_injection_positions_and_dl():
    an = {"synonyms": {"fast": ["quick", "rapid"]}, "keep_orig": True}
    df = analyze_batch(pd.Series(["fast merge fast"]), analyzer=an)
    # injected tokens share the source position (posIncr=0)
    assert list(df["terms"][0]) == [
        "fast", "quick", "rapid", "merge", "fast", "quick", "rapid"
    ]
    assert list(df["positions"][0]) == [0, 0, 0, 1, 2, 2, 2]
    # discountOverlaps: dl counts originals only
    assert df["dl"][0] == 3


def test_synonym_keep_orig_false():
    an = {"synonyms": {"fast": ["quick"]}, "keep_orig": False}
    df = analyze_batch(pd.Series(["fast merge"]), analyzer=an)
    assert list(df["terms"][0]) == ["quick", "merge"]
    assert df["dl"][0] == 2


def test_stop_then_synonym_then_stem_order():
    an = {
        "stopwords": ["the"],
        "synonyms": {"fast": ["quick"]},
        "keep_orig": True,
        "filters": ["english_minimal_stem"],
    }
    df = analyze_batch(pd.Series(["the fast merges"]), analyzer=an)
    # 'the' removed with a hole, synonyms injected, then everything
    # (originals + injected) stemmed
    assert list(df["terms"][0]) == ["fast", "quick", "merge"]
    assert list(df["positions"][0]) == [1, 1, 2]
    assert df["dl"][0] == 2


def test_query_side_skips_synonyms():
    an = {"synonyms": {"fast": ["quick"]}, "filters": ["english_minimal_stem"]}
    assert analyze_query_text("fast merges", analyzer=an) == ["fast", "merge"]


_UAX_CASES = [
    "don't stop 3.14 foo.bar a.1 1.a x..y a. .b a.b.c.d.e ver1.2 e'' 'q' it's",
    "pkg.main.sub v9.9.9 under_score.join",
    "",
    "mix.4 4.mix _.a a._",
]


def test_uax29_joins():
    an = {"tokenizer": "uax29"}
    terms, _ = tokenize(_UAX_CASES[0], analyzer=an)
    # StandardTokenizer UAX#29 WB6/WB7 + WB11/WB12: letter.letter,
    # letter'letter, digit.digit join; mixed categories break
    assert "don't" in terms and "3.14" in terms and "foo.bar" in terms
    assert "a.b.c.d.e" in terms and "ver1.2" in terms and "it's" in terms
    assert "a.1" not in terms and "x..y" not in terms
    terms, _ = tokenize("mix.4 4.mix", analyzer=an)
    assert terms == ["mix", "4", "4", "mix"]
    # '_' is ExtendNumLet inside runs but does not enable '.'/'\'' joins
    terms, _ = tokenize("under_score.join _.a", analyzer=an)
    assert terms == ["under_score.join", "_", "a"]


def test_uax29_sql_parity():
    from lucene_spark.analysis import uax29_tokens_sql

    an = {"tokenizer": "uax29"}
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {uax29_tokens_sql('t')} FROM (SELECT unnest(?) AS t)",
        [_UAX_CASES],
    ).fetchall()
    for c, (g,) in zip(_UAX_CASES, got):
        assert tokenize(c, analyzer=an)[0] == list(g), c
    # batch path agrees with the per-string path
    df = analyze_batch(pd.Series(_UAX_CASES), analyzer=an)
    for i, c in enumerate(_UAX_CASES):
        assert list(df["terms"][i]) == tokenize(c, analyzer=an)[0]


def test_batch_matches_single_doc_path():
    an = {
        "ascii_fold": True,
        "stopwords": ["a"],
        "synonyms": {"fast": ["quick"]},
        "filters": ["porter_stem"],
    }
    texts = ["a fast café merging", "", "relational databases", None]
    df = analyze_batch(pd.Series(texts), analyzer=an)
    for i, t in enumerate(texts):
        terms, pos = tokenize(t or "", analyzer=an)
        assert list(df["terms"][i]) == terms
        assert list(df["positions"][i]) == pos


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter analog (word_delimiter analyzer option)
# ---------------------------------------------------------------------------

_WD_CASES = [
    "getHTTPResponse_v2 fooBar",
    "X509CertPath parse2JSON",
    "snake_case_name PLAIN lower 42abc",
    "",
]


def test_word_delimiter_splits():
    an = {"word_delimiter": True}
    assert tokenize("getHTTPResponse_v2", analyzer=an)[0] == [
        "get", "http", "response", "v", "2",
    ]
    assert tokenize("X509CertPath", analyzer=an)[0] == ["x", "509", "cert", "path"]
    assert tokenize("snake_case", analyzer=an)[0] == ["snake", "case"]
    # already-lowercase text is untouched
    assert tokenize("plain text", analyzer=an)[0] == ["plain", "text"]


def test_word_delimiter_sql_parity():
    from lucene_spark.analysis import word_delimit, word_delimit_sql

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {word_delimit_sql('t')} FROM (SELECT unnest(?) AS t)",
        [_WD_CASES],
    ).fetchall()
    for c, (g,) in zip(_WD_CASES, got):
        assert word_delimit(c) == g, c
    df = analyze_batch(pd.Series(_WD_CASES), analyzer={"word_delimiter": True})
    for i, c in enumerate(_WD_CASES):
        terms, pos = tokenize(c, analyzer={"word_delimiter": True})
        assert list(df["terms"][i]) == terms
        assert list(df["positions"][i]) == pos


def test_word_delimiter_e2e_search(spark, tmp_path_factory):
    """A camelCase identifier is findable by its subwords through a
    built index, with dl/norm counting the split tokens."""
    import pandas as _pd

    from lucene_spark.index import Index, build_index
    from lucene_spark.search import PhraseQ, Searcher, TermQ

    pdf = _pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "content": [
                "def getUserName(self): return self.userName",
                "plain words only here",
                "class HTTPServerConfig: pass",
            ],
        }
    )
    idx_dir = str(tmp_path_factory.mktemp("idx_wd"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", doc_id_col="doc_id", num_buckets=2,
        analyzer={"word_delimiter": True},
    )
    idx = Index(spark, idx_dir)
    s = Searcher(idx)
    assert [r["doc_id"] for r in s.top_k(TermQ("user"), 5).collect()] == [0]
    assert [r["doc_id"] for r in s.top_k(TermQ("server"), 5).collect()] == [2]
    # consecutive subword positions support phrases across the split
    assert [r["doc_id"] for r in s.top_k(PhraseQ(("http", "server", "config")), 5).collect()] == [2]
    # dl counts split parts: doc 0 = def get user name self return self user name = 9
    d0 = idx.docs.filter("doc_id = 0").collect()[0]
    assert d0["dl"] == 9


# ---------------------------------------------------------------------------
# ShingleFilter analog (shingles analyzer option)
# ---------------------------------------------------------------------------

def test_shingles_emit_and_holes():
    an = {"shingles": True}
    t, p = tokenize("data line of code", analyzer=an)
    assert t == ["data", "line", "of", "code", "data_line", "line_of", "of_code"]
    assert p == [0, 1, 2, 3, 0, 1, 2]
    # stop hole breaks the shingle; dl counts unigrams only
    an2 = {"shingles": True, "stopwords": ["of"]}
    t2, p2 = tokenize("data line of code", analyzer=an2)
    assert t2 == ["data", "line", "code", "data_line"]
    df = analyze_batch(pd.Series(["data line of code"]), analyzer=an2)
    assert int(df["dl"].iat[0]) == 3  # overlaps discounted
    with pytest.raises(ValueError):
        analyze_batch(pd.Series(["x"]), analyzer={"shingles": True,
                                                  "synonyms": {"a": ["b"]}})


def test_shingles_e2e_search(spark, tmp_path_factory):
    import pandas as _pd

    from lucene_spark.index import Index, build_index
    from lucene_spark.search import Searcher, TermQ

    pdf = _pd.DataFrame(
        {
            "doc_id": [0, 1],
            "content": ["merge sort is stable", "sort then merge again"],
        }
    )
    idx_dir = str(tmp_path_factory.mktemp("idx_sh"))
    build_index(
        spark, spark.createDataFrame(pdf), idx_dir,
        text_col="content", doc_id_col="doc_id", num_buckets=2,
        analyzer={"shingles": True},
    )
    s = Searcher(Index(spark, idx_dir))
    # bigram matches only the doc with the adjacency
    assert [r["doc_id"] for r in s.top_k(TermQ("merge_sort"), 5).collect()] == [0]
    assert [r["doc_id"] for r in s.top_k(TermQ("then_merge"), 5).collect()] == [1]


# ---------------------------------------------------------------------------
# dl piece-count JVM expression == the Python analyzer's dl
# ---------------------------------------------------------------------------

_DL_CASES = [
    "",
    "plain words only here",
    "foo.bar baz",            # letter join
    "a.b.c.d.e",              # join chain (two-pass marking)
    "pi is 3.14 and 2.718",   # digit joins
    "don't can't o'reilly",   # apostrophe joins
    "a.'b mixed 1.a a.1",     # ineligible separators stay breaks
    "ver1.2beta x9'9y",       # digit-digit joins inside identifiers
    "trail. .lead 'quote'",   # separators at run edges never join
    "x" * 600,                # 255-split: 3 pieces
    ("ab." * 200) + "ab",     # long JOINED run > 255 chars
    "Mixed CASE Text.With.Dots",
]


def test_dl_expr_matches_python_chain(spark):
    """The docs-table dl column (one JVM regexp_count) must equal the
    analyzer's emitted token count for BOTH tokenizers — this is the
    norm every BM25 score reads."""
    from pyspark.sql import functions as F

    from lucene_spark.index.builder import _make_dl_expr

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_DL_CASES)], ["i", "text"]
    )
    for analyzer in (None, {"tokenizer": "standard"}, {"tokenizer": "uax29"}):
        expr = _make_dl_expr(analyzer)("text")
        got = {
            r["i"]: r["dl"]
            for r in df.select("i", expr.alias("dl")).collect()
        }
        want = {
            i: len(tokenize(s, analyzer=analyzer)[0])
            for i, s in enumerate(_DL_CASES)
        }
        assert got == want, (analyzer, got, want)
