"""PhoneticFilter in the full analyzer chain + index round trip.

Covers the reference's PhoneticFilter emission contracts
(``PhoneticFilter.java:30-80``: inject=true keeps the original and adds
the code at posIncr=0; inject=false replaces) and
``DoubleMetaphoneFilter.java`` (alternate code emitted when distinct),
end-to-end: an index built with a phonetic chain matches name variants
("smith" finds "schmidt" through the shared XMT double-metaphone code),
and dl/norms discount the injected codes exactly like synonyms.
"""

import pandas as pd
import pytest

from lucene_spark.analysis import analyze_batch, tokenize
from lucene_spark.index import Index, build_index
from lucene_spark.search import BoolQ, Searcher, TermQ

DM_INJECT = {"phonetic": {"encoder": "double_metaphone"}}


def test_inject_stacks_codes_at_same_position():
    terms, pos = tokenize("Smith wrote code", analyzer=DM_INJECT)
    assert terms == ["smith", "SM0", "XMT", "wrote", "RT", "code", "KT"]
    assert pos == [0, 0, 0, 1, 1, 2, 2]


def test_replace_mode_registry_filter():
    terms, pos = tokenize(
        "Smith wrote code", analyzer={"filters": ["phonetic_soundex"]}
    )
    assert terms == ["S530", "W630", "C300"]
    assert pos == [0, 1, 2]


def test_replace_mode_via_phonetic_key():
    terms, _ = tokenize(
        "Smith wrote code",
        analyzer={"phonetic": {"encoder": "metaphone", "inject": False}},
    )
    assert terms == ["SM0", "RT", "KT"]


def test_dl_discounts_injected_codes():
    df = analyze_batch(pd.Series(["Smith wrote code", "", None]), analyzer=DM_INJECT)
    assert df["dl"].tolist() == [3, 0, 0]
    # batch path agrees with the scalar path
    assert df["terms"].iloc[0] == tokenize("Smith wrote code", analyzer=DM_INJECT)[0]


def test_offsets_cover_source_span():
    df = analyze_batch(
        pd.Series(["Smith wrote"]), analyzer=DM_INJECT, want_offsets=True
    )
    offs = df["offsets"].iloc[0]
    # (start, len) per emitted token: 3 tokens over "Smith", 2 over "wrote"
    assert offs == [0, 5, 0, 5, 0, 5, 6, 5, 6, 5]


def test_stopwords_compose_with_phonetic():
    terms, pos = tokenize(
        "the smith", analyzer={**DM_INJECT, "stopwords": ["the"]}
    )
    assert terms == ["smith", "SM0", "XMT"]
    assert pos == [1, 1, 1]  # hole at 0: stop advances position


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rows = [
        (0, "alice", "agreement signed by Smith yesterday"),
        (1, "bob", "agreement signed by Schmidt yesterday"),
        (2, "carol", "nothing relevant here at all"),
        (3, "dave", "Wright filed the report"),
        (4, "erin", "please write the report"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "author", "text"])
    idx_dir = str(tmp_path_factory.mktemp("idx_phon"))
    build_index(
        spark,
        spark.createDataFrame(pdf),
        idx_dir,
        text_col="text",
        doc_id_col="doc_id",
        num_buckets=4,
        salt_rows=64,
        analyzer=DM_INJECT,
    )
    return Index(spark, idx_dir)


def test_index_matches_name_variants(built):
    s = Searcher(built, scoring="double")
    # query-side analysis of "smith" expands to [smith, SM0, XMT];
    # schmidt indexed as [schmidt, XMT, SMT] — XMT bridges them
    from lucene_spark.analysis import analyze_query_text

    qterms = analyze_query_text("Smith", analyzer=built.analyzer)
    hits = {
        r["doc_id"]
        for r in s.doc_set(BoolQ(should=tuple(TermQ(t) for t in qterms))).collect()
    }
    assert hits == {0, 1}
    # wright / write share RT
    qterms = analyze_query_text("wright", analyzer=built.analyzer)
    hits = {
        r["doc_id"]
        for r in s.doc_set(BoolQ(should=tuple(TermQ(t) for t in qterms))).collect()
    }
    assert hits == {3, 4}


def test_norms_discount_codes(built):
    # dl for doc 0 is 5 source tokens, not the ~9 emitted terms
    rows = {r["doc_id"]: r["dl"] for r in built.docs.select("doc_id", "dl").collect()}
    assert rows[0] == 5 and rows[2] == 5
